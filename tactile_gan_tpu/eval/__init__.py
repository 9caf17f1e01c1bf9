from tactile_gan_tpu.eval.metrics import eval_pair, otsu_threshold
from tactile_gan_tpu.eval.runner import load_model, test_model, test_two_step
from tactile_gan_tpu.eval.visualize import (
    compose_channels, concat_images, save_image_u8, to_pil,
)
