from tactile_gan_tpu.utils.checkpoint import (
    load_checkpoint, restore_partial, save_checkpoint,
)
from tactile_gan_tpu.utils.io import mkdir
