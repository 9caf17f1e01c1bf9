from tactile_gan_tpu.losses.gan_loss import gan_loss, real_target
from tactile_gan_tpu.losses.gradient_penalty import gradient_penalty
from tactile_gan_tpu.losses.perceptual import l1_loss, pan_loss, vgg_perceptual_loss
