from tactile_gan_tpu.models.bcdunet import BCDUNet
from tactile_gan_tpu.models.factory import create_discriminator, create_generator
from tactile_gan_tpu.models.patch_discriminator import PatchDiscriminator
from tactile_gan_tpu.models.unet import UNet
from tactile_gan_tpu.models.unet_plusplus import UNetPlusPlus
