from tactile_gan_tpu.ops.conv import conv2d, conv2d_transpose
from tactile_gan_tpu.ops.norm import instance_norm
from tactile_gan_tpu.ops.pool import avg_pool2, max_pool2
from tactile_gan_tpu.ops.resize import upsample_nearest2, resize_bilinear
