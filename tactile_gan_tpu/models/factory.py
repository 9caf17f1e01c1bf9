"""Model factories — the dispatch surface of
/root/reference/generators/generators.py:8-25 and
/root/reference/discriminators/discriminators.py:5-14 (case-insensitive names).

Instead of a DataParallel wrap (never enabled in the reference), parallelism
here is sharding: models are pure flax modules and the train step is pjit-ed
over a device mesh (see tactile_gan_tpu.parallel).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tactile_gan_tpu.models.bcdunet import BCDUNet
from tactile_gan_tpu.models.patch_discriminator import PatchDiscriminator
from tactile_gan_tpu.models.unet import UNet
from tactile_gan_tpu.models.unet_plusplus import UNetPlusPlus


def create_generator(
    name: str,
    output_dim: int = 3,
    nf: int = 64,
    activation: bool = True,
    compute_dtype: jnp.dtype = jnp.float32,
    use_pallas: bool = False,
    space_to_depth: bool = False,
    split_concat: bool = True,
    lane_pack: bool = False,
    packed_row0: bool = False,
    bf16_resident: bool = False,
) -> nn.Module:
    kw = dict(output_dim=output_dim, nf=nf, activation=activation,
              compute_dtype=compute_dtype, use_pallas=use_pallas)
    key = name.lower()
    if space_to_depth and key != "unet++":
        raise ValueError("--space_to_depth is only supported for UNet++")
    if packed_row0 and key != "unet++":
        raise ValueError("--packed_row0 is only supported for UNet++")
    if key == "unet":
        return UNet(**kw)
    if key == "unet++":
        return UNetPlusPlus(space_to_depth=space_to_depth,
                            split_concat=split_concat, lane_pack=lane_pack,
                            packed_row0=packed_row0,
                            bf16_resident=bf16_resident, **kw)
    if key == "bcdunet":
        return BCDUNet(**kw)
    raise NameError(f"{name} not a valid generator")


def create_discriminator(
    name: str = "patch",
    nf: int = 64,
    activation: bool = True,
    compute_dtype: jnp.dtype = jnp.float32,
    use_pallas: bool = False,
    resident: bool = False,
    same_pad: bool = False,
) -> nn.Module:
    if name.lower() == "patch":
        return PatchDiscriminator(nf=nf, activation=activation,
                                  compute_dtype=compute_dtype,
                                  use_pallas=use_pallas, resident=resident,
                                  same_pad=same_pad)
    raise NameError(f"{name} not a valid discriminator")
