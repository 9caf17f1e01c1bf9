"""tactile-gan-tpu: a TPU-native (JAX/XLA/pjit/Pallas) conditional image-to-image
GAN framework with the full capabilities of mmheydari97/tactile-gan.

The package is layered bottom-up (see SURVEY.md section 7):

- ``core``     — config / dtype policy / PRNG-key plumbing.
- ``ops``      — TPU compute primitives (NHWC convs, instance norm, pooling,
                 resize) plus Pallas kernels under ``ops.pallas``.
- ``models``   — pure-functional flax generators (UNet / UNet++ / BCDUNet) and
                 the conditional PatchGAN discriminator with functional feature
                 capture.
- ``losses``   — the four GAN objectives, L1, both perceptual variants and the
                 WGAN gradient penalty.
- ``data``     — host-side paired-file loader feeding a fused on-device
                 augmentation + normalization stage.
- ``train``    — one jitted G+D train step, optimizers, LR schedule, epoch loop
                 and artifact writers.
- ``eval``     — test-time runner, fuzzy metrics and visualization.
- ``parallel`` — device-mesh construction and data-parallel shardings.
- ``utils``    — checkpoint + IO helpers.
"""

__version__ = "0.1.0"
