"""Test harness: run everything on a virtual 8-device CPU mesh.

The container force-selects the axon TPU plugin through JAX_PLATFORMS /
sitecustomize, so the platform override must go through jax.config (env vars
are clobbered before pytest starts). This must run before any backend
initialization, hence at conftest import time.
"""

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


@pytest.fixture(scope="session")
def reference_available():
    """The PyTorch reference checkout, for parity goldens."""
    import os
    return os.path.isdir("/root/reference/generators")
