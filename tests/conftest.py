"""Test configuration: force CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon site hook force-registers the TPU plugin and overrides
# jax_platforms; pin tests back to the virtual-device CPU backend.
jax.config.update("jax_platforms", "cpu")
