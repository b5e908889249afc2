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
import pytest  # noqa: E402

# The axon site hook force-registers the TPU plugin and overrides
# jax_platforms; pin tests back to the virtual-device CPU backend.
jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full-resolution golden-count renders; run with `-m slow`",
    )


def pytest_collection_modifyitems(config, items):
    # slow tests run only when explicitly selected (`pytest -m slow`)
    if config.getoption("-m"):
        return
    skip_slow = pytest.mark.skip(reason="slow golden render; run with -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
