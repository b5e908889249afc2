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
# GSDF_TPU_TEST_ACCEL=1 keeps the accelerator as the default platform
# WITH the 8 virtual CPU devices still available, so the whole suite —
# including the accelerator-only parity tests (test_accelerator.py) —
# runs against the real chip: `GSDF_TPU_TEST_ACCEL=1 pytest tests/`.
if os.environ.get("GSDF_TPU_TEST_ACCEL"):
    try:
        jax.config.update("jax_platforms", "axon,cpu")
        jax.devices()  # force backend init; falls back if axon is absent
    except Exception:
        jax.config.update("jax_platforms", "cpu")
else:
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
