"""Test configuration: run on CPU with a virtual 8-device mesh.

Multi-chip sharding logic is validated on CPU via
--xla_force_host_platform_device_count (the reference had no multi-device
capability at all; see SURVEY.md §4 for the test strategy).

Note: the environment's TPU plugin (axon) registers itself via
sitecustomize and overrides the JAX_PLATFORMS env var, so we must force
the cpu platform through jax.config AFTER importing jax.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight redundancy/protocol tests excluded from the "
        "default gate (make test); run the full gate with make test-all",
    )
    config.addinivalue_line(
        "markers",
        "realimage: tests against the real rgb16bit benchmark images; "
        "auto-skip unless the files are present (data/MANIFEST.json)",
    )
