"""Test configuration: force a virtual multi-device CPU platform + f64.

Multi-chip sharding is validated on an 8-device CPU mesh (the reference can
only test multi-rank behavior on the LUMI cluster itself — SURVEY.md §4).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

# This machine's sitecustomize registers a tunneled-TPU PJRT plugin and
# force-selects it via jax.config — override BEFORE any backend init so the
# suite runs on the virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", jax.devices()

import pytest  # noqa: E402

REF = "/root/reference/structures/5nm_device"


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running golden/integration tests")


@pytest.fixture(scope="session")
def ref_5nm_dir():
    if not os.path.isdir(REF):
        pytest.skip("5nm reference structure not available")
    return REF
