"""Test configuration: force an 8-device CPU mesh so sharded code paths are
exercised without TPU hardware (cf. SURVEY.md §4: the reference never tests
multi-device because it has none; we bit-compare sharded vs single-device)."""

import os

# force CPU: the test suite must not depend on (or tunnel to) TPU hardware,
# and the f64 numerics paths are CPU-only by design
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


def pytest_addoption(parser):
    # parity with the reference test harness (reference tests/conftest.py):
    # external data folders may be passed for cross-checking on real data
    parser.addoption(
        "--datafolder",
        action="append",
        default=[],
        help="data folder to pass to test functions",
    )


def pytest_generate_tests(metafunc):
    if "datafolder" in metafunc.fixturenames:
        metafunc.parametrize("datafolder", metafunc.config.getoption("datafolder"))
