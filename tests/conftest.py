"""Pytest fixtures and configuration for the tpgsd test suite.

JAX-based tests run on a virtual 8-device CPU mesh so multi-shard behavior
is exercised without TPU hardware (the automated multi-shard coverage the
reference never had; reference CI builds only: .github/workflows/ci.yml).
"""

import collections
import os

# Force a CPU platform with 8 virtual devices.  The interpreter's
# sitecustomize imports jax at startup (before this file runs), so env vars
# are too late - but backends initialize lazily, so the runtime config
# switch still lands as long as no devices have been touched yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except ImportError:
    pass

import pytest

Mode = collections.namedtuple("Mode", "read write")
# mode pairs swept by the file-layer tests
# (reference: pgsd/pgsd/test/conftest.py:9-21)
mode_list = [Mode("r", "w"), Mode("a", "x"), Mode("r", "a")]


def _open_mode_name(mode):
    return "(" + mode.read + "," + mode.write + ")"


@pytest.fixture(params=mode_list, ids=_open_mode_name)
def open_mode(request):
    """Fixture parameterized over (read, write) file open mode pairs."""
    return request.param


def pytest_addoption(parser):
    """Add the --validate option enabling long-running tests.

    (reference: pgsd/pytest_plugin_validate.py:9-20)
    """
    parser.addoption(
        "--validate",
        action="store_true",
        default=False,
        help="Enable long running validation tests.",
    )


@pytest.fixture(autouse=True)
def skip_validate(request):
    """Skip @pytest.mark.validate tests unless --validate is passed."""
    if request.node.get_closest_marker("validate"):
        if not request.config.getoption("validate"):
            pytest.skip("Validation tests not requested.")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "validate: Tests that perform long-running validations."
    )
