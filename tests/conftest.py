"""Test configuration: force CPU backend with 8 virtual devices so sharded
paths (all_to_all / psum over a Mesh) are exercised without TPU hardware."""

import os

# Force CPU even when the ambient environment points JAX at TPU hardware
# (e.g. JAX_PLATFORMS=axon over a device tunnel): tests exercise sharding on
# virtual CPU devices; only benchmarks should touch the real chip.
os.environ["JAX_PLATFORMS"] = os.environ.get("KAT_TPU_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/kat_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REFERENCE_DATA = pathlib.Path("/root/reference/tests/data")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def ref_data():
    if not REFERENCE_DATA.exists():
        pytest.skip("reference test data not available")
    return REFERENCE_DATA
