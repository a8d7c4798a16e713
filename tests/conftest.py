"""Test configuration: force CPU backend with 8 virtual devices so sharded
paths (all_to_all / psum over a Mesh) are exercised without TPU hardware."""

import os
import pathlib
import sys

# Force CPU even when the ambient environment points JAX at TPU hardware:
# tests exercise sharding on 8 virtual CPU devices; only benchmarks should
# touch the real chip.  The TPU-tunnel sitecustomize registers its PJRT
# plugin at interpreter start and hijacks platform selection, so setting
# JAX_PLATFORMS alone is not enough: drop the plugin's backend factory
# before any backend is instantiated.
_want = os.environ.get("KAT_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _want
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Per-host-CPU + per-boot cache dir: stale AOT code from a different
# machine (VM migration) hangs or SIGILLs/SIGSEGVs, and the cpuinfo flags
# line alone does not distinguish all hosts (LLVM tuning features like
# prefer-no-scatter differ on hosts with identical flags) — mirror
# kat_tpu.__init__._host_key.
def _host_key():
    try:
        import hashlib
        with open("/proc/cpuinfo") as f:
            block = f.read().split("\n\n", 1)[0]
        try:
            with open("/proc/sys/kernel/random/boot_id") as f:
                block += f.read()
        except OSError:
            pass
        return hashlib.sha1(block.encode()).hexdigest()[:12]
    except OSError:
        return "default"


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      f"/tmp/kat_tpu_jax_cache-{_host_key()}")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

if _want == "cpu":
    import jax
    from jax._src import xla_bridge as _xb

    # Pop only the tunnel plugin: removing the builtin "tpu" factory breaks
    # jax.experimental.pallas import (its checkify lowerings register for
    # the "tpu" platform, which must stay a *known* platform).
    _xb._backend_factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REFERENCE_DATA = pathlib.Path("/root/reference/tests/data")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def ref_data():
    if not REFERENCE_DATA.exists():
        pytest.skip("reference test data not available")
    return REFERENCE_DATA
