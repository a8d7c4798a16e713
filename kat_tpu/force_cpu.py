"""Import FIRST (before jax) to force the CPU backend in ad-hoc scripts.

The TPU-tunnel sitecustomize registers its PJRT plugin at interpreter
start, so `JAX_PLATFORMS=cpu` alone does NOT keep a script off the real
chip — and two processes touching the tunnel concurrently wedge it for
~10 minutes.  Anything that is not a benchmark should do:

    import kat_tpu.force_cpu  # noqa: F401  (before importing jax)

This mirrors tests/conftest.py: pop the tunnel's backend factory before
any backend is instantiated (the builtin "tpu" factory must stay
registered or pallas' checkify lowerings fail to import).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
from jax._src import xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)
jax.config.update("jax_platforms", "cpu")
