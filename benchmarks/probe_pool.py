"""30-second TPU pool health probe.

The dev-tunnel chip pool intermittently degrades ~20x (all device-side
work, not just dispatch).  This prints the two canaries with known-good
values so longer measurements know whether to trust their numbers:

  dispatch floor (noop):   healthy ~29-35ms
  lax.sort 2-op @ 2^24:    healthy ~75ms (~4.5 ns/elt); degraded >1s

Usage: python benchmarks/probe_pool.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def main():
    n = 1 << 24
    rng = np.random.default_rng(0)
    hi = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 22, n, dtype=np.uint32)))
    lo = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 32, n, dtype=np.uint32)))

    noop = jax.jit(lambda a: a[:8] + 1)
    _ = int(np.asarray(noop(hi))[0])
    t0 = time.time()
    _ = int(np.asarray(noop(hi))[0])
    t_noop = time.time() - t0

    # fetch a SLICE, not the array: np.asarray(out[0]) would pull the
    # whole 64MB over the tunnel and dominate the timing (weeks of
    # "degraded pool" confusion came from exactly that)
    srt = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2)[0][:8])
    _ = int(np.asarray(srt(hi, lo))[0])
    ts = []
    for _i in range(2):
        t0 = time.time()
        _ = int(np.asarray(srt(hi, lo))[0])
        ts.append(time.time() - t0)
    t_sort = min(ts)

    healthy = t_noop < 0.1 and t_sort < 0.3
    print(f"noop {t_noop*1e3:.1f}ms  lax.sort@2^24 {t_sort*1e3:.1f}ms "
          f"({t_sort/n*1e9:.2f} ns/elt)  -> "
          f"{'HEALTHY' if healthy else 'DEGRADED'}", flush=True)


if __name__ == "__main__":
    main()
