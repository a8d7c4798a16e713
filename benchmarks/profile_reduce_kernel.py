"""Component profile of the reduce kernel: run ablated variants on the
TPU to find where the 2.07 ns/elt goes.

Two mechanisms:
  - ablate_level (static kernel arg): 1 drops the output DMA, 2 also
    drops the staging blend+roll, 3 also drops widen+route, 5 leaves
    only the input pipeline + one SMEM touch (the floor).
  - monkeypatching _seg_inclusive_scan/_exclusive_rank for level 4.

Ablations change RESULTS (they are not correct reductions) — this is a
cost probe only.

Usage: python benchmarks/profile_reduce_kernel.py [n_log2] [rt ...]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from kat_tpu.ops import reduce_kernel as rk  # noqa: E402


def timed(fn, args, label, n):
    t0 = time.time()
    out = fn(*args)
    _ = int(np.asarray(out[-1]))
    tc = time.time() - t0
    ts = []
    for _i in range(5):
        t0 = time.time()
        out = fn(*args)
        _ = int(np.asarray(out[-1]))
        ts.append(time.time() - t0)
    t = min(ts)
    print(f"{label:28s} {t*1e3:7.1f}ms  {t/n*1e9:.3f} ns/elt"
          f"   (compile+first {tc:.0f}s)", flush=True)
    return t


def make_fn(rt, level, out_size):
    return jax.jit(lambda a, b, c: rk.reduce_compact_sorted.__wrapped__(
        (a, b), c, out_size, rows_per_tile=rt, ablate_level=level))


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    rts = [int(x) for x in sys.argv[2:]] or [64]
    n = 1 << n_log2
    rng = np.random.default_rng(0)
    nk = n // 8
    keys = rng.integers(0, nk, n)
    uniq = rng.integers(0, 1 << 54, nk, dtype=np.uint64)
    k64 = np.sort(uniq[keys])
    hi = jax.device_put(jnp.asarray((k64 >> np.uint64(32)).astype(np.uint32)))
    lo = jax.device_put(jnp.asarray(
        (k64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)))
    w = jax.device_put(jnp.ones(n, jnp.uint32))

    # dispatch floor: a trivial kernel timed the same way exposes the
    # tunnel round-trip that inflates every standalone measurement here.
    noop = jax.jit(lambda a: (a[0] + 1,))
    timed(noop, (w,), "dispatch floor (noop)", n)

    for rt in rts:
        print(f"--- rows_per_tile={rt}, n=2^{n_log2} ---", flush=True)
        for level, label in [
            (0, "L0 full"),
            (1, "L1 -out_dma"),
            (2, "L2 -blend/roll"),
            (3, "L3 -widen/route"),
            (5, "L5 floor (pipeline only)"),
        ]:
            timed(make_fn(rt, level, n // 2), (hi, lo, w), label, n)

        # L4: L3 + trivial scan/rank (monkeypatch)
        orig_scan = rk._seg_inclusive_scan
        orig_rank = rk._exclusive_rank
        rk._seg_inclusive_scan = lambda v, f: v
        rk._exclusive_rank = lambda m: jnp.zeros(m.shape, jnp.int32)
        timed(make_fn(rt, 3, n // 2), (hi, lo, w), "L4 -scan/rank (of L3)", n)
        rk._seg_inclusive_scan = orig_scan
        rk._exclusive_rank = orig_rank


if __name__ == "__main__":
    main()
