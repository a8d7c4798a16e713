"""Dispatch-clean kernel timings: chain R data-dependent repetitions of
each op inside ONE jit, so the ~30ms tunnel dispatch round-trip is paid
once per measurement instead of once per op (which at 2^24 is the
difference between measuring the op and measuring the tunnel —
see the reduce-kernel finding in docs/PERFORMANCE.md).

    per-op time = (t_chain - t_dispatch) / R

CAVEAT: inside a fori_loop carry the kernels' input_output_aliases
cannot alias (XLA double-buffers the carry), so every pallas_call in the
chain pays an extra copy of its full operands.  For the multi-call sort
(~15 aliased in-place passes) this dominates and OVERSTATES its cost
badly; treat chained numbers as upper bounds and prefer single-dispatch
timings minus the printed floor for aliased kernels.

Usage: python benchmarks/profile_inloop.py [n_log2] [reps]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from kat_tpu.ops.merge_kernel import bitonic_merge_planes  # noqa: E402
from kat_tpu.ops.reduce_kernel import reduce_compact_sorted  # noqa: E402
from kat_tpu.ops.sort_kernel import bitonic_sort_planes  # noqa: E402


def timed(fn, args, label, n, reps_in):
    t0 = time.time()
    out = fn(*args)
    _ = int(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    tc = time.time() - t0
    ts = []
    for _i in range(3):
        t0 = time.time()
        out = fn(*args)
        _ = int(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.time() - t0)
    t = min(ts)
    print(f"{label:30s} {t*1e3:8.1f}ms total  "
          f"{(t - DISPATCH)/reps_in*1e3:7.1f}ms/op  "
          f"{(t - DISPATCH)/reps_in/n*1e9:6.3f} ns/elt", flush=True)
    return out


DISPATCH = 0.030


def main():
    lg = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n = 1 << lg

    rng = np.random.default_rng(0)
    hi = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 22, n, dtype=np.uint32)))
    lo = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 32, n, dtype=np.uint32)))
    w = jax.device_put(jnp.ones(n, jnp.uint32))

    global DISPATCH
    noop = jax.jit(lambda a: a[:8] + 1)
    _ = int(np.asarray(noop(hi))[0])
    ts = []
    for _i in range(3):
        t0 = time.time()
        _ = int(np.asarray(noop(hi))[0])
        ts.append(time.time() - t0)
    DISPATCH = min(ts)
    print(f"dispatch floor {DISPATCH*1e3:.1f}ms", flush=True)

    # chained Pallas bitonic sort: re-sorting sorted data is data-
    # dependent work XLA cannot elide (perm-invariance is beyond it)
    @jax.jit
    def chain_sort(a, b):
        def body(_, ab):
            return bitonic_sort_planes(ab, 2)
        return jax.lax.fori_loop(0, R, body, (a, b))

    timed(chain_sort, (hi, lo), f"pallas sort x{R} 2^{lg}", n, R)

    @jax.jit
    def chain_lax(a, b):
        def body(_, ab):
            return jax.lax.sort(ab, num_keys=2)
        return jax.lax.fori_loop(0, R, body, (a, b))

    timed(chain_lax, (hi, lo), f"lax.sort 2-op x{R} 2^{lg}", n, R)

    # chained merge (an ascending list is still bitonic -> idempotent)
    @jax.jit
    def chain_merge(a, b, c):
        def body(_, abc):
            return bitonic_merge_planes(abc, 2)
        return jax.lax.fori_loop(0, R, body, (a, b, c))

    timed(chain_merge, (hi, lo, w), f"pallas merge x{R} 2^{lg} 3pl", n, R)

    # chained reduce: feed unique keys/counts back in (idempotent after
    # the first pass; out_size == n keeps shapes closed).  Pre-sort in a
    # separate dispatch so the chain measures only the reduce.
    shi, slo, sw = jax.jit(
        lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2))(hi, lo, w)

    @jax.jit
    def chain_reduce(a, b, c):
        def body(_, kkw):
            out = reduce_compact_sorted(kkw[:2], kkw[2], n)
            return (out[0], out[1], out[2])
        return jax.lax.fori_loop(0, R, body, (a, b, c))

    timed(chain_reduce, (shi, slo, sw), f"pallas reduce x{R} 2^{lg}", n, R)


if __name__ == "__main__":
    main()
