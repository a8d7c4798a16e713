"""Decompose the fused counting flush on the TPU: cumulative timings of
extract / +sort / +merge / +reduce at the bench geometry, scalar-slice
synced (never fetch full arrays over the tunnel — see probe_pool.py).

Usage: python benchmarks/profile_flush.py [flush_batches]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from kat_tpu.core import counting  # noqa: E402
from kat_tpu.core.kmers import SENTINEL, extract_kmers  # noqa: E402
from kat_tpu.ops.merge_kernel import merge_sorted_kernel  # noqa: E402
from kat_tpu.ops.reduce_kernel import reduce_compact_sorted  # noqa: E402
from kat_tpu.ops.sort_kernel import sort_planes_padded  # noqa: E402


def timed(fn, args, label, n, floor):
    out = fn(*args)
    _ = int(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ts = []
    for _i in range(3):
        t0 = time.time()
        out = fn(*args)
        _ = int(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.time() - t0)
    t = min(ts) - floor
    print(f"{label:30s} {t*1e3:8.1f}ms  {t/n*1e9:6.3f} ns/window",
          flush=True)
    return t


def main():
    fb = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    k = 27
    rows, length = 4096, 1024
    cap = 1 << 24
    windows = fb * rows * (length - k + 1)

    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, size=(1 << 23) + length, dtype=np.uint8)
    view = np.lib.stride_tricks.sliding_window_view(genome, length)
    offs = rng.integers(0, 1 << 23, size=fb * rows)
    codes = jax.device_put(
        jnp.asarray(np.ascontiguousarray(view[offs])))

    # build a realistic resident table by counting half the batch
    sc = counting.CodeStreamingCounter(
        k, canonical=True, initial_capacity=cap, max_capacity=1 << 26,
        flush_batches=fb)
    sc.add_codes(np.asarray(view[offs[:rows * 4]]))
    sc._flush()
    table = sc.finish()
    thi, tlo, tc = table.keys_hi, table.keys_lo, table.counts
    print(f"table n_unique={int(table.n_unique)} cap={cap} "
          f"windows/flush={windows}", flush=True)

    noop = jax.jit(lambda a: a[:8] + 1)
    _ = int(np.asarray(noop(tc))[0])
    ts = []
    for _i in range(3):
        t0 = time.time()
        _ = int(np.asarray(noop(tc))[0])
        ts.append(time.time() - t0)
    floor = min(ts)
    print(f"dispatch floor {floor*1e3:.1f}ms", flush=True)

    @jax.jit
    def f_extract(codes):
        hi, lo, _v = extract_kmers(codes.reshape(-1, length), k, True)
        return hi.reshape(-1)[-8:], lo.reshape(-1)[-8:]

    @jax.jit
    def f_sort(codes):
        hi, lo, _v = extract_kmers(codes.reshape(-1, length), k, True)
        fhi, flo = sort_planes_padded((hi.reshape(-1), lo.reshape(-1)), 2)
        return fhi[-8:], flo[-8:]

    @jax.jit
    def f_merge(thi, tlo, tc, codes):
        hi, lo, _v = extract_kmers(codes.reshape(-1, length), k, True)
        fhi, flo = sort_planes_padded((hi.reshape(-1), lo.reshape(-1)), 2)
        fw = (~((fhi == SENTINEL) & (flo == SENTINEL))).astype(jnp.uint32)
        (mhi, mlo), (mw,) = merge_sorted_kernel(
            (thi, tlo), (tc,), (fhi, flo), (fw,))
        return mhi[-8:], mw[-8:]

    @jax.jit
    def f_full(thi, tlo, tc, codes):
        hi, lo, _v = extract_kmers(codes.reshape(-1, length), k, True)
        fhi, flo = sort_planes_padded((hi.reshape(-1), lo.reshape(-1)), 2)
        fw = (~((fhi == SENTINEL) & (flo == SENTINEL))).astype(jnp.uint32)
        (mhi, mlo), (mw,) = merge_sorted_kernel(
            (thi, tlo), (tc,), (fhi, flo), (fw,))
        n_real = thi.shape[0] + fhi.shape[0]
        out = reduce_compact_sorted((mhi[:n_real], mlo[:n_real]),
                                    mw[:n_real], cap)
        return out[-1], out[0][:8]

    t1 = timed(f_extract, (codes,), "extract", windows, floor)
    t2 = timed(f_sort, (codes,), "extract+sort", windows, floor)
    t3 = timed(f_merge, (thi, tlo, tc, codes), "extract+sort+merge",
               windows, floor)
    t4 = timed(f_full, (thi, tlo, tc, codes), "full flush (+reduce)",
               windows, floor)
    print(f"-> sort {((t2-t1))*1e3:.1f}ms  merge {(t3-t2)*1e3:.1f}ms  "
          f"reduce {(t4-t3)*1e3:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
