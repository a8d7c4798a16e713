"""Stage decomposition of the bucketed flush on chip: expand / sort /
reduce / merge+reduce / finish, each timed as its own jit over one
staged full flush (dispatch-dominated stages noted).  Run ONE at a time
against the tunnel."""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kat_tpu.core import bucketed, counting, minimizer
    from kat_tpu.core.kmers import SENTINEL
    from kat_tpu.io import native
    from kat_tpu.ops.merge_kernel import merge_sorted_kernel
    from kat_tpu.ops.reduce_kernel import reduce_compact_sorted
    from kat_tpu.ops.sort_kernel import bitonic_sort_chunks

    k = 27
    read_len = 1024
    n_reads = 56_000  # ~56M windows ~= one full flush
    genome_len = 1 << 23
    rng = np.random.default_rng(42)
    genome = rng.integers(0, 4, size=genome_len + read_len,
                          dtype=np.uint8)
    bases = np.frombuffer(b"ACGT", np.uint8)[genome]
    view = np.lib.stride_tricks.sliding_window_view(bases, read_len)
    fd, path = tempfile.mkstemp(suffix=".fastq")
    qual = b"I" * read_len
    with os.fdopen(fd, "wb") as f:
        for start in range(0, n_reads, 20_000):
            m = min(20_000, n_reads - start)
            offs = rng.integers(0, genome_len, size=m)
            f.write(b"".join(
                b"@r%d\n%s\n+\n%s\n" % (start + i, view[offs[i]].tobytes(),
                                        qual) for i in range(m)))

    S = minimizer.rec_windows(k)
    rec_per_chunk = (1 << 17) // S
    fl = None
    for got in native.route_flushes([path], k, minimizer.M_DEFAULT, 13,
                                    512, rec_per_chunk, threads=1):
        fl = got
        break
    os.unlink(path)
    chunks, groups, nw = fl
    n = chunks.shape[0]
    tgt = 1 << int(np.ceil(np.log2(max(n, 8))))
    if n < tgt:
        chunks = np.vstack([chunks, np.zeros((tgt - n, rec_per_chunk),
                                             np.uint64)])
    print(f"flush: {nw} windows, {n}->{tgt} chunks, groups={len(groups)}",
          flush=True)
    rhi, rlo = bucketed._as_planes(np.ascontiguousarray(chunks))
    rhi = jax.device_put(rhi)
    rlo = jax.device_put(rlo)
    chunk_slots = rec_per_chunk * S
    cap = 1 << 24
    tab = counting.empty_table(cap)

    m_ = minimizer.M_DEFAULT

    @jax.jit
    def s_expand(rhi, rlo):
        khi, klo, _v = minimizer.expand_records(rhi, rlo, k, m_)
        return (jnp.swapaxes(khi, 0, 1).reshape(-1),
                jnp.swapaxes(klo, 0, 1).reshape(-1))

    @jax.jit
    def s_sort(khi, klo):
        return bitonic_sort_chunks((khi, klo), 2, chunk_slots)

    @jax.jit
    def s_reduce(shi, slo):
        w = (~((shi == SENTINEL) & (slo == SENTINEL))).astype(jnp.uint32)
        return reduce_compact_sorted((shi, slo), w, cap)

    @jax.jit
    def s_merge_reduce(fh, fl_, fc, thi, tlo, tc):
        (mh, ml), (mc,) = merge_sorted_kernel((thi, tlo), (tc,),
                                              (fh, fl_), (fc,))
        n_real = thi.shape[0] + fh.shape[0]
        return reduce_compact_sorted((mh[:n_real], ml[:n_real]),
                                     mc[:n_real], cap)

    def timeit(name, fn, *args):
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:8])  # sync
        best = float("inf")
        for _i in range(4):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0][:8])
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best*1e3:.1f} ms  ({best/nw*1e9:.2f} ns/window)",
              flush=True)
        return out

    khi, klo = timeit("expand", s_expand, rhi, rlo)
    shi, slo = timeit("chunked sort", s_sort, khi, klo)
    fh, fl_, fc, fnu = timeit("dedup reduce", s_reduce, shi, slo)
    out = timeit("table merge+reduce", s_merge_reduce, fh, fl_, fc,
                 tab.keys_hi, tab.keys_lo, tab.counts)

    # finish-time decode+re-sort (amortized once per COUNT, not per flush)
    table = counting.CountTable(out[0], out[1], out[2], out[3])
    sc = bucketed.BucketedCodeCounter(k, initial_capacity=cap,
                                      max_capacity=1 << 26)
    sc.table = table
    fin = sc._fns  # warm below

    def s_finish():
        sc.table = table
        return sc.finish()

    t = s_finish()
    _ = int(t.n_unique)
    best = float("inf")
    for _i in range(3):
        t0 = time.perf_counter()
        t = s_finish()
        _ = int(t.n_unique)
        best = min(best, time.perf_counter() - t0)
    print(f"finish decode+re-sort: {best*1e3:.1f} ms", flush=True)

    # reference points from the classic flush at the same scale
    n_slots = khi.shape[0]
    print(f"(slots {n_slots}, slots/window {n_slots/nw:.2f})", flush=True)


if __name__ == "__main__":
    main()
