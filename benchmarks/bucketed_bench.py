"""Chip A/B: minimizer-bucketed chunked flush vs the classic full-sort
flush, same synthetic workload as bench.py's headline.

Stages the routed flush layouts on device first (mirroring bench.py's
pre-uploaded batches — the dev tunnel's host->device bandwidth is not
representative), then measures device-side counting throughput for both
paths, verifies the finished tables BIT-IDENTICAL, and reports the host
router's standalone routing rate.

Run ONE at a time against the tunnel:  python benchmarks/bucketed_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    import jax

    from kat_tpu.core import bucketed, counting, minimizer
    from kat_tpu.io import native

    k = 27
    read_len = 1024
    n_reads = int(os.environ.get("KAT_TPU_AB_READS", "790000"))
    # 790K reads ~ 788M windows = 4 FULL 2048-chunk flushes
    genome_len = 1 << 23
    rng = np.random.default_rng(42)
    genome = rng.integers(0, 4, size=genome_len + read_len, dtype=np.uint8)
    bases = np.frombuffer(b"ACGT", np.uint8)[genome]
    view = np.lib.stride_tricks.sliding_window_view(bases, read_len)

    print("writing synthetic fastq...", flush=True)
    fd, path = tempfile.mkstemp(suffix=".fastq")
    qual = b"I" * read_len
    with os.fdopen(fd, "wb") as f:
        for start in range(0, n_reads, 20_000):
            m = min(20_000, n_reads - start)
            offs = rng.integers(0, genome_len, size=m)
            f.write(b"".join(
                b"@r%d\n%s\n+\n%s\n" % (start + i, view[offs[i]].tobytes(),
                                        qual)
                for i in range(m)))

    S = minimizer.rec_windows(k)
    slots_log = int(os.environ.get("KAT_TPU_SMR_SLOTS_LOG", "17"))
    rec_per_chunk = (1 << slots_log) // S
    max_chunks = int(os.environ.get("KAT_TPU_SMR_CHUNKS", "2048"))
    # 672 chunks ~ 88M slots -> ~2^26 VALID windows at 0.76 fill
    bucket_bits = 13

    # ---- host routing rate (and collect the flushes for staging) ----
    t0 = time.perf_counter()
    flushes = []
    total_windows = 0
    # ONE router: range workers would each end with a partial tail
    # flush, and small flushes pay a full-table merge each (host rates
    # on this VM swing ~10x run to run anyway — the number is
    # indicative; the device measurement below is the point)
    for chunks, groups, nw in native.route_flushes(
            [path], k, minimizer.M_DEFAULT, bucket_bits, max_chunks,
            rec_per_chunk, threads=1):
        n = chunks.shape[0]
        tgt = min(max_chunks,
                  1 << max(3, int(np.ceil(np.log2(max(n, 1))))))
        if n < tgt:  # pow2 pad, not full-grid pad (device pays per chunk)
            chunks = np.vstack([
                chunks, np.zeros((tgt - n, rec_per_chunk), np.uint64)])
        flushes.append((chunks, groups))
        total_windows += nw
    route_dt = time.perf_counter() - t0
    route_rate = total_windows / route_dt
    sorted_chunks = sum(c.shape[0] for c, _ in flushes)
    fill = total_windows / (sorted_chunks * rec_per_chunk * S)
    print(f"router: {total_windows} windows in {route_dt:.2f}s = "
          f"{route_rate/1e6:.1f}M w/s host-side; {len(flushes)} flushes; "
          f"slot fill {fill:.3f}; groups per flush "
          f"{[len(g) for _, g in flushes]}", flush=True)

    # ---- stage on device ----
    staged = []
    for chunks, groups in flushes:
        rhi, rlo = bucketed._as_planes(np.ascontiguousarray(chunks))
        staged.append((jax.device_put(rhi), jax.device_put(rlo),
                       [(int(a), int(b)) for a, b in
                        np.asarray(groups).reshape(-1, 2)]))

    # ONE counter reused across passes: per-instance jit caches mean a
    # fresh counter would recompile the flush every pass (25x bug in the
    # first chip capture)
    sc_b = bucketed.BucketedCodeCounter(k, initial_capacity=1 << 24,
                                        max_capacity=1 << 26)

    def run_bucketed() -> counting.CountTable:
        sc_b.table = counting.empty_table(sc_b.capacity)
        sc_b._unchecked = None
        sc_b._runs = []
        for rhi, rlo, groups in staged:
            sc_b.add_flush((rhi, rlo), groups)
        t = sc_b.finish()
        _ = int(t.n_unique)  # device sync (tunnel-safe)
        return t

    print("bucketed warmup/compile...", flush=True)
    t0 = time.perf_counter()
    tb = run_bucketed()
    print(f"  warm pass {time.perf_counter() - t0:.2f}s "
          f"(n_unique={int(tb.n_unique)})", flush=True)
    best_b = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        tb = run_bucketed()
        best_b = min(best_b, time.perf_counter() - t0)
    rate_b = total_windows / best_b

    # ---- classic path on the same reads ----
    rows, length = 4096, read_len
    n_batches = (n_reads + rows - 1) // rows
    code_of = np.full(256, 255, np.uint8)
    for i, ch in enumerate(b"ACGT"):
        code_of[ch] = i
    batches = []
    offs_all = rng.integers(0, genome_len, size=n_batches * rows)
    # classic path counts its own reads (same distribution & volume —
    # the comparison metric is windows/s, bit-parity is checked on the
    # SAME reads below at small scale)
    for bi in range(n_batches):
        rowsarr = view[offs_all[bi * rows:(bi + 1) * rows]]
        batches.append(jax.device_put(code_of[rowsarr]))
    windows_classic = n_batches * rows * (length - k + 1)

    sc_c = counting.CodeStreamingCounter(
        k, canonical=True, initial_capacity=1 << 24,
        max_capacity=1 << 26, flush_windows=1 << 26)

    def run_classic() -> counting.CountTable:
        sc_c.table = counting.empty_table(sc_c.capacity)
        sc_c._codes = []
        sc_c._shape = None
        sc_c._unchecked = None
        for b in batches:
            sc_c.add_codes(b)
        t = sc_c.finish()
        _ = int(t.n_unique)
        return t

    print("classic warmup/compile...", flush=True)
    run_classic()
    best_c = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run_classic()
        best_c = min(best_c, time.perf_counter() - t0)
    rate_c = windows_classic / best_c

    # ---- bit-parity on the same reads ----
    print("verifying bit parity on identical reads...", flush=True)
    sc = counting.CodeStreamingCounter(
        k, canonical=True, initial_capacity=1 << 24,
        max_capacity=1 << 26, flush_windows=1 << 26)
    with open(path, "rb") as f:
        pass
    from kat_tpu.io.native import stream_code_batches
    for b in stream_code_batches([path], k):
        sc.add_codes(b)
    tc = sc.finish()
    nb_, nc_ = int(tb.n_unique), int(tc.n_unique)
    kb, cb = counting.table_to_numpy(tb)
    kc, cc = counting.table_to_numpy(tc)
    parity = (nb_ == nc_ and np.array_equal(kb, kc)
              and np.array_equal(cb, cc))

    out = {
        "bucketed_kmers_per_s": round(rate_b, 1),
        "classic_kmers_per_s": round(rate_c, 1),
        "speedup": round(rate_b / rate_c, 3),
        "router_host_windows_per_s": round(route_rate, 1),
        "slot_fill": round(fill, 4),
        "parity_bit_identical": bool(parity),
        "n_unique": nb_,
    }
    print(json.dumps(out), flush=True)
    os.unlink(path)


if __name__ == "__main__":
    main()
