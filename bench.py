"""Headline benchmark: canonical k-mer counting throughput (k=27).

Measures the `kat hist` hot path — the replacement for jellyfish's
multithreaded CAS-hash counting loop (reference
lib/src/jellyfish_helper.cc:219-246 countSeqFile / countSlice) — end to end
on device: 2-bit windows -> canonical pack -> buffered LSM flush ->
sort+segment-reduce into the resident table.

Workload: reads sampled from a simulated 8.4Mbp genome (E. coli scale) at
~16x coverage, the shape of the reference's own test configs (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 1e9 (the BASELINE.json north-star of >1e9 canonical
k-mers/s/host; the reference publishes no numbers of its own).
"""

from __future__ import annotations


import json
import time

import numpy as np


def main() -> None:
    import jax

    from kat_tpu.core import counting

    k = 27
    rows, length = 4096, 1024          # ~4.1M windows per batch
    windows = rows * (length - k + 1)
    genome_len = 1 << 23               # 8.4 Mbp simulated genome
    table_cap = 1 << 24
    flush_batches = 16                 # ~65.4M windows/flush: fills the
    #                                    sort kernel's 2^26 pow2 geometry
    #                                    to 97.5% (12 batches padded 27%
    #                                    of the sort with sentinels)
    warm_batches = 17                  # exercises one full fused flush
    bench_batches = 48                 # three flushes

    rng = np.random.default_rng(42)
    genome = rng.integers(0, 4, size=genome_len + length, dtype=np.uint8)
    read_view = np.lib.stride_tricks.sliding_window_view(genome, length)

    def make_batch():
        offsets = rng.integers(0, genome_len, size=rows)
        return np.ascontiguousarray(read_view[offsets])

    # Pre-upload the cycling batches: the benchmark isolates device-side
    # counting throughput (over the dev tunnel, host->device bandwidth is
    # artificially slow and would dominate; on a real TPU host the input
    # pipeline overlaps transfers with compute).
    batches = [jax.device_put(make_batch()) for _ in range(4)]

    sc = counting.CodeStreamingCounter(
        k, canonical=True, initial_capacity=table_cap,
        max_capacity=1 << 26, flush_batches=flush_batches)

    for i in range(warm_batches):
        sc.add_codes(batches[i % 4])
    sc._flush()
    _ = int(sc.table.n_unique)  # force pending device work to complete

    def window() -> float:
        t0 = time.perf_counter()
        for i in range(bench_batches):
            sc.add_codes(batches[i % 4])
        sc._flush()
        _ = int(sc.table.n_unique)  # device sync (block_until_ready is
        #                             unreliable over the remote tunnel)
        return time.perf_counter() - t0

    # Best of three measurement windows; but if the FIRST (fully warm,
    # compile-free) window runs below 30M kmers/s the chip pool is
    # degraded ~an order of magnitude — report that single window rather
    # than blowing the driver's time budget on repeats that cannot fix a
    # wedged pool.
    best_dt = window()
    degraded = bench_batches * windows / best_dt < 30e6
    if not degraded:
        for _rep in range(2):
            best_dt = min(best_dt, window())

    kmers_per_s = bench_batches * windows / best_dt

    ingest = _ingest_bench() if not degraded else {
        "ingest_skipped": "degraded chip pool"}

    print(json.dumps({
        "metric": "canonical_kmers_per_s",
        "value": round(kmers_per_s, 1),
        "unit": "kmers/s",
        "vs_baseline": round(kmers_per_s / 1e9, 4),
        **ingest,
    }))


def _ingest_bench() -> dict:
    """End-to-end ingest: FASTQ on disk -> native reader -> prefetch ->
    device counting (SURVEY §7 hard part (f): 'input pipeline keeps chips
    busy').  Over the dev tunnel host->device bandwidth is artificially
    slow, so this is a lower bound for a real TPU host; reported as extra
    fields, the headline metric stays device-side throughput."""
    import os
    import tempfile
    import time as _t

    from kat_tpu.core import counting
    from kat_tpu.io import native
    from kat_tpu.io.prefetch import prefetch

    k = 27
    n_reads, read_len = 120_000, 150
    rng = np.random.default_rng(3)
    genome = rng.integers(0, 4, size=(1 << 22) + read_len, dtype=np.uint8)
    bases = np.frombuffer(b"ACGT", np.uint8)[genome]
    view = np.lib.stride_tricks.sliding_window_view(bases, read_len)
    offs = rng.integers(0, 1 << 22, size=n_reads)
    qual = b"I" * read_len
    fd, path = tempfile.mkstemp(suffix=".fastq")
    try:
        with os.fdopen(fd, "wb") as f:
            for i in range(n_reads):
                f.write(b"@r%d\n" % i)
                f.write(view[offs[i]].tobytes())
                f.write(b"\n+\n")
                f.write(qual)
                f.write(b"\n")

        t0 = _t.perf_counter()
        sc = counting.CodeStreamingCounter(
            k, canonical=True, initial_capacity=1 << 23,
            max_capacity=1 << 26, flush_batches=12)
        for batch in prefetch(native.stream_code_batches([path], k)):
            sc.add_codes(batch)
        table = sc.finish()
        n_uniq = int(table.n_unique)  # device sync
        dt = _t.perf_counter() - t0
        windows = n_reads * (read_len - k + 1)
        return {
            "ingest_kmers_per_s": round(windows / dt, 1),
            "ingest_seconds": round(dt, 2),
            "ingest_distinct": n_uniq,
        }
    finally:
        os.unlink(path)


if __name__ == "__main__":
    main()
