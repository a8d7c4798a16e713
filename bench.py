"""Headline benchmark: canonical k-mer counting throughput (k=27).

Measures the `kat hist` hot path — the replacement for jellyfish's
multithreaded CAS-hash counting loop (reference
lib/src/jellyfish_helper.cc:219-246 countSeqFile / countSlice) — as one
fused device step: 2-bit windows -> canonical pack -> sort -> segment-reduce
-> absorb into resident table.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 1e9 (the BASELINE.json north-star of >1e9 canonical
k-mers/s/host; the reference publishes no numbers of its own — BASELINE.md).

Run on whatever `jax.devices()` offers (real TPU chip under the driver).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    from kat_tpu.core import counting, kmers

    k = 27
    rows, length = 4096, 1024          # ~4.1M windows per batch
    windows = rows * (length - k + 1)
    table_cap = 1 << 23
    warm_steps = 2
    steps = 8

    rng = np.random.default_rng(42)
    batches = [rng.integers(0, 4, size=(rows, length), dtype=np.uint8)
               for _ in range(2)]

    table = counting.empty_table(table_cap)

    def step(table, codes):
        hi, lo, valid = kmers.extract_kmers(codes, k, canonical=True)
        return counting.absorb_batch(table, hi, lo, valid, table_cap)

    dev_batches = [jax.device_put(b) for b in batches]
    for i in range(warm_steps):
        table = step(table, dev_batches[i % 2])
    jax.block_until_ready(table)

    t0 = time.perf_counter()
    for i in range(steps):
        table = step(table, dev_batches[i % 2])
    jax.block_until_ready(table)
    dt = time.perf_counter() - t0

    kmers_per_s = steps * windows / dt
    print(json.dumps({
        "metric": "canonical_kmers_per_s",
        "value": round(kmers_per_s, 1),
        "unit": "kmers/s",
        "vs_baseline": round(kmers_per_s / 1e9, 4),
    }))


if __name__ == "__main__":
    main()
