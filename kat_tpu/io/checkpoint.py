"""Sharded count-table checkpoints.

In the reference the jellyfish .jf dump IS the checkpoint (SURVEY §5:
`--dump_hash` + LOAD mode re-consumption).  The TPU build keeps that format
for interchange (io/jellyfish.py) and adds a native sharded checkpoint for
large tables: one .npz per shard plus a JSON manifest carrying k, the
canonical flag, the shard count and the shard-hash identifier, so a resumed
run can place shards directly on the same mesh layout without re-routing.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..core import counting

MANIFEST = "manifest.json"
SHARD_HASH_ID = "fmix32-v1"  # parallel.sharded.shard_hash


def save_table(path: str, table: counting.CountTable, k: int,
               canonical: bool, n_shards: int = 1) -> None:
    """Checkpoint a host-side CountTable, re-partitioned into n_shards by
    the same owner-shard hash the mesh uses."""
    os.makedirs(path, exist_ok=True)
    keys, counts = counting.table_to_numpy(table)
    if n_shards > 1:
        hi = (keys >> np.uint64(32)).astype(np.uint32)
        lo = (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        from ..parallel.sharded import shard_hash
        dest = np.asarray(shard_hash(hi, lo)) % np.uint32(n_shards)
    else:
        dest = np.zeros(len(keys), np.uint32)
    for s in range(n_shards):
        m = dest == s
        np.savez_compressed(os.path.join(path, f"shard_{s:05d}.npz"),
                            keys=keys[m], counts=counts[m])
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump({
            "format": "kat_tpu/count_table",
            "version": 1,
            "k": int(k),
            "canonical": bool(canonical),
            "n_shards": int(n_shards),
            "shard_hash": SHARD_HASH_ID,
            "n_unique": int(len(keys)),
            "total": int(counts.sum(dtype=np.uint64)),
        }, f, indent=2)


def load_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as f:
        m = json.load(f)
    if m.get("format") != "kat_tpu/count_table":
        raise ValueError(f"not a kat_tpu count-table checkpoint: {path}")
    return m


def load_table(path: str) -> tuple[counting.CountTable, dict]:
    """Load a checkpoint into one host-side CountTable (+ manifest)."""
    m = load_manifest(path)
    keys_parts = []
    counts_parts = []
    for s in range(m["n_shards"]):
        z = np.load(os.path.join(path, f"shard_{s:05d}.npz"))
        keys_parts.append(z["keys"])
        counts_parts.append(z["counts"])
    keys = np.concatenate(keys_parts) if keys_parts else \
        np.zeros(0, np.uint64)
    counts = np.concatenate(counts_parts) if counts_parts else \
        np.zeros(0, np.uint32)
    cap = 1 << max(1, int(np.ceil(np.log2(max(len(keys), 2)))))
    return counting.table_from_numpy(keys, counts, capacity=cap), m


def load_shard(path: str, shard: int) -> tuple[np.ndarray, np.ndarray]:
    """(keys, counts) of one shard — for direct per-device placement."""
    z = np.load(os.path.join(path, f"shard_{shard:05d}.npz"))
    return z["keys"], z["counts"]
