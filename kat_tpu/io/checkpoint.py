"""Sharded count-table checkpoints.

In the reference the jellyfish .jf dump IS the checkpoint (SURVEY §5:
`--dump_hash` + LOAD mode re-consumption).  The TPU build keeps that format
for interchange (io/jellyfish.py) and adds a native sharded checkpoint for
large tables: one .npz per shard plus a JSON manifest carrying k, the
canonical flag, the shard count and the shard-hash identifier, so a resumed
run can place shards directly on the same mesh layout without re-routing.

Both narrow (k <= 31, u64 keys) and wide (k > 31, [n, n_words] uint32 word rows)
tables are supported; the manifest's "key_words" field records which.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..core import counting, wide as wide_mod

MANIFEST = "manifest.json"
# fmix32 over the CANONICAL key form — the same ownership rule the mesh
# uses (parallel.sharded.owner_shard), so shards place directly on the
# mesh layout even for canonical=False tables whose stored keys are raw.
SHARD_HASH_ID = "canonical-fmix32-v1"


def _rev2_u64(x: np.ndarray) -> np.ndarray:
    """Reverse the 2-bit groups of uint64 values (vectorized host-side)."""
    m = np.uint64
    x = ((x & m(0x3333333333333333)) << m(2)) | \
        ((x >> m(2)) & m(0x3333333333333333))
    x = ((x & m(0x0F0F0F0F0F0F0F0F)) << m(4)) | \
        ((x >> m(4)) & m(0x0F0F0F0F0F0F0F0F))
    x = ((x & m(0x00FF00FF00FF00FF)) << m(8)) | \
        ((x >> m(8)) & m(0x00FF00FF00FF00FF))
    x = ((x & m(0x0000FFFF0000FFFF)) << m(16)) | \
        ((x >> m(16)) & m(0x0000FFFF0000FFFF))
    return (x << m(32)) | (x >> m(32))


def _canonical_keys_np(keys: np.ndarray, k: int) -> np.ndarray:
    """min(key, revcomp) for packed u64 keys (mer_dna.hpp:436 semantics),
    numpy host-side — the checkpoint must not touch any device."""
    m = np.uint64
    rc = _rev2_u64(~keys) >> m(64 - 2 * k)
    rc &= m((1 << (2 * k)) - 1)
    return np.minimum(keys, rc)


def _rev2_u32(x: np.ndarray) -> np.ndarray:
    m = np.uint32
    x = ((x & m(0x33333333)) << m(2)) | ((x >> m(2)) & m(0x33333333))
    x = ((x & m(0x0F0F0F0F)) << m(4)) | ((x >> m(4)) & m(0x0F0F0F0F))
    x = ((x & m(0x00FF00FF)) << m(8)) | ((x >> m(8)) & m(0x00FF00FF))
    return (x << m(16)) | (x >> m(16))


def _canonical_words_np(words: np.ndarray, k: int) -> np.ndarray:
    """Row-wise canonical form of big-first [n, nw] uint32 word keys
    (numpy mirror of core.kmers.canonicalize_words)."""
    n, nw = words.shape
    rev = np.empty_like(words)
    for i in range(nw):
        rev[:, i] = _rev2_u32(~words[:, nw - 1 - i])
    shift = 32 * nw - 2 * k
    ws, bs = divmod(shift, 32)
    rc = np.zeros_like(words)
    for i in range(nw):
        src = i - ws
        if 0 <= src < nw:
            v = rev[:, src] >> np.uint32(bs) if bs else rev[:, src].copy()
            if bs and src - 1 >= 0:
                v |= rev[:, src - 1] << np.uint32(32 - bs)
        elif bs and 0 <= src - 1 < nw:
            v = rev[:, src - 1] << np.uint32(32 - bs)
        else:
            v = np.zeros(n, np.uint32)
        rc[:, i] = v
    bits = 2 * k
    for i in range(nw):
        top = bits - 32 * (nw - 1 - i)
        if top <= 0:
            rc[:, i] = 0
        elif top < 32:
            rc[:, i] &= np.uint32((1 << top) - 1)
    # lexicographic row-wise min(words, rc)
    less = np.zeros(n, np.bool_)
    eq = np.ones(n, np.bool_)
    for i in range(nw):
        less |= eq & (rc[:, i] < words[:, i])
        eq &= rc[:, i] == words[:, i]
    return np.where(less[:, None], rc, words)


def _shard_hash_words_np(words) -> np.ndarray:
    """Numpy mirror of parallel.sharded.shard_hash_words (bit-exact; the
    checkpoint path must not touch any device)."""
    u = np.uint32
    x = words[0] ^ u(0x9E3779B9)
    for w in words:
        x = (x ^ w) * u(0x85EBCA6B)
        x = x ^ (x >> u(16))
    x = x * u(0x7FEB352D)
    x = x ^ (x >> u(15))
    x = x * u(0x846CA68B)
    x = x ^ (x >> u(16))
    return x


def _shard_dest(keys_or_words: np.ndarray, n_shards: int,
                wide: bool, k: int) -> np.ndarray:
    """Owner shard of each key: fmix32 of its CANONICAL form — identical
    to the mesh's parallel.sharded.owner_shard, so a resumed run can
    place shards without re-routing regardless of the table's canonical
    flag (canonicalization is a no-op for already-canonical keys)."""
    if wide:
        cw = _canonical_words_np(keys_or_words, k)
        words = tuple(cw[:, i].astype(np.uint32)
                      for i in range(cw.shape[1]))
    else:
        keys = _canonical_keys_np(keys_or_words, k)
        words = ((keys >> np.uint64(32)).astype(np.uint32),
                 (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    return _shard_hash_words_np(words) % np.uint32(n_shards)


def save_table(path: str, table: counting.CountTable | wide_mod.WideTable,
               k: int, canonical: bool, n_shards: int = 1) -> None:
    """Checkpoint a host-side CountTable or WideTable, re-partitioned into
    n_shards by the same owner-shard hash the mesh uses."""
    os.makedirs(path, exist_ok=True)
    wide = isinstance(table, wide_mod.WideTable)
    if wide:
        keys, counts = wide_mod.table_words_to_numpy(table)
        key_words = keys.shape[1]
    else:
        keys, counts = counting.table_to_numpy(table)
        key_words = 2
    if n_shards > 1:
        dest = _shard_dest(keys, n_shards, wide, k)
    else:
        dest = np.zeros(len(counts), np.uint32)
    for s in range(n_shards):
        m = dest == s
        np.savez_compressed(os.path.join(path, f"shard_{s:05d}.npz"),
                            keys=keys[m], counts=counts[m])
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump({
            "format": "kat_tpu/count_table",
            "version": 3,
            "k": int(k),
            "canonical": bool(canonical),
            "n_shards": int(n_shards),
            "shard_hash": SHARD_HASH_ID,
            "key_words": int(key_words),
            "n_unique": int(len(counts)),
            "total": int(counts.sum(dtype=np.uint64)),
        }, f, indent=2)


def load_manifest(path: str) -> dict:
    with open(os.path.join(path, MANIFEST)) as f:
        m = json.load(f)
    if m.get("format") != "kat_tpu/count_table":
        raise ValueError(f"not a kat_tpu count-table checkpoint: {path}")
    return m


def load_table(path: str) -> tuple[
        counting.CountTable | wide_mod.WideTable, dict]:
    """Load a checkpoint into one host-side table (+ manifest)."""
    m = load_manifest(path)
    wide = m.get("key_words", 2) > 2
    keys_parts = []
    counts_parts = []
    for s in range(m["n_shards"]):
        z = np.load(os.path.join(path, f"shard_{s:05d}.npz"))
        keys_parts.append(z["keys"])
        counts_parts.append(z["counts"])
    counts = np.concatenate(counts_parts) if counts_parts else \
        np.zeros(0, np.uint32)
    cap = 1 << max(1, int(np.ceil(np.log2(max(len(counts), 2)))))
    if wide:
        words = np.concatenate(keys_parts) if keys_parts else \
            np.zeros((0, m["key_words"]), np.uint32)
        return wide_mod.table_from_words(words, counts, capacity=cap), m
    keys = np.concatenate(keys_parts) if keys_parts else \
        np.zeros(0, np.uint64)
    return counting.table_from_numpy(keys, counts, capacity=cap), m


def load_shard(path: str, shard: int) -> tuple[np.ndarray, np.ndarray]:
    """(keys, counts) of one shard — for direct per-device placement."""
    z = np.load(os.path.join(path, f"shard_{shard:05d}.npz"))
    return z["keys"], z["counts"]
