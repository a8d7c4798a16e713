"""Pallas reduce-by-key kernel: interpret-mode parity vs a dict oracle,
plus an exhaustive check of the monotone log-shift routing primitive the
kernel's compaction rests on."""

import itertools

import numpy as np
import pytest

import jax.numpy as jnp

from kat_tpu.core.kmers import SENTINEL
from kat_tpu.ops.reduce_kernel import reduce_compact_sorted

S = int(SENTINEL)


pytestmark = pytest.mark.kernel_interpret

def _oracle(words_cols, w):
    from collections import defaultdict

    d = defaultdict(int)
    for row in zip(*[c.tolist() for c in words_cols], w.tolist()):
        key, ww = row[:-1], row[-1]
        if all(x == S for x in key):
            continue
        d[key] += ww
    return sorted(d.items())


def _run(words, w, out_size, rt=8):
    outs = reduce_compact_sorted(
        tuple(jnp.asarray(x) for x in words), jnp.asarray(w), out_size,
        rows_per_tile=rt, interpret=True)
    *cols, nu = outs
    return [np.asarray(c) for c in cols], int(nu)


def _random_case(rng, n, nk, n_words=2, sent_frac=0.2, wmax=5):
    keys = rng.integers(0, nk, n)
    uniq = rng.integers(0, 1 << 32, (nk, n_words), dtype=np.uint64)
    cols = [uniq[keys, j].astype(np.uint32) for j in range(n_words)]
    w = rng.integers(0, wmax, n).astype(np.uint32)
    m = rng.random(n) < sent_frac
    for c in cols:
        c[m] = S
    w[m] = 0
    order = np.lexsort(tuple(reversed(cols)))
    return [c[order] for c in cols], w[order]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("rt", [8, 16])
def test_narrow_random_parity(seed, rt):
    rng = np.random.default_rng(seed)
    cols, w = _random_case(rng, int(rng.integers(100, 6000)),
                           int(rng.integers(1, 60)))
    out_size = len(w) + 64
    got, nu = _run(cols, w, out_size, rt)
    want = _oracle(cols, w)
    assert nu == len(want)
    assert list(zip(got[0][:nu].tolist(), got[1][:nu].tolist())) == \
        [k for k, _ in want]
    assert got[2][:nu].tolist() == [v for _, v in want]
    assert (got[0][nu:] == S).all() and (got[2][nu:] == 0).all()


def test_wide_keys_parity():
    rng = np.random.default_rng(7)
    cols, w = _random_case(rng, 3000, 40, n_words=4)
    got, nu = _run(cols, w, 3100)
    want = _oracle(cols, w)
    assert nu == len(want)
    for j in range(4):
        assert got[j][:nu].tolist() == [k[j] for k, _ in want]
    assert got[4][:nu].tolist() == [v for _, v in want]


def test_all_sentinel():
    n = 2048
    cols = [np.full(n, S, np.uint32), np.full(n, S, np.uint32)]
    got, nu = _run(cols, np.zeros(n, np.uint32), 256)
    assert nu == 0
    assert (got[0] == S).all() and (got[2] == 0).all()


def test_single_run_spanning_tiles():
    """One key across many tiles: count accumulates through the carry and
    the run is emitted only via the final carry append."""
    n = 8 * 128 * 3 + 17
    cols = [np.full(n, 5, np.uint32), np.full(n, 9, np.uint32)]
    w = np.ones(n, np.uint32)
    got, nu = _run(cols, w, 128)
    assert nu == 1
    assert got[0][0] == 5 and got[1][0] == 9 and got[2][0] == n


def test_no_sentinel_tail_uses_carry():
    """Exactly tile-aligned input with no sentinel padding: the final run
    only exists in the carry state."""
    n = 1024
    hi = np.sort(np.repeat(np.arange(64, dtype=np.uint32), 16))
    lo = hi * 3
    w = np.ones(n, np.uint32)
    got, nu = _run([hi, lo], w, 128)
    assert nu == 64
    assert got[2][:64].tolist() == [16] * 64
    assert got[0][63] == 63


def test_overflow_reports_true_count():
    rng = np.random.default_rng(3)
    cols, w = _random_case(rng, 4096, 600, sent_frac=0.0, wmax=3)
    want = _oracle(cols, w)
    got, nu = _run(cols, w, 64)  # out_size far smaller than uniques
    assert nu == len(want) > 64


def test_count_accumulation_large_weights():
    n = 2048
    cols = [np.zeros(n, np.uint32), np.full(n, 2, np.uint32)]
    w = np.full(n, 1 << 20, np.uint32)
    got, nu = _run(cols, w, 128)
    assert nu == 1
    assert got[2][0] == (n << 20) % (1 << 32)


def test_counting_integration_interpret(monkeypatch):
    """KAT_TPU_KERNEL=1 routes counting._unique_reduce through the Pallas
    kernel (interpret mode on CPU) and must match the XLA path exactly."""
    from kat_tpu.core import counting

    rng = np.random.default_rng(11)
    n = 4096
    keys = rng.integers(0, 300, n).astype(np.uint32)
    hi = jnp.asarray(keys >> 8)
    lo = jnp.asarray(keys)
    valid = rng.random(n) < 0.9
    hi = jnp.where(jnp.asarray(valid), hi, SENTINEL)
    lo = jnp.where(jnp.asarray(valid), lo, SENTINEL)
    w = jnp.asarray(valid).astype(jnp.uint32)
    # call the unjitted reduce directly: the jitted wrappers cache traces,
    # so an env flip between calls would not retrace
    want = counting._unique_reduce(hi, lo, w, 512)

    monkeypatch.setenv("KAT_TPU_KERNEL", "1")
    counting.kernels_enabled.cache_clear()
    try:
        got = counting._unique_reduce(hi, lo, w, 512)
    finally:
        monkeypatch.delenv("KAT_TPU_KERNEL")
        counting.kernels_enabled.cache_clear()
    assert int(got[3]) == int(want[3])
    for g, x in zip(got[:3], want[:3]):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(x))


def _random_codes(rng, rows, length):
    codes = rng.integers(0, 4, (rows, length)).astype(np.uint8)
    codes[rng.random((rows, length)) < 0.02] = 255  # invalid bases
    return codes


def test_fused_flush_v2_interpret(monkeypatch):
    """The kernel-path fused flush (sort fresh + bitonic merge + Pallas
    reduce) must produce byte-identical tables to the XLA path."""
    from kat_tpu.core import counting

    rng = np.random.default_rng(5)
    batches = [_random_codes(rng, 8, 64) for _ in range(3)]

    def run():
        sc = counting.CodeStreamingCounter(
            9, canonical=True, initial_capacity=1 << 10, flush_batches=2)
        for b in batches:
            sc.add_codes(b)
        t = sc.finish()
        return (np.asarray(t.keys_hi), np.asarray(t.keys_lo),
                np.asarray(t.counts), int(t.n_unique))

    want = run()
    monkeypatch.setenv("KAT_TPU_KERNEL", "1")
    counting.kernels_enabled.cache_clear()
    try:
        got = run()
    finally:
        monkeypatch.delenv("KAT_TPU_KERNEL")
        counting.kernels_enabled.cache_clear()
    assert got[3] == want[3]
    for g, x in zip(got[:3], want[:3]):
        np.testing.assert_array_equal(g, x)


def test_fused_flush_v2_wide_interpret(monkeypatch):
    from kat_tpu.core import counting, wide

    rng = np.random.default_rng(6)
    batches = [_random_codes(rng, 4, 96) for _ in range(2)]

    def run():
        sc = wide.WideCodeStreamingCounter(
            41, canonical=True, initial_capacity=1 << 9, flush_batches=2)
        for b in batches:
            sc.add_codes(b)
        t = sc.finish()
        return ([np.asarray(w) for w in t.words], np.asarray(t.counts),
                int(t.n_unique))

    want = run()
    monkeypatch.setenv("KAT_TPU_KERNEL", "1")
    counting.kernels_enabled.cache_clear()
    try:
        got = run()
    finally:
        monkeypatch.delenv("KAT_TPU_KERNEL")
        counting.kernels_enabled.cache_clear()
    assert got[2] == want[2]
    for g, x in zip(got[0], want[0]):
        np.testing.assert_array_equal(g, x)
    np.testing.assert_array_equal(got[1], want[1])


def test_logshift_routing_exhaustive():
    """The collision-freeness of LSB->MSB monotone routing, checked
    exhaustively at n=10 against direct compaction."""
    for bits in itertools.product([0, 1], repeat=10):
        mask = np.array(bits, bool)
        vals = np.arange(10) + 7
        rank = np.cumsum(mask) - mask
        v = vals.copy()
        m = mask.copy()
        d = np.where(mask, np.arange(10) - rank, 0)
        s = 1
        while s < 10:
            moves = m & ((d & s) != 0)
            recv = np.zeros(10, bool)
            recv[: 10 - s] = moves[s:]
            nv, nm, nd = v.copy(), m.copy(), d.copy()
            # collision = receiving slot occupied by a kept non-mover
            assert not (recv & m & ~moves).any(), bits
            nm[moves] = False
            idx = np.nonzero(recv)[0]
            nv[idx] = v[idx + s]
            nm[idx] = True
            nd[idx] = d[idx + s] - s
            v, m, d = nv, nm, nd
            s *= 2
        cnt = int(mask.sum())
        assert (v[:cnt] == vals[mask]).all()


def _lsm_table_dict(t):
    n = int(t.n_unique)
    hi = np.asarray(t.keys_hi[:n], np.uint64)
    lo = np.asarray(t.keys_lo[:n], np.uint64)
    c = np.asarray(t.counts[:n])
    return dict(zip(((hi << np.uint64(32)) | lo).tolist(), c.tolist()))


def test_lsm_multi_run_tables_interpret(monkeypatch):
    """LSM mode (per-flush sorted runs, consolidation merge deferred)
    must match the non-LSM path exactly, for any run budget."""
    from kat_tpu.core import counting

    rng = np.random.default_rng(8)
    batches = [_random_codes(rng, 8, 64) for _ in range(7)]

    def run(lsm):
        sc = counting.CodeStreamingCounter(
            9, canonical=True, initial_capacity=1 << 10, flush_batches=2,
            lsm_runs=lsm)
        for b in batches:
            sc.add_codes(b)
        return _lsm_table_dict(sc.finish())

    monkeypatch.setenv("KAT_TPU_KERNEL", "1")
    counting.kernels_enabled.cache_clear()
    try:
        want = run(0)         # fused per-flush table merge
        for lsm_runs in (1, 2, 3):
            assert run(lsm_runs) == want, lsm_runs
    finally:
        monkeypatch.delenv("KAT_TPU_KERNEL")
        counting.kernels_enabled.cache_clear()


def test_lsm_growth_replay_interpret(monkeypatch):
    """Capacity growth in LSM mode: a run overflowing the capacity must
    replay at doubled capacity (deferred), and consolidation overflow
    must re-merge — final counts exact either way."""
    from kat_tpu.core import counting

    rng = np.random.default_rng(13)
    batches = [_random_codes(rng, 16, 64) for _ in range(4)]

    def run(cap):
        sc = counting.CodeStreamingCounter(
            11, canonical=True, initial_capacity=cap, flush_batches=1,
            lsm_runs=3, max_capacity=1 << 14)
        for b in batches:
            sc.add_codes(b)
        return _lsm_table_dict(sc.finish())

    monkeypatch.setenv("KAT_TPU_KERNEL", "1")
    counting.kernels_enabled.cache_clear()
    try:
        want = run(1 << 13)   # ample: no growth
        got = run(1 << 10)    # tiny: forces run + consolidation growth
    finally:
        monkeypatch.delenv("KAT_TPU_KERNEL")
        counting.kernels_enabled.cache_clear()
    assert got == want


def test_lsm_current_table_settles_pending(monkeypatch):
    from kat_tpu.core import counting

    rng = np.random.default_rng(14)
    batches = [_random_codes(rng, 8, 64) for _ in range(2)]

    monkeypatch.setenv("KAT_TPU_KERNEL", "1")
    counting.kernels_enabled.cache_clear()
    try:
        sc = counting.CodeStreamingCounter(
            9, canonical=True, initial_capacity=1 << 10, flush_batches=1,
            lsm_runs=4)
        for b in batches:
            sc.add_codes(b)
        assert len(sc._runs) == 2       # pending, not consolidated
        mid = _lsm_table_dict(sc.current_table())
        assert not sc._runs             # settled
        ref = counting.CodeStreamingCounter(
            9, canonical=True, initial_capacity=1 << 10, flush_batches=1,
            lsm_runs=0)
        for b in batches:
            ref.add_codes(b)
        assert mid == _lsm_table_dict(ref.finish())
    finally:
        monkeypatch.delenv("KAT_TPU_KERNEL")
        counting.kernels_enabled.cache_clear()


def test_lsm_wide_interpret(monkeypatch):
    """Wide-key LSM mode matches the fused wide path exactly."""
    from kat_tpu.core import counting, wide

    rng = np.random.default_rng(21)
    batches = [_random_codes(rng, 4, 96) for _ in range(5)]

    def run(lsm):
        sc = wide.WideCodeStreamingCounter(
            41, canonical=True, initial_capacity=1 << 9, flush_batches=2,
            lsm_runs=lsm)
        for b in batches:
            sc.add_codes(b)
        t = sc.finish()
        return ([np.asarray(w).tolist() for w in t.words],
                np.asarray(t.counts).tolist(), int(t.n_unique))

    monkeypatch.setenv("KAT_TPU_KERNEL", "1")
    counting.kernels_enabled.cache_clear()
    try:
        want = run(0)
        got = run(3)
    finally:
        monkeypatch.delenv("KAT_TPU_KERNEL")
        counting.kernels_enabled.cache_clear()
    assert got == want


@pytest.mark.parametrize("n,keep_p", [(128 * 64, 0.5), (128 * 200, 0.05),
                                      (128 * 64 * 3 + 640, 0.95),
                                      (1 << 10, 1.0), (1 << 10, 0.0)])
def test_compact_flagged_matches_numpy(n, keep_p):
    """Stable flag compaction == numpy boolean-mask extraction, order
    preserved, across tile boundaries, partial tiles, all/none kept."""
    import numpy as np

    from kat_tpu.ops.reduce_kernel import compact_flagged

    rng = np.random.default_rng(n + int(keep_p * 10))
    a = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    b = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    flag = (rng.random(n) < keep_p).astype(np.uint32)
    kept = int(flag.sum())
    out_size = max(kept + 130, 256)

    ca, cb, n_kept = compact_flagged(
        (jnp.asarray(a), jnp.asarray(b)), jnp.asarray(flag), out_size,
        rows_per_tile=8, interpret=True)
    assert int(n_kept) == kept
    np.testing.assert_array_equal(np.asarray(ca)[:kept], a[flag == 1])
    np.testing.assert_array_equal(np.asarray(cb)[:kept], b[flag == 1])
    assert (np.asarray(ca)[kept:] == 0).all()


def test_compact_flagged_exact_out_size():
    """out_size exactly equal to the kept count (the join's case)."""
    import numpy as np

    from kat_tpu.ops.reduce_kernel import compact_flagged

    rng = np.random.default_rng(7)
    n = 128 * 24
    a = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    flag = (rng.random(n) < 0.3).astype(np.uint32)
    kept = int(flag.sum())
    ca, n_kept = compact_flagged((jnp.asarray(a),), jnp.asarray(flag),
                                 kept, rows_per_tile=8, interpret=True)
    assert int(n_kept) == kept
    np.testing.assert_array_equal(np.asarray(ca), a[flag == 1])
