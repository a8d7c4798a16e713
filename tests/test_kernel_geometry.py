"""TPU-geometry regression tests for the Pallas kernels (VERDICT r2
item 4): the exact branch structure the chip runs — br=512 build rounds
(row-stride rolls above lane width), W=16 windows, strided S>1 cross
passes, non-pow2 virtual-block counts >= 17, 8-word wide keys, and the
multi-run merge — pinned in interpret mode at sizes CI can afford.

The three on-chip geometry bugs of round 2 lived exactly in branches the
small-geometry tests never reached (strided spread windows, virtual
sentinel blocks, br > 128 row rolls); every case here picks its
(n, br, W) so the branch in question is provably taken.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from kat_tpu.core.kmers import SENTINEL
from kat_tpu.ops.merge_kernel import merge_sorted_kernel
from kat_tpu.ops.sort_kernel import (_pick_window, bitonic_final_phase,
                                     bitonic_merge_runs,
                                     bitonic_sort_planes,
                                     merge_runs_supported,
                                     sort_planes_padded)


pytestmark = pytest.mark.kernel_interpret

def _keys(rng, n, hi_bits=10, sent_frac=0.02):
    hi = rng.integers(0, 1 << hi_bits, n).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    ns = int(n * sent_frac)
    if ns:
        idx = rng.choice(n, ns, replace=False)
        hi[idx] = SENTINEL
        lo[idx] = SENTINEL
    return hi, lo


def _check_sorted_pair(out, hi, lo):
    order = np.lexsort((lo, hi))
    assert np.array_equal(np.asarray(out[0]), hi[order])
    assert np.array_equal(np.asarray(out[1]), lo[order])


def test_sort_br512_real_block_rows():
    """br=512 (the chip geometry): build rounds use ROW-stride rolls for
    r >= 7 up to stride 256 — never reached by the br=8/16 tests."""
    rng = np.random.default_rng(0)
    n = 1 << 18  # 4 blocks of 512x128
    hi, lo = _keys(rng, n)
    out = bitonic_sort_planes((jnp.asarray(hi), jnp.asarray(lo)), 2,
                              block_rows=512, interpret=True)
    _check_sorted_pair(out, hi, lo)


def test_sort_w16_with_strided_pass():
    """nb=64 blocks at W=16: phase 16 runs a strided S>1 cross pass
    (T=32 >= W) before the final S=1 window — the spread-window branch."""
    n, br = 1 << 16, 8
    nb = n // (br * 128)
    W = _pick_window(2, br, nb)
    assert W == 16 and nb // 2 >= W, "geometry no longer exercises S>1"
    rng = np.random.default_rng(1)
    hi, lo = _keys(rng, n)
    out = bitonic_sort_planes((jnp.asarray(hi), jnp.asarray(lo)), 2,
                              block_rows=br, interpret=True)
    _check_sorted_pair(out, hi, lo)


def test_sort_deep_strided_chain():
    """nb=256: phase 18's stride chain needs TWO strided passes
    (T=128 -> S=16, T=8 < W stops) before the window pass."""
    n, br = 1 << 18, 8
    rng = np.random.default_rng(2)
    hi, lo = _keys(rng, n)
    out = bitonic_sort_planes((jnp.asarray(hi), jnp.asarray(lo)), 2,
                              block_rows=br, interpret=True)
    _check_sorted_pair(out, hi, lo)


@pytest.mark.parametrize("nbr", [17, 19, 33])
def test_final_phase_non_pow2_blocks_past_window(nbr):
    """Virtual sentinel blocks BEYOND one window (nbr >= 17 at W=16):
    the strided grid must skip virtual blocks in every stage."""
    br = 8
    bs = br * 128
    n = nbr * bs
    rng = np.random.default_rng(nbr)
    hi, lo = _keys(rng, n, sent_frac=0.0)
    # bitonic layout: first half descending, second ascending
    half = n // 2
    part_a = np.sort((hi[:half].astype(np.uint64) << np.uint64(32))
                     | lo[:half])[::-1]
    part_b = np.sort((hi[half:].astype(np.uint64) << np.uint64(32))
                     | lo[half:])
    merged = np.concatenate([part_a, part_b])
    mh = (merged >> np.uint64(32)).astype(np.uint32)
    ml = (merged & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out = bitonic_final_phase((jnp.asarray(mh), jnp.asarray(ml)), 2,
                              block_rows=br, interpret=True)
    _check_sorted_pair(out, mh, ml)


def test_merge_kernel_large_uneven_non_pow2():
    """Two sorted streams whose combined block count is 21 (non-pow2,
    > one window) through the public merge entry, with payloads."""
    br = 8
    bs = br * 128
    na, nb_ = 13 * bs, 8 * bs - 77
    rng = np.random.default_rng(9)

    def sorted_stream(n):
        hi = np.sort(rng.integers(0, 1 << 9, n).astype(np.uint32))
        lo = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
        key = (hi.astype(np.uint64) << np.uint64(32)) | lo
        key = np.sort(key)
        return ((key >> np.uint64(32)).astype(np.uint32),
                (key & np.uint64(0xFFFFFFFF)).astype(np.uint32))

    ah, al = sorted_stream(na)
    bh, bl = sorted_stream(nb_)
    ac = rng.integers(1, 100, na).astype(np.uint32)
    bc = rng.integers(1, 100, nb_).astype(np.uint32)
    (mh, ml), (mc,) = merge_sorted_kernel(
        (jnp.asarray(ah), jnp.asarray(al)), (jnp.asarray(ac),),
        (jnp.asarray(bh), jnp.asarray(bl)), (jnp.asarray(bc),),
        block_rows=br, interpret=True)
    tot = na + nb_
    allk = np.concatenate([
        (ah.astype(np.uint64) << np.uint64(32)) | al,
        (bh.astype(np.uint64) << np.uint64(32)) | bl])
    allc = np.concatenate([ac, bc])
    order = np.argsort(allk, kind="stable")
    gk = ((np.asarray(mh[:tot]).astype(np.uint64) << np.uint64(32))
          | np.asarray(ml[:tot]))
    assert np.array_equal(gk, allk[order])
    # payload multiset per key (bitonic merge is not stable)
    import collections
    assert (collections.Counter(zip(gk.tolist(),
                                    np.asarray(mc[:tot]).tolist()))
            == collections.Counter(zip(allk.tolist(), allc.tolist())))


def test_sort_wide_8_word_keys():
    """8-word keys (k up to 127): the widest plane count the flush uses."""
    rng = np.random.default_rng(4)
    n = 4096
    words = [rng.integers(0, 5, n).astype(np.uint32) for _ in range(8)]
    out = bitonic_sort_planes(tuple(jnp.asarray(w) for w in words), 8,
                              block_rows=8, interpret=True)
    order = np.lexsort(tuple(words[::-1]))
    for w, o in zip(words, out):
        assert np.array_equal(np.asarray(o), w[order])


@pytest.mark.parametrize("n_runs,run_len,br", [
    (8, 1024, 8), (16, 1024, 8), (4, 4096, 8), (2, 2048, 16),
])
def test_merge_runs_matches_sort(n_runs, run_len, br):
    rng = np.random.default_rng(run_len + n_runs)
    n = n_runs * run_len
    hi, lo = _keys(rng, n, sent_frac=0.0)
    hi2 = hi.reshape(n_runs, run_len)
    lo2 = lo.reshape(n_runs, run_len)
    for r in range(n_runs):
        ns = int(rng.integers(0, run_len // 4))
        if ns:
            hi2[r, -ns:] = SENTINEL
            lo2[r, -ns:] = SENTINEL
        order = np.lexsort((lo2[r], hi2[r]))
        hi2[r] = hi2[r][order]
        lo2[r] = lo2[r][order]
    hi = hi2.reshape(-1)
    lo = lo2.reshape(-1)
    assert merge_runs_supported(n, run_len, br)
    out = bitonic_merge_runs((jnp.asarray(hi), jnp.asarray(lo)), 2,
                             run_len, block_rows=br, interpret=True)
    _check_sorted_pair(out, hi, lo)


def test_merge_runs_batched_local_phases():
    """run_len == block size: several phases fit inside one window and
    run as ONE batched pass (the ps_lo < ps_hi branch)."""
    n_runs, br = 16, 8
    run_len = br * 128
    rng = np.random.default_rng(77)
    n = n_runs * run_len
    hi, lo = _keys(rng, n, sent_frac=0.0)
    hi2 = hi.reshape(n_runs, run_len)
    lo2 = lo.reshape(n_runs, run_len)
    for r in range(n_runs):
        order = np.lexsort((lo2[r], hi2[r]))
        hi2[r] = hi2[r][order]
        lo2[r] = lo2[r][order]
    hi = hi2.reshape(-1)
    lo = lo2.reshape(-1)
    out = bitonic_merge_runs((jnp.asarray(hi), jnp.asarray(lo)), 2,
                             run_len, block_rows=br, interpret=True)
    _check_sorted_pair(out, hi, lo)


def test_padded_sort_br512_sentinel_fill():
    """sort_planes_padded at br=512 with a 60%-fill input: the sentinel
    pad must sort to the back and slice away (bench geometry, where 12
    pad batches fill 27% of the sort)."""
    rng = np.random.default_rng(6)
    n = (1 << 18) * 6 // 10
    hi, lo = _keys(rng, n, sent_frac=0.01)
    out = sort_planes_padded((jnp.asarray(hi), jnp.asarray(lo)), 2,
                             block_rows=512, interpret=True)
    assert out[0].shape[0] == n
    _check_sorted_pair(out, hi, lo)


def test_sort_12_word_keys():
    """12-word keys (k in (159, 191]) — the widest plane count a
    k<=255 flush can reach is 16; 12 pins the generic-plane path."""
    rng = np.random.default_rng(12)
    n = 2048
    words = [rng.integers(0, 4, n).astype(np.uint32) for _ in range(12)]
    out = bitonic_sort_planes(tuple(jnp.asarray(w) for w in words), 12,
                              block_rows=8, interpret=True)
    order = np.lexsort(tuple(words[::-1]))
    for w, o in zip(words, out):
        assert np.array_equal(np.asarray(o), w[order])


def test_vmem_geometry_model_pins():
    """Chip-calibrated (W, br) picks (round-3 v5e scoped-VMEM battery:
    /tmp-era calibration recorded in the sort-kernel cost-model comment).
    The 2/3/5/7-plane rows are the geometries every recorded benchmark
    ran with — they must never drift; the 9+ rows are the first
    feasible wide-key configurations (>=11 planes shrink block_rows)."""
    from kat_tpu.ops.sort_kernel import _pick_window, _shrink_br_planes

    pins = {2: (16, 512), 3: (8, 512), 5: (8, 512), 7: (4, 512),
            9: (2, 512), 11: (4, 256), 13: (4, 256), 17: (2, 256)}
    for planes, (want_w, want_br) in pins.items():
        br = _shrink_br_planes(planes, 512)
        assert br == want_br, (planes, br)
        assert _pick_window(planes, br, 1 << 10) == want_w, planes
