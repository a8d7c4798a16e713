"""On-device self-attestation of the Pallas counting kernels.

Checks the three flush kernels (ops/sort_kernel.py, ops/merge_kernel.py,
ops/reduce_kernel.py) for bit-identity against their XLA reference
formulations (`jax.lax.sort` and the scan-based
`counting._unique_reduce`) at a size large enough to exercise the real
TPU geometry (multi-window grids, strided cross passes, non-pow2 merge
block counts).  All comparisons reduce to ONE device-side scalar per
check, so nothing big crosses the (slow) device tunnel.

Run by `bench.py` before the headline measurement so every recorded
benchmark JSON carries a fresh PASS/FAIL attestation for the kernels it
exercised (VERDICT r2: the on-chip bit-identity claim must be a
re-runnable artifact, not a builder anecdote), and standalone via
`python benchmarks/verify_kernels_tpu.py`.
"""

from __future__ import annotations

import time

import numpy as np


def verify_kernels(n: int = 1 << 22, seed: int = 0,
                   interpret: bool = False) -> dict:
    """Returns {"sort": "PASS"|"FAIL", "merge": ..., "reduce": ...,
    "verify_seconds": float} with every check run on device."""
    import jax
    import jax.numpy as jnp

    from ..core.counting import _unique_reduce
    from ..core.kmers import SENTINEL
    from ..ops.merge_kernel import merge_sorted_kernel
    from ..ops.reduce_kernel import reduce_compact_sorted
    from ..ops.sort_kernel import sort_planes_padded

    t0 = time.time()
    rng = np.random.default_rng(seed)
    # Key-shaped data: structured hi (low entropy high bits, like packed
    # k-mers), full-entropy lo, ~1% sentinel tail (invalid windows).
    hi_np = rng.integers(0, 1 << 22, n, dtype=np.uint32)
    lo_np = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    n_sent = n // 128
    hi_np[-n_sent:] = np.uint32(SENTINEL)
    lo_np[-n_sent:] = np.uint32(SENTINEL)
    hi = jax.device_put(jnp.asarray(hi_np))
    lo = jax.device_put(jnp.asarray(lo_np))

    results: dict = {}

    # ---- full sort: Pallas windowed bitonic vs lax.sort -----------------
    @jax.jit
    def _sort_check(hi, lo):
        shi, slo = sort_planes_padded((hi, lo), 2, interpret=interpret)
        rhi, rlo = jax.lax.sort((hi, lo), num_keys=2)
        return jnp.all((shi == rhi) & (slo == rlo)), shi, slo

    sort_ok, shi, slo = _sort_check(hi, lo)
    results["sort"] = "PASS" if bool(sort_ok) else "FAIL"

    # ---- merge: non-pow2 block counts vs lax.sort of the concat ---------
    # Split sizes chosen so the block counts are NOT powers of two (the
    # round-2 on-chip bugs hid exactly there).
    na = (n // 8) * 5
    w = (~((shi == SENTINEL) & (slo == SENTINEL))).astype(jnp.uint32)

    @jax.jit
    def _merge_check(shi, slo, w):
        ahi, alo, aw = shi[:na], slo[:na], w[:na]
        bhi, blo, bw = shi[na:], slo[na:], w[na:]
        (mhi, mlo), (mw,) = merge_sorted_kernel(
            (ahi, alo), (aw,), (bhi, blo), (bw,), interpret=interpret)
        # permutation-insensitive compare: order both sides by the FULL
        # (key, payload) triple
        k1 = jax.lax.sort((mhi[:n], mlo[:n], mw[:n]), num_keys=3)
        k2 = jax.lax.sort((shi, slo, w), num_keys=3)
        ok = jnp.ones((), jnp.bool_)
        for a, b in zip(k1, k2):
            ok = ok & jnp.all(a == b)
        return ok, mhi, mlo, mw

    merge_ok, mhi, mlo, mw = _merge_check(shi, slo, w)
    results["merge"] = "PASS" if bool(merge_ok) else "FAIL"

    # ---- streaming reduce vs the XLA scan formulation -------------------
    out_size = n // 2

    @jax.jit
    def _reduce_check(shi, slo, w):
        khi, klo, kc, kn = reduce_compact_sorted(
            (shi, slo), w, out_size, interpret=interpret)
        rhi, rlo, rc, rn = _unique_reduce(shi, slo, w, out_size,
                                          use_kernel=False)
        return (jnp.all(khi == rhi) & jnp.all(klo == rlo)
                & jnp.all(kc == rc) & (kn == rn))

    reduce_ok = _reduce_check(shi, slo, w)
    results["reduce"] = "PASS" if bool(reduce_ok) else "FAIL"

    results["verify_seconds"] = round(time.time() - t0, 1)
    results["verify_n"] = n
    return results
