"""Per-round cost of the sort kernel's compare-exchange classes on chip.

Times R repeated compare-exchange rounds inside one VMEM-resident Pallas
kernel (load once, R rounds through registers, store once), for:
  - lane rolls (axis=1, strides 1/64 — the cross-lane permute path)
  - sublane rolls (axis=0, strides 1/64 — the row path)
  - reshape-select row pairs (rowsel-s: the [g, 2, s, 128] view the sort
    kernel uses for tile-aligned row strides)
  - a no-roll ALU round (same lex compare + selects on unshifted data)

The difference divided by R is the marginal ns/elt/round of each class:
the denominators of the sort-kernel roofline (docs/PERFORMANCE.md).
One TPU process at a time.  Prints one JSON line.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from kat_tpu.ops.sort_kernel import LANES, _cmpx_roll, _lex_less  # noqa: E402

SMALL = bool(os.environ.get("KAT_TPU_ROLL_SMALL"))  # CPU interpret smoke
BR = 128 if SMALL else 512
N = (1 << 15) if SMALL else (1 << 24)
R = 4 if SMALL else 512


def _kernel(mode, h_ref, l_ref, oh_ref, ol_ref):
    h = h_ref[...]
    lo = l_ref[...]
    dmi = ((jax.lax.broadcasted_iota(jnp.int32, (BR, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (BR, LANES), 1)) >> 3) & 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (BR, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (BR, LANES), 0)

    def body(_, planes):
        if mode == "copy":
            # I/O + loop skeleton only: the dispatch/DMA floor
            return (planes[0] + 1, planes[1] + 1)
        if mode == "alu":
            # same comparator arithmetic, no data movement
            d = _lex_less((planes[1], planes[0]), planes)
            di = jnp.where(d, jnp.int32(1), jnp.int32(0)) ^ dmi
            take = (di != 0)
            return tuple(jnp.where(take, b, a)
                         for a, b in zip(planes, planes[::-1]))
        s = int(mode.split("-")[1])
        if mode.startswith("rowsel"):
            # reshape-select row-stride round: pair rows at stride s via
            # a [BR/(2s), 2, s, LANES] view — no rolls, compare on half
            # the elements (the merge kernel's block-pair formulation at
            # sub-block granularity)
            sh = [p.reshape(BR // (2 * s), 2, s, LANES) for p in planes]
            top = [p[:, 0] for p in sh]
            bot = [p[:, 1] for p in sh]
            d = _lex_less(bot, top)
            dm = (dmi.reshape(BR // (2 * s), 2, s, LANES)[:, 0]) != 0
            swap = d ^ dm
            out = []
            for t, b in zip(top, bot):
                lo_v = jnp.where(swap, b, t)
                hi_v = jnp.where(swap, t, b)
                out.append(jnp.stack([lo_v, hi_v], axis=1)
                           .reshape(BR, LANES))
            return tuple(out)
        axis = 1 if mode.startswith("lane") else 0
        idx = lane if axis == 1 else row
        size = LANES if axis == 1 else BR
        return tuple(_cmpx_roll(list(planes), s, axis, size, idx, 2,
                                dmi, BR))

    h, lo = jax.lax.fori_loop(0, R, body, (h, lo))
    oh_ref[...] = h
    ol_ref[...] = lo


def timed(fn, *args):
    out = fn(*args)
    _ = np.asarray(out[0][:1, :1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(out[0][:1, :1])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.integers(0, 1 << 32, size=(N // LANES, LANES),
                                 dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 1 << 32, size=(N // LANES, LANES),
                                  dtype=np.uint32))
    res = {"n": N, "rounds": R}

    def make(mode):
        return jax.jit(pl.pallas_call(
            functools.partial(_kernel, mode),
            grid=(N // (BR * LANES),),
            in_specs=[pl.BlockSpec((BR, LANES), lambda i: (i, 0))] * 2,
            out_specs=[pl.BlockSpec((BR, LANES), lambda i: (i, 0))] * 2,
            out_shape=[jax.ShapeDtypeStruct((N // LANES, LANES),
                                            jnp.uint32)] * 2,
            interpret=SMALL,
        ))

    with jax.enable_x64(False):  # x64 loop carries don't lower in Mosaic
        floor = timed(make("copy"), h, lo)
        res["floor_ms"] = round(floor * 1e3, 2)
        modes = ["alu", "lane-1", "lane-64", "row-1", "row-64"]
        modes += [f"rowsel-{s}" for s in (1, 16, 64, 256) if 2 * s <= BR]
        for mode in modes:
            t = timed(make(mode), h, lo)
            res[f"{mode}_round_ns_per_elt"] = round(
                (t - floor) / R / N * 1e9, 5)
            res[f"{mode}_ms"] = round(t * 1e3, 1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
