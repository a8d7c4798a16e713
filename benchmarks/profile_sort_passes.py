"""Bisect the bitonic sort kernel's cost by pass class on the TPU.

Times (dispatch-subtracted, scalar-slice sync):
  - the mega window pass (build + local phases) alone
  - a single cross-stage pass
  - a single window tail pass (one phase's last strides + tails)
  - DMA-only window round-trip (ps_lo > ps_hi: loops degenerate, the
    pass just loads and stores every block) — the pure pipe cost

Usage: python benchmarks/profile_sort_passes.py [n_log2] [--br N]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from kat_tpu.ops import sort_kernel as sk  # noqa: E402


def timed(fn, args, label, n, floor):
    out = fn(*args)
    _ = int(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ts = []
    for _i in range(3):
        t0 = time.time()
        out = fn(*args)
        _ = int(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.time() - t0)
    t = min(ts) - floor
    print(f"{label:34s} {t*1e3:8.1f}ms  {t/n*1e9:6.3f} ns/elt",
          flush=True)


def main():
    argv = sys.argv[1:]
    br = 512
    if "--br" in argv:
        i = argv.index("--br")
        br = int(argv[i + 1])
        del argv[i:i + 2]
    lg = int(argv[0]) if argv else 24
    n = 1 << lg
    bs = br * 128
    nb = n // bs
    bB = int(np.log2(bs))
    pP = lg

    rng = np.random.default_rng(0)
    hi = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 22, n, dtype=np.uint32)))
    lo = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 32, n, dtype=np.uint32)))

    noop = jax.jit(lambda a: a[:8] + 1)
    _ = int(np.asarray(noop(hi))[0])
    ts = []
    for _i in range(3):
        t0 = time.time()
        _ = int(np.asarray(noop(hi))[0])
        ts.append(time.time() - t0)
    floor = min(ts)
    print(f"dispatch floor {floor*1e3:.1f}ms  n=2^{lg} br={br} nb={nb}",
          flush=True)

    n_planes = 2
    W = sk._pick_window(n_planes, br, nb)
    mW = int(np.log2(W))
    window = functools.partial(
        sk._window_kernel, n_planes=n_planes, n_key_words=2, br=br, W=W)
    cross = functools.partial(
        sk._cross_kernel, n_planes=n_planes, n_key_words=2, br=br)

    def wcall(a, b, do_build, ps_lo, ps_hi):
        scal = jnp.array([[do_build, ps_lo, ps_hi]], jnp.int32)
        arrs = [a.reshape(-1, 128), b.reshape(-1, 128)]
        with jax.enable_x64(False):
            outs = sk._inplace_call(
                window, (nb // W,), n_planes, n, br,
                (n_planes, W * br, 128), False, n_scalars=1)(*arrs, scal)
        return outs[0].reshape(-1)[-8:]

    def ccall(a, b, ps, sb):
        scal = jnp.array([[ps, sb]], jnp.int32)
        arrs = [a.reshape(-1, 128), b.reshape(-1, 128)]
        with jax.enable_x64(False):
            outs = sk._inplace_call(
                cross, (nb // 2,), n_planes, n, br,
                (n_planes, 2, br, 128), False, n_scalars=1)(*arrs, scal)
        return outs[0].reshape(-1)[-8:]

    timed(jax.jit(functools.partial(wcall, do_build=0, ps_lo=2,
                                    ps_hi=1)),
          (hi, lo), "window DMA-only (no phases)", n, floor)
    timed(jax.jit(functools.partial(wcall, do_build=1, ps_lo=2,
                                    ps_hi=1)),
          (hi, lo), "window build-only", n, floor)
    timed(jax.jit(functools.partial(wcall, do_build=1, ps_lo=1,
                                    ps_hi=mW)),
          (hi, lo), f"window build+local (ps 1..{mW})", n, floor)
    timed(jax.jit(functools.partial(wcall, do_build=0, ps_lo=mW,
                                    ps_hi=mW)),
          (hi, lo), f"window tail (ps={mW})", n, floor)
    ps = pP - bB
    timed(jax.jit(functools.partial(ccall, ps=ps, sb=nb // 2)),
          (hi, lo), f"one cross pass (ps={ps})", n, floor)


if __name__ == "__main__":
    main()
