"""Time the Pallas bitonic full sort vs lax.sort on the TPU.

Prints a noop dispatch floor first (healthy ~29ms; if it is way above
that the tunnel is wedged and nothing below is trustworthy), verifies the
kernel's output against lax.sort at the first size, then times both.

Usage: python benchmarks/profile_sort_kernel.py [n_log2 ...] [--br N]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from kat_tpu.ops.sort_kernel import bitonic_sort_planes  # noqa: E402


def timed(fn, args, label, n, reps=3):
    """fn must return small/sliced outputs: fetching a full result array
    over the dev tunnel costs SECONDS at 64MB and silently dominates the
    timing (the 'degraded pool' saga — sync via an 8-element slice)."""
    t0 = time.time()
    out = fn(*args)
    _ = int(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    tc = time.time() - t0
    ts = []
    for _i in range(reps):
        t0 = time.time()
        out = fn(*args)
        _ = int(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.time() - t0)
    t = min(ts)
    print(f"{label:28s} {t*1e3:8.1f}ms  {t/n*1e9:6.3f} ns/elt"
          f"   (compile+first {tc:.0f}s)", flush=True)
    return out, t


def main():
    argv = sys.argv[1:]
    br = 4096
    if "--br" in argv:
        i = argv.index("--br")
        br = int(argv[i + 1])
        del argv[i:i + 2]
    lgs = [int(a) for a in argv if not a.startswith("--")] or [24, 26]

    rng = np.random.default_rng(0)
    nmax = 1 << max(lgs)
    hi_h = rng.integers(0, 1 << 22, nmax, dtype=np.uint32)
    lo_h = rng.integers(0, 1 << 32, nmax, dtype=np.uint32)
    hi = jax.device_put(jnp.asarray(hi_h))
    lo = jax.device_put(jnp.asarray(lo_h))

    noop = jax.jit(lambda a: a[:8] + 1)
    _, tn = timed(noop, (hi,), "dispatch floor (noop)", 1)
    if tn > 0.1:
        print("!! dispatch floor >100ms: tunnel degraded, aborting")
        return

    first = True
    for lg in lgs:
        n = 1 << lg
        # timing variants return an 8-elt slice (cheap tunnel sync);
        # equality is checked on-device, fetched as one scalar
        ks = jax.jit(lambda a, b, n=n: bitonic_sort_planes(
            (a[:n], b[:n]), 2, block_rows=br)[0][-8:])
        _, _ = timed(ks, (hi, lo), f"kernel sort 2^{lg} br={br}", n)
        if first:
            @jax.jit
            def check(a, b, n=n):
                ko = bitonic_sort_planes((a[:n], b[:n]), 2, block_rows=br)
                ro = jax.lax.sort((a[:n], b[:n]), num_keys=2)
                eq = jnp.all(ko[0] == ro[0]) & jnp.all(ko[1] == ro[1])
                return eq[None]
            ok = bool(np.asarray(check(hi, lo))[0])
            print(f"  correctness vs lax.sort: {'OK' if ok else 'FAIL'}",
                  flush=True)
            if not ok:
                return
            first = False
        ls = jax.jit(lambda a, b, n=n: jax.lax.sort(
            (a[:n], b[:n]), num_keys=2)[0][-8:])
        timed(ls, (hi, lo), f"lax.sort 2-op 2^{lg}", n)


if __name__ == "__main__":
    main()
