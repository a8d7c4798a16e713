"""Bisect the sort-kernel compile failure: compile/run ONLY the phase
kernels (static merge-style code) on pre-sorted alternating runs, skipping
the dynamic-roll local kernel suspected of killing the Mosaic compiler.

Usage: python benchmarks/profile_phase_kernel.py [n_log2] [--br N]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from kat_tpu.ops import sort_kernel as sk  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    lg = int(args[0]) if args else 24
    br = 4096
    if "--br" in sys.argv:
        br = int(sys.argv[sys.argv.index("--br") + 1])
    n = 1 << lg
    bs = br * 128
    nb = n // bs
    bB = int(np.log2(bs))

    rng = np.random.default_rng(0)
    hi = rng.integers(0, 1 << 22, n, dtype=np.uint32)
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    k64 = (hi.astype(np.uint64) << np.uint64(32)) | lo
    # alternating asc/desc sorted runs of bs (what the local kernel emits)
    runs = k64.reshape(nb, bs)
    runs = np.sort(runs, axis=1)
    runs[1::2] = runs[1::2, ::-1]
    rh = jax.device_put(jnp.asarray((runs >> np.uint64(32)).astype(
        np.uint32).reshape(-1)))
    rl = jax.device_put(jnp.asarray((runs & np.uint64(0xFFFFFFFF)).astype(
        np.uint32).reshape(-1)))

    noop = jax.jit(lambda a: a[:8] + 1)
    t0 = time.time()
    _ = int(np.asarray(noop(rh))[0])
    print(f"noop compile+first {time.time()-t0:.0f}s", flush=True)
    ts = []
    for _i in range(3):
        t0 = time.time()
        _ = int(np.asarray(noop(rh))[0])
        ts.append(time.time() - t0)
    print(f"dispatch floor {min(ts)*1e3:.1f}ms", flush=True)

    @jax.jit
    def phases(a, b):
        arrs = [a.reshape(-1, 128), b.reshape(-1, 128)]
        with jax.enable_x64(False):
            for p in range(bB + 1, lg + 1):
                ps = p - bB
                kern = functools.partial(
                    sk._phase_kernel, n_planes=2, n_key_words=2, br=br,
                    nb=nb, ps=ps)
                outs = sk._inplace_call(kern, (ps + 1, nb // 2), 2, n, br,
                                        True, False)(*arrs)
                arrs = list(outs[:2])
        return tuple(x.reshape(-1) for x in arrs)

    t0 = time.time()
    out = phases(rh, rl)
    _ = int(np.asarray(out[0])[0])
    print(f"phases compile+first {time.time()-t0:.0f}s", flush=True)

    oh = np.asarray(out[0])
    ol = np.asarray(out[1])
    ref = np.sort(k64)
    ok = (np.array_equal(oh, (ref >> np.uint64(32)).astype(np.uint32))
          and np.array_equal(ol, (ref & np.uint64(0xFFFFFFFF)).astype(
              np.uint32)))
    print(f"correctness: {'OK' if ok else 'FAIL'}", flush=True)

    ts = []
    for _i in range(3):
        t0 = time.time()
        out = phases(rh, rl)
        _ = int(np.asarray(out[0])[0])
        ts.append(time.time() - t0)
    t = min(ts)
    print(f"phases({bB+1}..{lg}) n=2^{lg} br={br}: {t*1e3:.1f}ms "
          f"{t/n*1e9:.3f} ns/elt", flush=True)


if __name__ == "__main__":
    main()
