"""Standalone on-chip kernel attestation (~60s warm).

Checks the three Pallas flush kernels bit-identical against their XLA
reference formulations at 2^22 on the real device and prints one JSON
line.  `bench.py` runs the same checks automatically before the headline
measurement; this script exists for ad-hoc / driver capture.

Usage: python benchmarks/verify_kernels_tpu.py [n_log2] [--wide W ...]
  --wide 4 8 16  also attest the wide-key path at those plane counts
                 (k=63/127/255) at n/2 each
"""

import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    argv = sys.argv[1:]
    wide = []
    if "--wide" in argv:
        i = argv.index("--wide")
        wide = [int(a) for a in argv[i + 1:]]
        argv = argv[:i]
    n = 1 << (int(argv[0]) if argv else 22)
    from kat_tpu.ops.verify import verify_kernels, verify_kernels_wide

    out = verify_kernels(n=n)
    for nw in wide:
        out[f"wide_{nw}w"] = verify_kernels_wide(n_words=nw, n=n // 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
