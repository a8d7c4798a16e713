"""Standalone on-chip kernel attestation (~60s warm).

Checks the three Pallas flush kernels bit-identical against their XLA
reference formulations at 2^22 on the real device and prints one JSON
line.  `bench.py` runs the same checks automatically before the headline
measurement; this script exists for ad-hoc / driver capture.

Usage: python benchmarks/verify_kernels_tpu.py [n_log2]
"""

import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 22)
    from kat_tpu.ops.verify import verify_kernels

    print(json.dumps(verify_kernels(n=n)), flush=True)


if __name__ == "__main__":
    main()
