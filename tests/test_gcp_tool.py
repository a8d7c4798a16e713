"""`kat gcp` parity tests against the pure-Python oracle, including the
GC==k row-drop quirk (reference src/gcp.cc:93 + sparse_matrix.hpp:251-279,
SURVEY §5.1.3)."""

import io
import math
import random

import numpy as np
import pytest

import oracle
from kat_tpu.tools.gcp import Gcp


def _write_fasta(path, seqs):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">seq{i}\n{s}\n")


def _oracle_gcp(seqs, k, cvg_bins, cvg_scale=1.0):
    counts = oracle.count_seqs(seqs, k)
    mx = np.zeros((k + 1, cvg_bins + 1), np.uint64)
    for kmer, c in counts.items():
        gc = oracle.gc_of_packed(kmer, k)
        cvg = 0 if c == 0 else math.ceil(c * cvg_scale)
        mx[gc, min(cvg, cvg_bins)] += 1
    return mx


@pytest.fixture
def seqs():
    rng = random.Random(42)
    out = []
    for _ in range(40):
        n = rng.randint(20, 80)
        out.append("".join(rng.choice("ACGTN" if rng.random() < 0.1
                                      else "ACGT") for _ in range(n)))
    # Force some GC == k k-mers (all-GC sequence) to exercise the quirk row.
    out.append("GCGCGCGCGCGCGCGCGCGCGC")
    out.append("CCCCCCCCCCCCCCCCCCCC")
    return out


def _run_gcp(tmp_path, seqs, k, cvg_bins=50, cvg_scale=1.0):
    fa = tmp_path / "in.fa"
    _write_fasta(fa, seqs)
    g = Gcp([str(fa)])
    g.quiet = True
    g.cvg_bins = cvg_bins
    g.cvg_scale = cvg_scale
    g.input.mer_len = k
    g.input.hash_size = 4096
    g.output_prefix = str(tmp_path / "out")
    g.execute()
    return g


@pytest.mark.parametrize("k", [7, 11])
def test_gcp_matrix_matches_oracle(tmp_path, seqs, k):
    g = _run_gcp(tmp_path, seqs, k)
    want = _oracle_gcp(seqs, k, 50)
    got = g.matrix.data
    np.testing.assert_array_equal(got, want)
    # Printed form drops the GC == k row.
    buf = io.StringIO()
    g.print_main_matrix(buf)
    body = [ln for ln in buf.getvalue().splitlines()
            if ln and not ln.startswith("#")]
    assert len(body) == k
    printed = np.array([[int(v) for v in ln.split(" ")] for ln in body],
                       np.uint64)
    np.testing.assert_array_equal(printed, want[:k])
    # MaxVal excludes the dropped row (sparse_matrix.hpp:162-173).
    assert g.matrix.get_max_val() == int(want[:k].max())


def test_gcp_scale_and_clamp(tmp_path, seqs):
    k = 7
    g = _run_gcp(tmp_path, seqs, k, cvg_bins=3, cvg_scale=0.5)
    want = _oracle_gcp(seqs, k, 3, 0.5)
    np.testing.assert_array_equal(g.matrix.data, want)


def test_gcp_header_fields(tmp_path, seqs):
    g = _run_gcp(tmp_path, seqs, 7)
    g.save()
    text = open(str(g.output_prefix) + ".mx").read()
    assert "# Columns:51" in text
    assert "# Rows:7" in text
    assert "# Transpose:0" in text
    assert "# Kmer value:7" in text
