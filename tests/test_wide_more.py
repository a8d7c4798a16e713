"""Additional wide-key (k>31) coverage: gcp, filter kmer, comp all-load
mer-length inference, `python -m kat_tpu` entry."""

import math
import random
import subprocess
import sys
from collections import Counter

import numpy as np
import pytest

import oracle
from kat_tpu.io import jellyfish
from kat_tpu.tools.comp import Comp
from kat_tpu.tools.filter_kmer import FilterKmer
from kat_tpu.tools.gcp import Gcp

K = 35


def _write_fasta(path, named):
    with open(path, "w") as f:
        for name, s in named:
            f.write(f">{name}\n{s}\n")


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("widemore")
    rng = random.Random(55)
    reads = ["".join(rng.choice("ACGT") for _ in range(90))
             for _ in range(20)]
    fa = tmp / "r.fa"
    _write_fasta(fa, [(f"r{i}", s) for i, s in enumerate(reads)])
    return tmp, reads, str(fa)


def test_wide_gcp(data):
    tmp, reads, fa = data
    g = Gcp([fa])
    g.quiet = True
    g.cvg_bins = 20
    g.input.mer_len = K
    g.input.hash_size = 4096
    g.output_prefix = str(tmp / "wg")
    g.execute()
    hc = oracle.count_seqs(reads, K)
    want = np.zeros((K + 1, 21), np.uint64)
    for kk, c in hc.items():
        want[oracle.gc_of_packed(kk, K), min(math.ceil(c), 20)] += 1
    np.testing.assert_array_equal(g.matrix.data, want)


def test_wide_filter_kmer(data):
    tmp, reads, fa = data
    f = FilterKmer([fa])
    f.quiet = True
    f.output_prefix = str(tmp / "wf")
    f.input.mer_len = K
    f.input.hash_size = 4096
    f.low_count = 1
    f.high_count = 10000
    f.low_gc = 10
    f.high_gc = 25
    f.execute()
    hc = oracle.count_seqs(reads, K)
    want = {kk: c for kk, c in hc.items()
            if 10 <= oracle.gc_of_packed(kk, K) <= 25}
    _hdr, keys, counts = jellyfish.read_jf(str(tmp / f"wf-in.jf{K}"))
    assert dict(zip(keys, counts.tolist())) == want


def test_comp_all_load_infers_k(data, tmp_path):
    """When every input is a .jf, comp takes k from the first header
    (comp.cc:158-160)."""
    tmp, reads, fa = data
    hc1 = oracle.count_seqs(reads[:10], 21)
    hc2 = oracle.count_seqs(reads[5:], 21)
    j1 = tmp_path / "a.jf"
    j2 = tmp_path / "b.jf"
    for j, hc in ((j1, hc1), (j2, hc2)):
        keys = np.fromiter(hc.keys(), np.uint64, len(hc))
        counts = np.fromiter(hc.values(), np.uint32, len(hc))
        jellyfish.write_jf(str(j), keys, counts, 21, True)
    c = Comp([str(j1)], [str(j2)])
    c.quiet = True
    c.d1_bins = c.d2_bins = 31
    c.output_prefix = str(tmp_path / "cl")
    c.execute()
    assert c.mer_len == 21
    assert c.counters["hash1_distinct"] == len(hc1)
    assert c.counters["hash2_distinct"] == len(hc2)
    shared = sum(1 for kk in hc1 if kk in hc2)
    assert c.counters["shared_distinct"] == shared


def test_python_dash_m_entry():
    out = subprocess.run(
        [sys.executable, "-m", "kat_tpu", "--version"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert out.returncode == 0
    assert "kat" in out.stdout
