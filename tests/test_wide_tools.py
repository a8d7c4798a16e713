"""End-to-end tool runs at k > 31 (wide-key engine) against the oracle."""

import random
from collections import Counter

import numpy as np
import pytest

import oracle
from kat_tpu import cli
from kat_tpu.io import jellyfish
from kat_tpu.tools.comp import Comp
from kat_tpu.tools.sect import Sect

K = 33


def _write_fasta(path, named):
    with open(path, "w") as f:
        for name, s in named:
            f.write(f">{name}\n{s}\n")


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("wide")
    rng = random.Random(31)
    reads = ["".join(rng.choice("ACGT") for _ in range(80))
             for _ in range(25)]
    reads2 = reads[:10] + ["".join(rng.choice("ACGT") for _ in range(80))
                           for _ in range(10)]
    r1 = tmp / "r1.fa"
    r2 = tmp / "r2.fa"
    _write_fasta(r1, [(f"a{i}", s) for i, s in enumerate(reads)])
    _write_fasta(r2, [(f"b{i}", s) for i, s in enumerate(reads2)])
    return tmp, reads, reads2, str(r1), str(r2)


def test_wide_hist_cli(data):
    tmp, reads, _r2, r1, _ = data
    out = tmp / "w.hist"
    rc = cli.main(["hist", "-m", str(K), "-H", "4096", "-o", str(out), r1])
    assert rc == 0
    hc = oracle.count_seqs(reads, K)
    freq = Counter(hc.values())
    got = {}
    for ln in open(out):
        if not ln.startswith("#"):
            col, v = ln.split(" ")
            if int(v):
                got[int(col)] = int(v)
    assert got == dict(freq)


def test_wide_hist_dump_roundtrip(data, monkeypatch):
    tmp, reads, _r2, r1, _ = data
    monkeypatch.chdir(tmp)
    out = tmp / "wd.hist"
    rc = cli.main(["hist", "-m", str(K), "-H", "4096", "-d",
                   "-o", str(out), r1])
    assert rc == 0
    hdr, keys, counts = jellyfish.read_jf(str(tmp / f"wd.hist-hash.jf{K}"))
    assert hdr.mer_len == K
    want = oracle.count_seqs(reads, K)
    assert dict(zip(keys, counts.tolist())) == dict(want)


def test_wide_hist_load_from_jf(data):
    tmp, reads, _r2, r1, _ = data
    jf = str(tmp / f"wd.hist-hash.jf{K}")
    out = tmp / "wl.hist"
    rc = cli.main(["hist", "-o", str(out), jf])
    assert rc == 0
    hc = oracle.count_seqs(reads, K)
    freq = Counter(hc.values())
    got = {int(c): int(v) for c, v in
           (ln.split(" ") for ln in open(out) if not ln.startswith("#"))
           if int(v)}
    assert got == dict(freq)


def test_wide_comp(data):
    tmp, reads, reads2, r1, r2 = data
    c = Comp([r1], [r2])
    c.quiet = True
    c.set_mer_len(K)
    for inp in c.inputs:
        inp.hash_size = 4096
    c.d1_bins = 51
    c.d2_bins = 51
    c.output_prefix = str(tmp / "wc")
    c.execute()
    h1 = oracle.count_seqs(reads, K)
    h2 = oracle.count_seqs(reads2, K)
    shared = sum(1 for kk in h1 if kk in h2)
    assert c.counters["hash1_distinct"] == len(h1)
    assert c.counters["hash2_distinct"] == len(h2)
    assert c.counters["shared_distinct"] == shared
    assert c.counters["hash1_total"] == sum(h1.values())


def test_wide_sect(data):
    tmp, reads, _r2, r1, _ = data
    target = tmp / "t.fa"
    _write_fasta(target, [("c1", reads[0] + reads[1])])
    s = Sect([r1], str(target))
    s.quiet = True
    s.input.mer_len = K
    s.input.hash_size = 4096
    s.output_prefix = str(tmp / "ws")
    s.execute()
    hc = oracle.count_seqs(reads, K)
    seq = reads[0] + reads[1]
    want = []
    for i in range(len(seq) - K + 1):
        v = oracle.pack(seq[i:i + K])
        want.append(hc.get(min(v, oracle.revcomp(v, K)), 0))
    got_line = open(str(tmp / "ws-counts.cvg")).read().splitlines()[1]
    assert [int(x) for x in got_line.split(" ")] == want
