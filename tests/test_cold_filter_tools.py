"""Parity tests for `kat cold`, `kat filter kmer`, `kat filter seq` against
the pure-Python oracle."""

import random

import numpy as np
import pytest

import oracle
from kat_tpu.io import jellyfish
from kat_tpu.tools.cold import Cold
from kat_tpu.tools.filter_kmer import FilterKmer
from kat_tpu.tools.filter_seq import FilterSeq


def _write_fasta(path, named):
    with open(path, "w") as f:
        for name, s in named:
            f.write(f">{name}\n{s}\n")


def _write_fastq(path, named):
    with open(path, "w") as f:
        for name, s in named:
            f.write(f"@{name}\n{s}\n+\n{'I' * len(s)}\n")


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cf")
    rng = random.Random(5)
    reads = ["".join(rng.choice("ACGT") for _ in range(50))
             for _ in range(30)]
    asm = [("c1", reads[0] + reads[1]), ("c2", reads[5][:40]),
           ("junk", "".join(rng.choice("ACGT") for _ in range(80)))]
    reads_fa = tmp / "reads.fa"
    asm_fa = tmp / "asm.fa"
    _write_fasta(reads_fa, [(f"r{i}", s) for i, s in enumerate(reads)])
    _write_fasta(asm_fa, asm)
    return tmp, reads, asm, str(reads_fa), str(asm_fa)


def test_cold_stats(data):
    tmp, reads, asm, reads_fa, asm_fa = data
    k = 11
    c = Cold([reads_fa], asm_fa)
    c.quiet = True
    c.output_prefix = str(tmp / "cold")
    c.reads.mer_len = k
    c.assembly.mer_len = k
    c.reads.hash_size = 4096
    c.assembly.hash_size = 4096
    c.execute()

    rh = oracle.count_seqs(reads, k)
    ah = oracle.count_seqs([s for _, s in asm], k)
    lines = open(str(tmp / "cold-stats.tsv")).read().splitlines()
    assert lines[0].startswith("seq_name\tread_median_cvg")
    for (name, seq), ln in zip(asm, lines[1:]):
        cols = ln.split("\t")
        assert cols[0] == name
        nb = len(seq) - k + 1
        rc, ac = [], []
        for i in range(nb):
            v = oracle.pack(seq[i:i + k])
            if v is None:
                rc.append(0)
                ac.append(0)
            else:
                q = min(v, oracle.revcomp(v, k))
                rc.append(rh.get(q, 0))
                ac.append(ah.get(q, 0))
        assert int(cols[1]) == sorted(rc)[len(rc) // 2]
        assert abs(float(cols[2]) - sum(rc) / nb) < 1e-4
        assert int(cols[3]) == sorted(ac)[len(ac) // 2]


def test_filter_kmer(data):
    tmp, reads, asm, reads_fa, asm_fa = data
    k = 11
    f = FilterKmer([reads_fa])
    f.quiet = True
    f.output_prefix = str(tmp / "fk")
    f.input.mer_len = k
    f.input.hash_size = 4096
    f.low_count = 1
    f.high_count = 1
    f.low_gc = 3
    f.high_gc = 8
    f.separate = True
    f.execute()

    hc = oracle.count_seqs(reads, k)
    want_in = {kk: c for kk, c in hc.items()
               if c == 1 and 3 <= oracle.gc_of_packed(kk, k) <= 8}
    _, keys_in, counts_in = jellyfish.read_jf(str(tmp / f"fk-in.jf{k}"))
    got_in = dict(zip(keys_in.tolist(), counts_in.tolist()))
    assert got_in == want_in
    _, keys_out, counts_out = jellyfish.read_jf(str(tmp / f"fk-out.jf{k}"))
    got_out = dict(zip(keys_out.tolist(), counts_out.tolist()))
    want_out = {kk: c for kk, c in hc.items() if kk not in want_in}
    assert got_out == want_out
    assert f.counters["all"] == (len(hc), sum(hc.values()))
    assert f.counters["in"] == (len(want_in), sum(want_in.values()))


def test_filter_kmer_invert(data):
    tmp, reads, asm, reads_fa, asm_fa = data
    k = 11
    f = FilterKmer([reads_fa])
    f.quiet = True
    f.output_prefix = str(tmp / "fki")
    f.input.mer_len = k
    f.input.hash_size = 4096
    f.low_count = 2
    f.high_count = 10000
    f.low_gc = 0
    f.high_gc = k
    f.invert = True
    f.execute()
    hc = oracle.count_seqs(reads, k)
    want = {kk: c for kk, c in hc.items() if not (2 <= c <= 10000)}
    _, keys, counts = jellyfish.read_jf(str(tmp / f"fki-in.jf{k}"))
    assert dict(zip(keys.tolist(), counts.tolist())) == want


def test_filter_seq(data, tmp_path):
    tmp, reads, asm, reads_fa, asm_fa = data
    k = 11
    # target: sequences from reads (high hit ratio) + novel (low ratio)
    rng = random.Random(9)
    novel = ["".join(rng.choice("ACGT") for _ in range(40))
             for _ in range(5)]
    named = ([(f"hit{i}", reads[i]) for i in range(5)]
             + [(f"miss{i}", s) for i, s in enumerate(novel)])
    target = tmp_path / "target.fastq"
    _write_fastq(target, named)

    f = FilterSeq(str(target), None, [reads_fa])
    f.quiet = True
    f.output_prefix = str(tmp_path / "fs")
    f.input.mer_len = k
    f.input.hash_size = 4096
    f.threshold = 0.9
    f.separate = True
    f.do_stats = True
    f.execute()

    kept = open(str(tmp_path / "fs.in.fastq")).read()
    dropped = open(str(tmp_path / "fs.out.fastq")).read()
    for i in range(5):
        assert f"@hit{i}\n" in kept
        assert f"@hit{i}\n" not in dropped
    # novel sequences could share the odd k-mer by chance but not 90%
    for i in range(5):
        assert f"@miss{i}\n" in dropped
    assert f.keepers == 5
    assert f.total == 10

    stats = open(str(tmp_path / "fs.stats")).read().splitlines()
    assert stats[0] == "index\tnb_bases\tnb_kmers\tnb_hits\tratio"
    hc = oracle.count_seqs(reads, k)
    cols = stats[1].split("\t")
    seq = named[0][1]
    nb = len(seq) - k + 1
    hits = sum(1 for i in range(nb)
               if (lambda v: v is not None and
                   min(v, oracle.revcomp(v, k)) in hc)(
                       oracle.pack(seq[i:i + k])))
    assert cols[1] == str(len(seq))
    assert cols[2] == str(nb)
    assert cols[3] == str(hits)
