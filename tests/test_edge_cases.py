"""Paired filter-seq, three-input comp parity, and error-path robustness."""

import math
import random

import numpy as np
import pytest

import oracle
from kat_tpu.tools.comp import Comp
from kat_tpu.tools.common import Input, glob_files
from kat_tpu.tools.filter_seq import FilterSeq
from kat_tpu.tools.hist import Histogram


def _write_fasta(path, named):
    with open(path, "w") as f:
        for name, s in named:
            f.write(f">{name}\n{s}\n")


def _write_fastq(path, named):
    with open(path, "w") as f:
        for name, s in named:
            f.write(f"@{name}\n{s}\n+\n{'I' * len(s)}\n")


@pytest.fixture(scope="module")
def base(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("edge")
    rng = random.Random(17)
    reads = ["".join(rng.choice("ACGT") for _ in range(60))
             for _ in range(30)]
    db = tmp / "db.fa"
    _write_fasta(db, [(f"r{i}", s) for i, s in enumerate(reads)])
    return tmp, reads, str(db)


def test_filter_seq_paired(base, tmp_path):
    tmp, reads, db = base
    rng = random.Random(2)
    novel = ["".join(rng.choice("ACGT") for _ in range(50))
             for _ in range(4)]
    # pair i keeps/drops as a unit based on the COMBINED profile
    r1 = [("p0", reads[0]), ("p1", novel[0]), ("p2", reads[2])]
    r2 = [("p0", reads[1]), ("p1", novel[1]), ("p2", novel[2])]
    f1 = tmp_path / "R1.fastq"
    f2 = tmp_path / "R2.fastq"
    _write_fastq(f1, r1)
    _write_fastq(f2, r2)

    f = FilterSeq(str(f1), str(f2), [db])
    f.quiet = True
    f.output_prefix = str(tmp_path / "pf")
    f.input.mer_len = 11
    f.input.hash_size = 4096
    f.threshold = 0.6
    f.separate = True
    f.do_stats = True
    f.execute()

    hc = oracle.count_seqs(reads, 11)

    def ratio(seqs):
        m = t = 0
        for s in seqs:
            for i in range(len(s) - 10):
                v = oracle.pack(s[i:i + 11])
                t += 1
                if v is not None and min(v, oracle.revcomp(v, 11)) in hc:
                    m += 1
        return m / t

    keep0 = ratio([r1[0][1], r2[0][1]]) >= 0.6   # both known -> keep
    keep1 = ratio([r1[1][1], r2[1][1]]) >= 0.6   # both novel -> drop
    keep2 = ratio([r1[2][1], r2[2][1]]) >= 0.6   # mixed
    in1 = open(str(tmp_path / "pf.in.R1.fastq")).read()
    in2 = open(str(tmp_path / "pf.in.R2.fastq")).read()
    out1 = open(str(tmp_path / "pf.out.R1.fastq")).read()
    for name, want_kept in (("p0", keep0), ("p1", keep1), ("p2", keep2)):
        assert (f"@{name}\n" in in1) == want_kept
        assert (f"@{name}\n" in in2) == want_kept
        assert (f"@{name}\n" in out1) == (not want_kept)
    assert keep0 and not keep1  # sanity of the construction


def test_filter_seq_length_mismatch(base, tmp_path):
    tmp, reads, db = base
    f1 = tmp_path / "a.fastq"
    f2 = tmp_path / "b.fastq"
    _write_fastq(f1, [("x", reads[0]), ("y", reads[1])])
    _write_fastq(f2, [("x", reads[0])])
    f = FilterSeq(str(f1), str(f2), [db])
    f.quiet = True
    f.output_prefix = str(tmp_path / "mm")
    f.input.mer_len = 11
    f.input.hash_size = 4096
    with pytest.raises(ValueError, match="longer than"):
        f.execute()


def test_comp_three_input_matrices(base, tmp_path):
    tmp, reads, db = base
    rng = random.Random(5)
    set1 = reads
    set2 = reads[:15] + ["".join(rng.choice("ACGT") for _ in range(60))
                         for _ in range(10)]
    set3 = reads[5:20]
    f2 = tmp_path / "s2.fa"
    f3 = tmp_path / "s3.fa"
    _write_fasta(f2, [(f"b{i}", s) for i, s in enumerate(set2)])
    _write_fasta(f3, [(f"c{i}", s) for i, s in enumerate(set3)])

    k = 11
    c = Comp([db], [str(f2)])
    c.set_third_input([str(f3)])
    c.quiet = True
    c.set_mer_len(k)
    for inp in c.inputs:
        inp.hash_size = 4096
    c.d1_bins = 31
    c.d2_bins = 31
    c.output_prefix = str(tmp_path / "c3")
    c.execute()

    h1 = oracle.count_seqs(set1, k)
    h2 = oracle.count_seqs(set2, k)
    h3 = oracle.count_seqs(set3, k)

    def sc(v, bins=31):
        s = 0 if v == 0 else math.ceil(v)
        return min(s, bins - 1)

    ends = np.zeros((31, 31), np.uint64)
    mixed = np.zeros((31, 31), np.uint64)
    middle = np.zeros((31, 31), np.uint64)
    for key, v1 in h1.items():
        v2 = h2.get(key, 0)
        v3 = h3.get(key, 0)
        s1, s2, s3 = sc(v1), sc(v2), sc(v3)
        if s2 == s3:
            ends[s1, s3] += 1
        elif v3 > 0:
            mixed[s1, s3] += 1
        else:
            middle[s1, s3] += 1
    np.testing.assert_array_equal(c.ends_mx.data, ends)
    np.testing.assert_array_equal(c.mixed_mx.data, mixed)
    np.testing.assert_array_equal(c.middle_mx.data, middle)
    assert c.counters["hash3_distinct"] == len(h3)
    assert c.counters["hash3_total"] == sum(h3.values())


def test_mixed_input_types_rejected(base, tmp_path, ref_data):
    tmp, reads, db = base
    inp = Input(paths=[db, str(ref_data / "ecoli.header.jf27")])
    with pytest.raises(ValueError, match="Cannot mix"):
        inp.validate()


def test_missing_file_rejected():
    inp = Input(paths=["/nonexistent/file.fa"])
    with pytest.raises(FileNotFoundError):
        inp.validate()


def test_glob_nocheck_keeps_pattern(tmp_path):
    # unmatched patterns are kept verbatim (GLOB_NOCHECK semantics) and
    # fail later at validate
    out = glob_files("definitely_missing_*.fa")
    assert out == ["definitely_missing_*.fa"]


def test_hist_rejects_bad_range(base, tmp_path):
    tmp, reads, db = base
    h = Histogram([db], low=10, high=5)
    h.quiet = True
    h.output_prefix = str(tmp_path / "x")
    with pytest.raises(ValueError, match="High count value"):
        h.execute()


def test_malformed_fastq(tmp_path, base):
    tmp, reads, db = base
    bad = tmp_path / "bad.fastq"
    bad.write_text("@r1\nACGT\nNOTPLUS\nIIII\n")
    from kat_tpu.io import fastx

    with pytest.raises(ValueError, match="Malformed FASTQ"):
        list(fastx.read_records(str(bad)))


def test_unknown_ext_sniffing(ref_data):
    """Reference goldens (check_jellyfish.cc:182-220): .dat with FASTA
    content IS a sequence file of type fasta; a .jf is not."""
    from kat_tpu.io import fastx

    assert fastx.is_sequence_file(str(ref_data / "unknown.dat"))
    assert fastx.sniff_format(str(ref_data / "unknown.dat")) == "fasta"
    assert not fastx.is_sequence_file(str(ref_data / "ecoli.header.jf27"))
    assert fastx.is_sequence_file(str(ref_data / "ecoli_r1.1K.fastq"))
