"""FASTA/FASTQ reading and batch encoding."""

import gzip

import numpy as np

import oracle
from kat_tpu.core import counting, kmers
from kat_tpu.io import fastx


def test_read_fastq_fixture(ref_data):
    recs = list(fastx.read_records(str(ref_data / "ecoli_r1.1K.fastq")))
    assert len(recs) == 1000
    assert all(r.qual is not None and len(r.qual) == len(r.seq) for r in recs)
    assert set("".join(r.seq.decode() for r in recs[:10])) <= set("ACGTN")


def test_read_fasta_fixture(ref_data):
    recs = list(fastx.read_records(str(ref_data / "sect_test.fa")))
    assert len(recs) >= 1
    assert all(len(r.seq) > 0 for r in recs)


def test_sniff(ref_data, tmp_path):
    assert fastx.sniff_format(str(ref_data / "ecoli_r1.1K.fastq")) == "fastq"
    assert fastx.sniff_format(str(ref_data / "sect_test.fa")) == "fasta"
    # unknown.dat starts with '>' => fasta (check_jellyfish.cc:214-220)
    assert fastx.sniff_format(str(ref_data / "unknown.dat")) == "fasta"
    assert fastx.is_sequence_file(str(ref_data / "unknown.dat"))
    assert not fastx.is_sequence_file(str(ref_data / "ecoli.header.jf27"))


def test_gzip_roundtrip(tmp_path):
    raw = b"@r1\nACGTACGT\n+\nIIIIIIII\n@r2\nTTTTCCCC\n+\nIIIIIIII\n"
    p = tmp_path / "x.fastq.gz"
    p.write_bytes(gzip.compress(raw))
    recs = list(fastx.read_records(str(p)))
    assert [r.seq for r in recs] == [b"ACGTACGT", b"TTTTCCCC"]


def test_trim5(tmp_path):
    p = tmp_path / "a.fa"
    p.write_text(">s1\nAAACGT\n")
    recs = list(fastx.read_records_multi([str(p)], trim5=[3]))
    assert recs[0].seq == b"CGT"


def test_encode_batches_counts_match_oracle(tmp_path):
    rng = np.random.default_rng(17)
    seqs = ["".join(rng.choice(list("ACGT"), size=int(n)))
            for n in rng.integers(40, 200, size=50)]
    p = tmp_path / "r.fa"
    p.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))

    k = 13
    sc = counting.StreamingCounter(initial_capacity=1 << 10)
    for batch in fastx.encode_batches(fastx.read_records(str(p)), k,
                                      target_codes=4096):
        hi, lo, valid = kmers.extract_kmers(batch, k, True)
        sc.add(hi, lo, valid)
    keys, counts = counting.table_to_numpy(sc.finish())
    got = dict(zip(keys.tolist(), counts.tolist()))
    assert got == dict(oracle.count_seqs(seqs, k, True))


def test_long_sequence_seam(tmp_path):
    # A sequence split across chunks must not lose any window (the (k-1)
    # seam, mer_overlap_sequence_parser.hpp:44-52).
    rng = np.random.default_rng(23)
    seq = "".join(rng.choice(list("ACGT"), size=5000))
    p = tmp_path / "long.fa"
    p.write_text(f">c1\n{seq}\n")
    k = 21
    sc = counting.StreamingCounter(initial_capacity=1 << 13)
    for batch in fastx.encode_batches(fastx.read_records(str(p)), k,
                                      target_codes=2048, max_row=512):
        hi, lo, valid = kmers.extract_kmers(batch, k, True)
        sc.add(hi, lo, valid)
    keys, counts = counting.table_to_numpy(sc.finish())
    got = dict(zip(keys.tolist(), counts.tolist()))
    assert got == dict(oracle.count_seqs([seq], k, True))
