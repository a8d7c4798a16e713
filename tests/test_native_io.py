"""Native FASTX reader correctness: the densely packed code batches must
yield exactly the same k-mer multiset as the pure-Python oracle, for FASTA,
FASTQ, gz, multi-line FASTA, Ns, short records, 5' trim, and records
spanning row boundaries (seam)."""

import gzip
import threading
import time
import random
from collections import Counter

import numpy as np
import pytest

import oracle
from kat_tpu.io import native


@pytest.fixture(autouse=True)
def _need_native():
    if not native.available():
        pytest.skip("native fastxio unavailable (no g++?)")


def _kmers_from_batches(paths, k, **kw):
    """Decode batches back to base streams and collect canonical k-mers."""
    counts = Counter()
    for batch in native.stream_code_batches(paths, k, **kw):
        for row in batch:
            # walk windows; code>=4 breaks
            for i in range(len(row) - k + 1):
                win = row[i:i + k]
                if (win < 4).all():
                    v = 0
                    for c in win:
                        v = (v << 2) | int(c)
                    counts[min(v, oracle.revcomp(v, k))] += 1
    return counts


def _expected(seqs, k):
    return oracle.count_seqs(seqs, k)


def _write_fasta(path, seqs, line_len=None):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i} desc\n")
            if line_len:
                for j in range(0, len(s), line_len):
                    f.write(s[j:j + line_len] + "\n")
            else:
                f.write(s + "\n")


def _write_fastq(path, seqs, gz=False):
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for i, s in enumerate(seqs):
            f.write(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n")


@pytest.fixture
def seqs():
    rng = random.Random(77)
    out = []
    for _ in range(50):
        n = rng.randint(5, 200)
        out.append("".join(
            rng.choice("ACGTN" if rng.random() < 0.05 else "ACGT")
            for _ in range(n)))
    return out


def test_fasta(tmp_path, seqs):
    fa = tmp_path / "x.fa"
    _write_fasta(fa, seqs)
    assert _kmers_from_batches([str(fa)], 9) == _expected(seqs, 9)


def test_fasta_multiline(tmp_path, seqs):
    fa = tmp_path / "x.fa"
    _write_fasta(fa, seqs, line_len=17)
    assert _kmers_from_batches([str(fa)], 9) == _expected(seqs, 9)


def test_fastq(tmp_path, seqs):
    fq = tmp_path / "x.fastq"
    _write_fastq(fq, seqs)
    assert _kmers_from_batches([str(fq)], 9) == _expected(seqs, 9)


def test_fastq_gz(tmp_path, seqs):
    fq = tmp_path / "x.fastq.gz"
    _write_fastq(fq, seqs, gz=True)
    assert _kmers_from_batches([str(fq)], 9) == _expected(seqs, 9)


def test_seam_across_rows(tmp_path):
    rng = random.Random(5)
    long = "".join(rng.choice("ACGT") for _ in range(5000))
    fa = tmp_path / "long.fa"
    _write_fasta(fa, [long])
    # tiny rows force many seam splits
    got = _kmers_from_batches([str(fa)], 11, rows=7, row_len=129)
    assert got == _expected([long], 11)


def test_trim5(tmp_path, seqs):
    fq = tmp_path / "x.fastq"
    _write_fastq(fq, seqs)
    trimmed = [s[3:] for s in seqs]
    got = _kmers_from_batches([str(fq)], 9, trim5=[3])
    assert got == _expected(trimmed, 9)


def test_multiple_files(tmp_path, seqs):
    fa = tmp_path / "a.fa"
    fq = tmp_path / "b.fastq"
    _write_fasta(fa, seqs[:25])
    _write_fastq(fq, seqs[25:])
    got = _kmers_from_batches([str(fa), str(fq)], 9)
    assert got == _expected(seqs, 9)


def test_parallel_reader_same_multiset(tmp_path, seqs):
    """threads>1 interleaves batches across files but the k-mer multiset
    (all counting consumers see only that) is identical to serial."""
    paths = []
    for i in range(4):
        p = tmp_path / f"p{i}.fastq.gz"
        _write_fastq(p, seqs[i::4], gz=True)
        paths.append(str(p))
    serial = _kmers_from_batches(paths, 9)
    par = _kmers_from_batches(paths, 9, threads=4)
    assert par == serial == _expected(seqs, 9)


def test_parallel_reader_trims_and_more_threads_than_files(tmp_path, seqs):
    pa, pb = tmp_path / "a.fastq", tmp_path / "b.fastq"
    _write_fastq(pa, seqs[:20])
    _write_fastq(pb, seqs[20:])
    got = _kmers_from_batches([str(pa), str(pb)], 9, trim5=[2, 5],
                              threads=16)
    want = _expected([s[2:] for s in seqs[:20]]
                     + [s[5:] for s in seqs[20:]], 9)
    assert got == want


def test_parallel_reader_propagates_errors(tmp_path, seqs):
    ok = tmp_path / "ok.fastq"
    _write_fastq(ok, seqs)
    with pytest.raises(OSError):
        list(native.stream_code_batches(
            [str(ok), str(tmp_path / "missing.fastq")], 9, threads=2))


def test_range_split_single_file_same_multiset(tmp_path, seqs,
                                               monkeypatch):
    """ONE plain file split into record-aligned byte ranges parses to the
    same k-mer multiset as the serial read — for FASTA (incl. multi-line)
    and FASTQ."""
    monkeypatch.setattr(native, "RANGE_CHUNK", 256)  # force many pieces
    fa = tmp_path / "one.fa"
    _write_fasta(fa, seqs, line_len=31)
    got = _kmers_from_batches([str(fa)], 9, threads=4)
    assert got == _expected(seqs, 9)

    fq = tmp_path / "one.fastq"
    _write_fastq(fq, seqs)
    got = _kmers_from_batches([str(fq)], 9, threads=4)
    assert got == _expected(seqs, 9)


def test_range_split_quality_at_signs(tmp_path, monkeypatch):
    """FASTQ record-boundary sync must not mistake a quality line that
    starts with '@' for a header (the classic chunking hazard)."""
    monkeypatch.setattr(native, "RANGE_CHUNK", 64)
    seqs = ["ACGTACGTACGTACGTACGT"] * 40
    fq = tmp_path / "at.fastq"
    with open(fq, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f"@r{i}\n{s}\n+\n{'@' * len(s)}\n")  # '@' quality!
    got = _kmers_from_batches([str(fq)], 9, threads=8)
    assert got == _expected(seqs, 9)


def test_range_split_with_trim(tmp_path, seqs, monkeypatch):
    """5' trim applies per record regardless of which range reader owns
    it."""
    monkeypatch.setattr(native, "RANGE_CHUNK", 200)
    fq = tmp_path / "t.fastq"
    _write_fastq(fq, seqs)
    got = _kmers_from_batches([str(fq)], 9, trim5=[3], threads=4)
    assert got == _expected([s[3:] for s in seqs], 9)


def test_gz_threaded_inflate_same_multiset(tmp_path, seqs):
    """threads>1 on a single .gz uses the producer-thread inflate path;
    output parity with the serial parse."""
    gz = tmp_path / "one.fastq.gz"
    _write_fastq(gz, seqs, gz=True)
    serial = _kmers_from_batches([str(gz)], 9, threads=1)
    par = _kmers_from_batches([str(gz)], 9, threads=4)
    assert par == serial == _expected(seqs, 9)


def test_abandoned_consumer_stops_workers(tmp_path, seqs):
    """Closing the generator mid-stream must stop the worker threads
    (bounded-queue abandonment leak, ADVICE r3)."""
    paths = []
    for i in range(3):
        p = tmp_path / f"ab{i}.fastq"
        _write_fastq(p, seqs * 20)
        paths.append(str(p))
    before = threading.active_count()
    gen = native.stream_code_batches(paths, 9, rows=4, row_len=64,
                                     threads=3)
    next(gen)
    gen.close()  # abandon
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_gz_threaded_raw_inflate_real_gzip_and_multimember(tmp_path,
                                                           seqs):
    """The crc-skipping raw-deflate fast path must parse (a) gzip(1)
    output (FNAME flag set) and (b) concatenated multi-member files,
    with multiset parity vs the serial gzread path."""
    import subprocess

    a = tmp_path / "a.fastq"
    b = tmp_path / "b.fastq"
    _write_fastq(a, seqs[:25])
    _write_fastq(b, seqs[25:])
    subprocess.run(["gzip", "-k", str(a)], check=True)
    subprocess.run(["gzip", "-k", str(b)], check=True)
    multi = tmp_path / "multi.fastq.gz"
    with open(multi, "wb") as out:
        out.write((tmp_path / "a.fastq.gz").read_bytes())
        out.write((tmp_path / "b.fastq.gz").read_bytes())

    got = _kmers_from_batches([str(multi)], 9, threads=2)  # raw path
    assert got == _expected(seqs, 9)
    got1 = _kmers_from_batches([str(multi)], 9, threads=1)  # gzread path
    assert got1 == _expected(seqs, 9)


def test_gz_threaded_truncation_raises(tmp_path, seqs):
    """A structurally broken stream (truncated member) must surface as
    an error from the threaded raw path, never as silent truncation.
    (Bit flips that still decode as valid Huffman symbols are the
    documented blind spot of skipping the crc32 — fastxio.cpp RawGz.)"""
    gz = tmp_path / "c.fastq.gz"
    _write_fastq(gz, seqs * 30, gz=True)
    data = gz.read_bytes()
    gz.write_bytes(data[:len(data) // 2])  # cut the member in half
    for threads in (2, 1):  # raw producer path AND serial gzread path
        with pytest.raises(RuntimeError):
            for _ in native.stream_code_batches([str(gz)], 9,
                                                threads=threads):
                pass


def test_gz_trailing_garbage_tolerated(tmp_path, seqs):
    """Bytes after the final gzip member are ignored (gzread parity) on
    both the raw and serial paths."""
    gz = tmp_path / "t.fastq.gz"
    _write_fastq(gz, seqs, gz=True)
    with open(gz, "ab") as f:
        f.write(b"\x00" * 37)
    for threads in (2, 1):
        got = _kmers_from_batches([str(gz)], 9, threads=threads)
        assert got == _expected(seqs, 9)
