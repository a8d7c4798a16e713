"""Pipe/generator input streams (reference stream_manager.hpp:74+ —
round-1 missing item 6): `gen:<command>` re-openable generator pipes,
FIFOs and single-open sniffing."""

import os
import threading

import numpy as np
import pytest

from kat_tpu.io import fastx


FASTA = b">a\nACGTACGTAC\n>b\nGGGCCCTTT\n"
FASTQ = b"@r1\nACGTACGT\n+\nIIIIIIII\n"


def test_generator_path_reads_command_output(tmp_path):
    fa = tmp_path / "x.fa"
    fa.write_bytes(FASTA)
    recs = list(fastx.read_records(f"gen:cat {fa}"))
    assert [r.name for r in recs] == ["a", "b"]
    assert recs[0].seq == b"ACGTACGTAC"


def test_generator_path_reopenable(tmp_path):
    """The defining property of generator pipes: every open re-runs the
    command (stream_manager's repeatedly-openable paths)."""
    fa = tmp_path / "x.fa"
    fa.write_bytes(FASTA)
    path = f"gen:cat {fa}"
    first = list(fastx.read_records(path))
    second = list(fastx.read_records(path))
    assert [r.seq for r in first] == [r.seq for r in second]


def test_generator_path_gzip(tmp_path):
    import gzip

    gz = tmp_path / "x.fq.gz"
    gz.write_bytes(gzip.compress(FASTQ))
    recs = list(fastx.read_records(f"gen:cat {gz}"))
    assert recs[0].name == "r1"
    assert recs[0].seq == b"ACGTACGT"


def test_fifo_single_open(tmp_path):
    fifo = str(tmp_path / "pipe.fa")
    os.mkfifo(fifo)

    def writer():
        with open(fifo, "wb") as f:
            f.write(FASTA)

    t = threading.Thread(target=writer)
    t.start()
    try:
        assert fastx.is_stream_path(fifo)
        assert fastx.is_sequence_file(fifo)
        recs = list(fastx.read_records(fifo))
        assert [r.name for r in recs] == ["a", "b"]
    finally:
        t.join(timeout=10)


def test_sniff_without_extension_uses_peek(tmp_path):
    p = tmp_path / "noext"
    p.write_bytes(FASTQ)
    assert fastx.sniff_format(str(p)) == "fastq"
    recs = list(fastx.read_records(str(p)))
    assert recs[0].qual == b"IIIIIIII"


def test_hist_tool_over_generator_pipe(tmp_path):
    """End-to-end: kat hist counting from a generator pipe (python
    reader engaged automatically, native reader skipped)."""
    from kat_tpu.tools.hist import Histogram

    fa = tmp_path / "in.fa"
    rng = np.random.default_rng(4)
    with open(fa, "w") as f:
        for i in range(30):
            s = "".join("ACGT"[c] for c in rng.integers(0, 4, 60))
            f.write(f">s{i}\n{s}\n")

    h = Histogram([f"gen:cat {fa}"], low=1, high=100)
    h.quiet = True
    h.input.mer_len = 13
    h.input.hash_size = 4096
    h.output_prefix = str(tmp_path / "hist_gen")
    h.execute()
    h.save()

    h2 = Histogram([str(fa)], low=1, high=100)
    h2.quiet = True
    h2.input.mer_len = 13
    h2.input.hash_size = 4096
    h2.output_prefix = str(tmp_path / "hist_file")
    h2.execute()
    h2.save()

    gen_out = open(tmp_path / "hist_gen").read()
    file_out = open(tmp_path / "hist_file").read()
    # identical except the Input line naming the source
    strip = lambda s: "\n".join(l for l in s.splitlines()
                                if not l.startswith("# Input"))
    assert strip(gen_out) == strip(file_out)


def test_gzip_magic_survives_one_byte_reads():
    """A slow pipe writer delivering 1 byte per read must not defeat the
    2-byte gzip magic check (ADVICE r2: single peek could short-read)."""
    import gzip as _gzip
    import io

    from kat_tpu.io.fastx import _PushbackReader, _read_at_least

    payload = _gzip.compress(b">r1\nACGTACGT\n")

    class OneByte(io.RawIOBase):
        def __init__(self, data):
            self.data = data
            self.pos = 0

        def readable(self):
            return True

        def readinto(self, b):
            if self.pos >= len(self.data):
                return 0
            b[0] = self.data[self.pos]
            self.pos += 1
            return 1

    raw = OneByte(payload)
    magic = _read_at_least(raw, 2)
    assert magic == b"\x1f\x8b"
    f = io.BufferedReader(_PushbackReader(magic, raw))
    assert _gzip.GzipFile(fileobj=f).read() == b">r1\nACGTACGT\n"


def test_generator_failure_raises(tmp_path):
    """A gen: command that dies midway must surface an error, not count a
    truncated stream as valid input (ADVICE r2)."""
    import pytest

    from kat_tpu.io import fastx

    path = "gen:printf '>r1\\nACGT\\n'; exit 3"
    with pytest.raises(RuntimeError, match="generator command failed"):
        list(fastx.read_records(path))


def test_generator_success_reaps_child(tmp_path):
    from kat_tpu.io import fastx

    recs = list(fastx.read_records("gen:printf '>r1\\nACGTACGT\\n'"))
    assert len(recs) == 1 and recs[0].seq == b"ACGTACGT"


def test_gzipped_generator_failure_raises(tmp_path):
    """Failure surfacing must survive the gzip wrapper: GzipFile keeps
    passed-in fileobjs open, which previously skipped the gen: exit
    check entirely for compressed streams."""
    import gzip as _gzip

    import pytest

    from kat_tpu.io import fastx

    p = tmp_path / "r.fa.gz"
    p.write_bytes(_gzip.compress(b">r1\nACGTACGT\n"))
    ok = list(fastx.read_records(f"gen:cat {p}"))
    assert ok[0].seq == b"ACGTACGT"
    with pytest.raises(RuntimeError, match="generator command failed"):
        list(fastx.read_records(f"gen:cat {p}; exit 3"))


def test_cli_generator_command_with_spaces(tmp_path):
    """gen:<cmd with spaces> through the CLI input group: the command is
    opaque to glob/space splitting (it previously shattered into fake
    file paths)."""
    from kat_tpu.tools.common import glob_files

    assert glob_files("gen:gzip -c a.fq.gz") == ["gen:gzip -c a.fq.gz"]
    assert glob_files(["gen:cat a b", "x.fa"]) == ["gen:cat a b", "x.fa"]
