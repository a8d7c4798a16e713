"""`kat hist` end-to-end parity: artifact text must match what the reference
implementation would produce (format from histogram.cc:131-144, bucket rules
histogram.cc:188-196), with counts cross-checked against the oracle."""

from collections import Counter

import oracle
from kat_tpu import cli
from kat_tpu.io import fastx


def _expected_hist_text(counter: Counter, k: int, file_name: str,
                        path_string: str, low=1, high=10000, inc=1) -> str:
    base = low - 1 if low > 1 else 1
    ceil = high + 1
    nb = ceil + 1 - base
    data = [0] * nb
    for _, v in counter.items():
        if v < base:
            data[0] += 1
        elif v > ceil:
            data[nb - 1] += 1
        else:
            data[(v - base) // inc] += 1
    lines = [
        f"# Title:{k}-mer spectra for: {file_name}",
        f"# XLabel:{k}-mer frequency",
        f"# YLabel:# distinct {k}-mers",
        f"# Kmer value:{k}",
        f"# Input 1:{path_string}",
        "###",
    ]
    col = base
    for v in data:
        lines.append(f"{col} {v}")
        col += inc
    return "\n".join(lines) + "\n"


def test_hist_cli_fixture_parity(ref_data, tmp_path, capsys):
    fq = str(ref_data / "ecoli_r1.1K.fastq")
    out = str(tmp_path / "out.hist")
    rc = cli.main(["hist", "-m", "17", "-o", out, fq])
    assert rc == 0

    seqs = [r.seq.decode() for r in fastx.read_records(fq)]
    expect = _expected_hist_text(
        oracle.count_seqs(seqs, 17, True), 17,
        "ecoli_r1.1K.fastq", fq)
    assert open(out).read() == expect
    stdout = capsys.readouterr().out
    assert "Running KAT in HIST mode" in stdout
    assert "KAT HIST completed." in stdout


def test_hist_low_high_inc(tmp_path):
    # Clamping catch-all buckets + inc bucketing on a crafted input.
    seqs = ["AAAAA" * 8, "ACGTACGTACGT", "ACGTACGTACGT", "ACGTACGTACGT"]
    p = tmp_path / "in.fa"
    p.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))
    out = str(tmp_path / "o.hist")
    rc = cli.main(["hist", "-m", "5", "-l", "3", "-h", "8", "-i", "2",
                   "-o", out, str(p)])
    assert rc == 0
    expect = _expected_hist_text(
        oracle.count_seqs(seqs, 5, True), 5, "in.fa", str(p),
        low=3, high=8, inc=2)
    assert open(out).read() == expect


def test_hist_non_canonical(tmp_path):
    seqs = ["GGGGCCCCAAAATTTT"]
    p = tmp_path / "in.fa"
    p.write_text(">s\n" + seqs[0] + "\n")
    out = str(tmp_path / "o.hist")
    rc = cli.main(["hist", "-m", "7", "-N", "-o", out, str(p)])
    assert rc == 0
    expect = _expected_hist_text(
        oracle.count_seqs(seqs, 7, False), 7, "in.fa", str(p))
    assert open(out).read() == expect


def test_hist_from_jf_load(ref_data, tmp_path):
    # LOAD mode: hist of the prebuilt reference hash.
    jf = str(ref_data / "ecoli.header.jf27")
    out = str(tmp_path / "o.hist")
    rc = cli.main(["hist", "-o", out, jf])
    assert rc == 0
    from kat_tpu.io import jellyfish
    _, keys, counts = jellyfish.read_jf(jf)
    expect = _expected_hist_text(
        Counter(dict(zip(keys.tolist(), counts.tolist()))), 27,
        "ecoli.header.jf27", jf)
    assert open(out).read() == expect


def test_hist_dump_hash_roundtrip(ref_data, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    fq = str(ref_data / "ecoli_r1.1K.fastq")
    out = str(tmp_path / "h.hist")
    rc = cli.main(["hist", "-m", "17", "-d", "-o", out, fq])
    assert rc == 0
    # -d writes <prefix>-hash.jf<k> (histogram.cc:105-108)
    from kat_tpu.io import jellyfish
    hdr, keys, counts = jellyfish.read_jf(str(tmp_path / "h.hist-hash.jf17"))
    assert hdr.mer_len == 17 and hdr.canonical
    seqs = [r.seq.decode() for r in fastx.read_records(fq)]
    assert dict(zip(keys.tolist(), counts.tolist())) == dict(
        oracle.count_seqs(seqs, 17, True))
