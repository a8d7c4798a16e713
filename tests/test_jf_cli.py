"""Jellyfish-compatible CLI parity tests: count/histo/dump/query/merge/
stats on the reference fixture hash and oracle-checked synthetic data."""

import random
from collections import Counter

import pytest

import oracle
from kat_tpu import jf_cli
from kat_tpu.core.kmers import unpack_string
from kat_tpu.io import jellyfish

JF = "/root/reference/tests/data/ecoli.header.jf27"


def _run(argv, capsys):
    rc = jf_cli.main(argv)
    out = capsys.readouterr().out
    return rc, out


def test_stats_fixture(ref_data, capsys):
    rc, out = _run(["stats", JF], capsys)
    assert rc == 0
    _hdr, keys, counts = jellyfish.read_jf(JF)
    lines = dict(ln.split(":") for ln in out.strip().splitlines())
    assert int(lines["Distinct"]) == len(keys) == 1889
    assert int(lines["Total"]) == int(counts.sum())
    assert int(lines["Unique"]) == int((counts == 1).sum())
    assert int(lines["Max_count"]) == int(counts.max())


def test_histo_fixture(ref_data, capsys):
    rc, out = _run(["histo", JF], capsys)
    assert rc == 0
    _hdr, _keys, counts = jellyfish.read_jf(JF)
    want = Counter(counts.tolist())
    got = {}
    for ln in out.strip().splitlines():
        col, v = ln.split(" ")
        got[int(col)] = int(v)
    for col, v in want.items():
        assert got[min(col, 10001)] >= v if col > 10000 else got[col] == v


def test_query_fixture(ref_data, capsys):
    _hdr, keys, counts = jellyfish.read_jf(JF)
    mer = unpack_string(int(keys[7]), 27)
    rc, out = _run(["query", JF, mer], capsys)
    assert rc == 0
    assert out.strip() == f"{mer} {int(counts[7])}"


def test_dump_roundtrip(ref_data, capsys, tmp_path):
    rc, out = _run(["dump", "-c", JF], capsys)
    assert rc == 0
    _hdr, keys, counts = jellyfish.read_jf(JF)
    lines = out.strip().splitlines()
    assert len(lines) == len(keys)
    mer, val = lines[0].split(" ")
    assert len(mer) == 27
    # fasta-style
    rc, out = _run(["dump", JF], capsys)
    lines = out.strip().splitlines()
    assert lines[0].startswith(">")
    assert len(lines) == 2 * len(keys)


def test_count_and_merge(tmp_path, capsys):
    rng = random.Random(4)
    seqs = ["".join(rng.choice("ACGT") for _ in range(60))
            for _ in range(20)]
    fa = tmp_path / "r.fa"
    with open(fa, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">s{i}\n{s}\n")
    out1 = str(tmp_path / "a.jf")
    rc, _ = _run(["count", "-m", "11", "-C", "-s", "4096", "-o", out1,
                  str(fa)], capsys)
    assert rc == 0
    _hdr, keys, counts = jellyfish.read_jf(out1)
    want = oracle.count_seqs(seqs, 11)
    assert dict(zip(keys.tolist(), counts.tolist())) == dict(want)

    merged = str(tmp_path / "m.jf")
    rc, _ = _run(["merge", "-o", merged, out1, out1], capsys)
    assert rc == 0
    _hdr, mkeys, mcounts = jellyfish.read_jf(merged)
    assert dict(zip(mkeys.tolist(), mcounts.tolist())) == \
        {k: 2 * v for k, v in want.items()}
