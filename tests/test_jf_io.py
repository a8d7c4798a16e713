"""Jellyfish .jf codec: golden values from the reference fixture
(tests/check_jellyfish.cc:38-91) plus write/read round-trip."""

import numpy as np

import oracle
from kat_tpu.core import counting
from kat_tpu.io import jellyfish as jf


def test_fixture_header_goldens(ref_data):
    hdr, off = jf.read_header(str(ref_data / "ecoli.header.jf27"))
    # Golden values from check_jellyfish.cc:50-57
    assert hdr.key_len == 54
    assert hdr.val_len == 7
    assert hdr.counter_len == 4
    assert hdr.max_reprobe == 126
    assert off == 1368
    assert hdr.size == 131072
    assert hdr.fmt == "binary/sorted"


def test_fixture_record_count_and_queries(ref_data):
    hdr, keys, counts = jf.read_jf(str(ref_data / "ecoli.header.jf27"))
    assert len(keys) == 1889  # check_jellyfish.cc:115
    table = {int(k): int(c) for k, c in zip(keys, counts)}
    k = hdr.mer_len
    assert k == 27

    # Golden queries from check_jellyfish.cc:62-91
    golden = [
        ("AGCTTTTCATTCTGACTGCAACGGGCA", 3, 3),
        ("GCATAGCGCACAGACAGATAAAAATTA", 1, 1),
        ("AATGAAAAAGGCGAACTGGTGGTGCTT", 1, 0),
        ("CTCACCAATGTACATGGCCTTAATCTG", 1, 0),
    ]
    for s, exp, exp_can in golden:
        v = oracle.pack(s)
        can = min(v, oracle.revcomp(v, k))
        assert table.get(v, 0) == exp
        assert table.get(can, 0) == exp_can


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(21)
    keys = np.unique(rng.integers(0, 1 << 54, size=500).astype(np.uint64))
    counts = rng.integers(1, 1000, size=len(keys)).astype(np.uint32)
    p = str(tmp_path / "test.jf27")
    jf.write_jf(p, keys, counts, mer_len=27, canonical=True)
    hdr, k2, c2 = jf.read_jf(p)
    assert hdr.mer_len == 27
    assert hdr.canonical is True
    assert dict(zip(k2.tolist(), c2.tolist())) == dict(
        zip(keys.tolist(), counts.tolist()))


def test_counter_saturation(tmp_path):
    # binary_dumper.hpp:49 — counts clamp to 2^(8*counter_len)-1
    p = str(tmp_path / "sat.jf5")
    jf.write_jf(p, np.array([7], np.uint64),
                np.array([300], np.uint32), mer_len=5, canonical=False,
                counter_len=1)
    _, _, c = jf.read_jf(p)
    assert c[0] == 255


def test_table_device_roundtrip(ref_data):
    hdr, keys, counts = jf.read_jf(str(ref_data / "ecoli.header.jf27"))
    table = counting.table_from_numpy(keys, counts)
    k2, c2 = counting.table_to_numpy(table)
    assert dict(zip(k2.tolist(), c2.tolist())) == dict(
        zip(keys.tolist(), counts.tolist()))
