"""Bit-exact parity against goldens from the REAL reference binary.

tests/golden/out/* were produced by the hand-built reference `kat` 2.4.2
(.refbuild/build_reference.sh; configs in tests/golden/regenerate.sh, which
mirror the reference's own shell tests /root/reference/tests/test_*.sh).
Each test runs the kat_tpu CLI with the same arguments and diffs artifacts
byte-for-byte — except the filter-kmer .jf dump, whose header embeds a
freshly randomized GF(2) hash matrix on both sides and is therefore
compared by decoded (key, count) content instead.
"""

import pathlib

import pytest

import numpy as np

from kat_tpu import cli

GOLD = pathlib.Path(__file__).parent / "golden" / "out"
DATA = pathlib.Path("/root/reference/tests/data")

R1 = str(DATA / "ecoli_r1.1K.fastq")
R2 = str(DATA / "ecoli_r2.1K.fastq")
SECT_LEN_FA = str(DATA / "sect_length_test.fa")
SECT_FA = str(DATA / "sect_test.fa")
JF27 = str(DATA / "ecoli.header.jf27")


def _diff(actual: pathlib.Path, golden_name: str):
    got = actual.read_bytes()
    want = (GOLD / golden_name).read_bytes()
    if got != want:
        gl = got.decode(errors="replace").splitlines()
        wl = want.decode(errors="replace").splitlines()
        for i, (g, w) in enumerate(zip(gl, wl)):
            assert g == w, f"{golden_name}: first diff at line {i + 1}"
        assert len(gl) == len(wl), f"{golden_name}: line-count mismatch"
        raise AssertionError(f"{golden_name}: byte-level mismatch")


def test_hist_m17_two_inputs(tmp_path):
    out = tmp_path / "hist_m17"
    assert cli.main(["hist", "-m", "17", "-o", str(out), R1, R2]) == 0
    _diff(out, "hist_m17")


def test_hist_m27(tmp_path):
    out = tmp_path / "hist_m27"
    assert cli.main(["hist", "-m", "27", "-o", str(out), R1]) == 0
    _diff(out, "hist_m27")


def test_hist_custom_bins(tmp_path):
    out = tmp_path / "hist_bins"
    assert cli.main(["hist", "-m", "17", "-l", "3", "-h", "500", "-i", "2",
                     "-o", str(out), R1]) == 0
    _diff(out, "hist_bins")


def test_gcp_m17(tmp_path):
    out = tmp_path / "gcp_m17"
    assert cli.main(["gcp", "-m", "17", "-o", str(out), R1, R2]) == 0
    _diff(tmp_path / "gcp_m17.mx", "gcp_m17.mx")


def test_comp_density(tmp_path):
    out = tmp_path / "comp_density"
    assert cli.main(["comp", "-m", "13", "-n", "-o", str(out), R1, R2]) == 0
    _diff(tmp_path / "comp_density-main.mx", "comp_density-main.mx")
    _diff(tmp_path / "comp_density.stats", "comp_density.stats")


def test_comp_spectra_cn(tmp_path):
    out = tmp_path / "comp_cn"
    assert cli.main(["comp", "-m", "13", "-o", str(out), R1,
                     SECT_LEN_FA]) == 0
    _diff(tmp_path / "comp_cn-main.mx", "comp_cn-main.mx")
    _diff(tmp_path / "comp_cn.stats", "comp_cn.stats")


def test_sect_from_jf(tmp_path):
    out = tmp_path / "sect_jf"
    assert cli.main(["sect", "-o", str(out), SECT_LEN_FA, JF27]) == 0
    _diff(tmp_path / "sect_jf-counts.cvg", "sect_jf-counts.cvg")
    _diff(tmp_path / "sect_jf-stats.tsv", "sect_jf-stats.tsv")


def test_sect_from_reads(tmp_path):
    out = tmp_path / "sect_reads"
    assert cli.main(["sect", "-m", "17", "-E", "-F", "-o", str(out),
                     SECT_FA, R1]) == 0
    _diff(tmp_path / "sect_reads-counts.cvg", "sect_reads-counts.cvg")
    _diff(tmp_path / "sect_reads-stats.tsv", "sect_reads-stats.tsv")
    _diff(tmp_path / "sect_reads-repetitive.fa", "sect_reads-repetitive.fa")
    _diff(tmp_path / "sect_reads-non_repetitive.fa",
          "sect_reads-non_repetitive.fa")


def test_cold_m17(tmp_path):
    out = tmp_path / "cold_m17"
    assert cli.main(["cold", "-m", "17", "-o", str(out), SECT_FA, R1]) == 0
    _diff(tmp_path / "cold_m17-stats.tsv", "cold_m17-stats.tsv")


def test_filter_seq(tmp_path):
    out = tmp_path / "fs_m17"
    assert cli.main(["filter", "seq", "-m", "17", "-T", "0.2", "--stats",
                     "-o", str(out), "--seq", SECT_FA, R1]) == 0
    _diff(tmp_path / "fs_m17.in.fa", "fs_m17.in.fa")
    _diff(tmp_path / "fs_m17.stats", "fs_m17.stats")


def test_comp_three_inputs(tmp_path):
    """3-input comp: ends/middle/mixed matrices (comp.cc:305-364)."""
    out = tmp_path / "comp_3in"
    assert cli.main(["comp", "-m", "13", "-o", str(out), R1, SECT_LEN_FA,
                     SECT_FA]) == 0
    for suffix in ("-main.mx", "-ends.mx", "-middle.mx", "-mixed.mx",
                   ".stats"):
        _diff(tmp_path / f"comp_3in{suffix}", f"comp_3in{suffix}")


def test_comp_scales_and_bins(tmp_path):
    """Non-default d1/d2 scales and bin counts (comp.cc:674-681)."""
    out = tmp_path / "comp_scaled"
    assert cli.main(["comp", "-m", "13", "-x", "1.5", "-y", "0.5",
                     "-i", "256", "-j", "128", "-o", str(out), R1, R2]) == 0
    _diff(tmp_path / "comp_scaled-main.mx", "comp_scaled-main.mx")
    _diff(tmp_path / "comp_scaled.stats", "comp_scaled.stats")


def test_hist_load_mode_from_jf(tmp_path):
    out = tmp_path / "hist_jf"
    assert cli.main(["hist", "-o", str(out), JF27]) == 0
    _diff(out, "hist_jf")


def test_gcp_load_mode_from_jf(tmp_path):
    out = tmp_path / "gcp_jf"
    assert cli.main(["gcp", "-o", str(out), JF27]) == 0
    _diff(tmp_path / "gcp_jf.mx", "gcp_jf.mx")


def test_filter_kmer_jf_content(tmp_path):
    """The .jf dump embeds a per-run random hash matrix, so parity is on
    decoded (canonical kmer -> count) content, decoded by our codec from
    BOTH the reference-binary-written file and ours."""
    from kat_tpu.io import jellyfish

    out = tmp_path / "fk_m17"
    assert cli.main(["filter", "kmer", "-m", "17", "--low_count", "2",
                     "--high_count", "100", "-o", str(out), R1]) == 0
    ours = tmp_path / "fk_m17-in.jf17"
    assert ours.exists()
    hdr_ref, keys_ref, counts_ref = jellyfish.read_jf(
        str(GOLD / "fk_m17-in.jf17"))
    hdr_our, keys_our, counts_our = jellyfish.read_jf(str(ours))
    assert hdr_ref.mer_len == hdr_our.mer_len == 17
    ref_map = dict(zip(np.asarray(keys_ref).tolist(),
                       np.asarray(counts_ref).tolist()))
    our_map = dict(zip(np.asarray(keys_our).tolist(),
                       np.asarray(counts_our).tolist()))
    assert ref_map == our_map


def test_sect_gc_stats(tmp_path):
    """-g writes <prefix>-counts.gc (reference src/sect.cc:176-179)."""
    out = tmp_path / "sect_gc"
    assert cli.main(["sect", "-m", "17", "-g", "-E", "-F", "-o", str(out),
                     SECT_FA, R1]) == 0
    _diff(tmp_path / "sect_gc-counts.gc", "sect_gc-counts.gc")
    _diff(tmp_path / "sect_gc-counts.cvg", "sect_gc-counts.cvg")
    _diff(tmp_path / "sect_gc-stats.tsv", "sect_gc-stats.tsv")


def test_filter_seq_invert(tmp_path):
    out = tmp_path / "fs_inv"
    assert cli.main(["filter", "seq", "-m", "17", "-T", "0.2", "--invert",
                     "-o", str(out), "--seq", SECT_FA, R1]) == 0
    _diff(tmp_path / "fs_inv.in.fa", "fs_inv.in.fa")


def test_filter_seq_separate(tmp_path):
    out = tmp_path / "fs_sep"
    assert cli.main(["filter", "seq", "-m", "17", "-T", "0.2",
                     "--separate", "-o", str(out), "--seq", SECT_FA,
                     R1]) == 0
    _diff(tmp_path / "fs_sep.in.fa", "fs_sep.in.fa")
    _diff(tmp_path / "fs_sep.out.fa", "fs_sep.out.fa")
