"""Plot-module smoke tests over real artifacts (reference scripts have no
plot unit tests; we assert each mode renders a file from genuine inputs)."""

import pathlib

import pytest

from kat_tpu.plot import run_plot

KAT_HIST = pathlib.Path("/root/reference/tests/data/kat.hist")
RES = pathlib.Path("/root/reference/scripts/test/resources")


@pytest.fixture(autouse=True)
def _need(ref_data):
    pass


def test_plot_spectra_hist(tmp_path):
    out = tmp_path / "sh.png"
    assert run_plot("spectra-hist",
                    [f"--output={out}", str(KAT_HIST)]) == 0
    assert out.exists()


def test_plot_density(tmp_path):
    out = tmp_path / "d.png"
    assert run_plot("density", [f"--output={out}", str(RES / "gcp1.mx")]) == 0
    assert out.exists()


def test_plot_spectra_cn(tmp_path):
    out = tmp_path / "cn.png"
    assert run_plot("spectra-cn",
                    [f"--output={out}", str(RES / "spectracn1.mx")]) == 0
    assert out.exists()


def test_plot_spectra_mx(tmp_path):
    out = tmp_path / "mx.png"
    assert run_plot("spectra-mx",
                    [f"--output={out}", "--intersection",
                     str(RES / "spectracn1.mx")]) == 0
    assert out.exists()


def test_plot_profile(tmp_path):
    cvg = tmp_path / "p-counts.cvg"
    cvg.write_text(">seq1\n1 2 3 4 5 4 3 2 1\n>seq2\n0 0 1 1 0\n")
    out = tmp_path / "p.png"
    assert run_plot("profile",
                    [f"--output={out}", "-n", "0,1", str(cvg)]) == 0
    assert out.exists()


def test_plot_cold(tmp_path):
    tsv = tmp_path / "c-stats.tsv"
    tsv.write_text(
        "seq_name\tread_median_cvg\tread_mean_cvg\tasm_cn\tgc%\tseq_length\t"
        "kmers_in_seq\tinvalid_kmers\t%_invalid\tnon_zero_kmers\t"
        "%_non_zero\t%_non_zero_corrected\n"
        "c1\t30\t31.5\t1\t0.45\t1000\t990\t0\t0\t980\t99\t99\n"
        "c2\t60\t62.1\t2\t0.55\t5000\t4990\t0\t0\t4900\t98\t98\n")
    out = tmp_path / "c.png"
    assert run_plot("cold", [f"--output={out}", str(tsv)]) == 0
    assert out.exists()


def test_unknown_mode():
    with pytest.raises(ValueError):
        run_plot("nope", [])
