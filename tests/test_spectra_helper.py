"""SpectraHelper parity: golden values from the reference's own unit test
(tests/check_spectra_helper.cc:32-58 — 10001 bins, peak at (229, 9762))."""

import pathlib

import pytest

from kat_tpu.analysis import spectra_helper as sh

KAT_HIST = pathlib.Path("/root/reference/tests/data/kat.hist")


@pytest.fixture
def histo(ref_data):
    return sh.load_hist(str(KAT_HIST))


def test_load(histo):
    assert len(histo) == 10001
    assert histo[0][0] == 1


def test_golden_peak(histo):
    assert sh.find_peak(histo) == (229, 9762)


def test_first_min_before_peak(histo):
    m = sh.find_first_min(histo)
    assert 0 < m < 229 - histo[0][0]


def test_lim97(histo):
    bin97, cum = sh.lim97(histo)
    assert bin97 > 229
    total = sum(v for _b, v in histo[sh.find_first_min(histo, True):])
    assert cum / total > 0.97


def test_synthetic_shapes():
    histo = [(1, 100), (2, 50), (3, 20), (4, 30), (5, 90), (6, 40), (7, 10)]
    assert sh.find_first_min(histo) == 3
    assert sh.find_peak(histo) == (5, 90)
    decreasing = [(1, 10), (2, 8), (3, 5)]
    assert sh.find_first_min(decreasing) == 0
    assert sh.lim97(decreasing) == (0, 0)
