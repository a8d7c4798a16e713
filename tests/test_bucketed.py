"""End-to-end bucketed counting (router -> chunked sort -> reduce ->
table merge -> decode) vs the pure-python oracle, interpret-mode kernels
on tiny chunk geometry."""

import numpy as np
import pytest

import oracle
from kat_tpu.core import bucketed, minimizer
from kat_tpu.core.counting import table_to_numpy
from kat_tpu.io import native

pytestmark = [
    pytest.mark.kernel_interpret,
    pytest.mark.skipif(not native.available(),
                       reason="native library unavailable"),
]


def _write_fastq(tmp_path, seqs, name="r.fastq"):
    p = tmp_path / name
    with open(p, "wb") as f:
        for i, s in enumerate(seqs):
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, s.encode(), b"I" * len(s)))
    return str(p)


def _check_counts(table, seqs, k):
    keys, counts = table_to_numpy(table)
    got = dict(zip(keys.tolist(), counts.tolist()))
    want = oracle.count_seqs(seqs, k, canonical=True)
    assert got == dict(want)
    assert np.all(np.diff(keys.astype(object)) > 0)  # sorted, unique


@pytest.mark.parametrize("k", [17, 27])
def test_count_paths_bucketed_matches_oracle(tmp_path, k):
    rng = np.random.default_rng(k)
    # overlapping reads from a small genome -> real multiplicities
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, size=800))
    seqs = []
    for _ in range(120):
        off = int(rng.integers(0, len(genome) - 100))
        seqs.append(genome[off:off + 100])
    seqs[3] = seqs[3][:40] + "N" + seqs[3][41:]  # invalid-base handling
    path = _write_fastq(tmp_path, seqs)
    S = minimizer.rec_windows(k)
    table = bucketed.count_paths_bucketed(
        [path], k, max_chunks=8, rec_per_chunk=1024 // S,
        bucket_bits=6, initial_capacity=1 << 13)
    _check_counts(table, seqs, k)


def test_hot_bucket_group_merge(tmp_path):
    # poly-A floods one bucket -> multi-chunk group -> device group merge
    k = 27
    rng = np.random.default_rng(9)
    seqs = ["A" * 300] * 30
    seqs += ["".join("ACGT"[c] for c in rng.integers(0, 4, size=120))
             for _ in range(20)]
    path = _write_fastq(tmp_path, seqs)
    S = minimizer.rec_windows(k)
    table = bucketed.count_paths_bucketed(
        [path], k, max_chunks=8, rec_per_chunk=1024 // S,
        bucket_bits=6, initial_capacity=1 << 13)
    _check_counts(table, seqs, k)


def test_capacity_growth(tmp_path):
    k = 27
    rng = np.random.default_rng(4)
    seqs = ["".join("ACGT"[c] for c in rng.integers(0, 4, size=120))
            for _ in range(60)]
    path = _write_fastq(tmp_path, seqs)
    S = minimizer.rec_windows(k)
    # tiny initial capacity forces the deferred-overflow replay path
    table = bucketed.count_paths_bucketed(
        [path], k, max_chunks=8, rec_per_chunk=1024 // S,
        bucket_bits=6, initial_capacity=1 << 9)
    _check_counts(table, seqs, k)


def test_hist_cli_minimizer_parity(tmp_path, monkeypatch):
    """`kat hist` byte-parity: classic flush vs the minimizer-bucketed
    flush on the same input."""
    from kat_tpu import cli

    rng = np.random.default_rng(21)
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, size=600))
    seqs = [genome[int(rng.integers(0, 500)):][:90] for _ in range(80)]
    path = _write_fastq(tmp_path, seqs)

    out1 = tmp_path / "classic"
    monkeypatch.setenv("KAT_TPU_MINIMIZER", "0")
    cli.main(["hist", "-m", "27", "-o", str(out1), "-p", "none", path])
    out2 = tmp_path / "mini"
    monkeypatch.setenv("KAT_TPU_MINIMIZER", "1")
    monkeypatch.setenv("KAT_TPU_SMR_CHUNKS", "8")
    cli.main(["hist", "-m", "27", "-o", str(out2), "-p", "none", path])
    assert out1.read_bytes() == out2.read_bytes()


def test_reverse_strand_and_tie_storms(tmp_path):
    """Equal k-mers arriving via opposite strands must encode the SAME
    key' (the tie rule follows the canonical orientation): reads plus
    their reverse complements must exactly double every count, including
    under minimizer-tie storms (poly-A / poly-AT repeats)."""
    k = 27
    rng = np.random.default_rng(31)
    base_seqs = ["".join("ACGT"[c] for c in rng.integers(0, 4, size=90))
                 for _ in range(15)]
    base_seqs += ["A" * 120, "AT" * 60, "AAT" * 40, ("A" * 30 + "C") * 3]
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rcs = ["".join(comp[c] for c in reversed(s)) for s in base_seqs]
    path = _write_fastq(tmp_path, base_seqs + rcs)
    S = minimizer.rec_windows(k)
    table = bucketed.count_paths_bucketed(
        [path], k, max_chunks=8, rec_per_chunk=1024 // S,
        bucket_bits=6, initial_capacity=1 << 13)
    _check_counts(table, base_seqs + rcs, k)


def test_k29_two_window_records(tmp_path):
    """k=29 rides the S=2 record geometry (2(k-1+S)+3 = 63 bits) — the
    other record width the router/expander support."""
    k = 29
    assert minimizer.rec_windows(k) == 2
    rng = np.random.default_rng(8)
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, size=700))
    seqs = [genome[int(rng.integers(0, 580)):][:110] for _ in range(70)]
    path = _write_fastq(tmp_path, seqs)
    table = bucketed.count_paths_bucketed(
        [path], k, max_chunks=8, rec_per_chunk=1024 // 2,
        bucket_bits=6, initial_capacity=1 << 13)
    _check_counts(table, seqs, k)


def test_gcp_comp_cli_minimizer_parity(tmp_path, monkeypatch):
    """gcp and comp artifacts byte-identical between the classic and
    bucketed counting paths (the analysis layer must see identical
    tables after finish() decode)."""
    from kat_tpu import cli

    rng = np.random.default_rng(23)
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, size=700))
    s1 = [genome[int(rng.integers(0, 560)):][:100] for _ in range(60)]
    s2 = [genome[int(rng.integers(0, 560)):][:100] for _ in range(50)]
    p1 = _write_fastq(tmp_path, s1, "a.fastq")
    p2 = _write_fastq(tmp_path, s2, "b.fastq")

    outs = {}
    for tag, env in (("classic", "0"), ("mini", "1")):
        monkeypatch.setenv("KAT_TPU_MINIMIZER", env)
        monkeypatch.setenv("KAT_TPU_SMR_CHUNKS", "8")
        g = tmp_path / f"g_{tag}"
        assert cli.main(["gcp", "-m", "27", "-o", str(g), "-p", "none",
                         p1]) == 0
        c = tmp_path / f"c_{tag}"
        assert cli.main(["comp", "-m", "17", "-o", str(c), "-p", "none",
                         p1, p2]) == 0
        outs[tag] = ((g.with_suffix(".mx")).read_bytes(),
                     (tmp_path / f"c_{tag}-main.mx").read_bytes(),
                     (tmp_path / f"c_{tag}.stats").read_bytes())
    assert outs["classic"] == outs["mini"]


def test_deferred_runs_mode_matches_oracle(tmp_path, monkeypatch):
    """KAT_TPU_BUCKETED_RUNS: pre-reduced runs defer the table merge;
    counts must stay exact, including through capacity growth."""
    monkeypatch.setenv("KAT_TPU_BUCKETED_RUNS", "2")
    k = 27
    rng = np.random.default_rng(41)
    genome = "".join("ACGT"[c] for c in rng.integers(0, 4, size=800))
    seqs = [genome[int(rng.integers(0, 680)):][:100] for _ in range(120)]
    path = _write_fastq(tmp_path, seqs)
    S = minimizer.rec_windows(k)
    table = bucketed.count_paths_bucketed(
        [path], k, max_chunks=8, rec_per_chunk=1024 // S,
        bucket_bits=6, initial_capacity=1 << 9)  # forces growth too
    _check_counts(table, seqs, k)
