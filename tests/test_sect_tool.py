"""`kat sect` parity tests against a pure-Python oracle of
src/sect.cc:490-602 processSeq (median/mean/GC%/invalid semantics, region
extraction off-by-one, contamination-matrix y==0 quirk)."""

import random

import numpy as np
import pytest

import oracle
from kat_tpu.tools.sect import Sect


def _write_fasta(path, named_seqs):
    with open(path, "w") as f:
        for name, s in named_seqs:
            f.write(f">{name}\n{s}\n")


def _oracle_counts(seq, k, hash_counts, canonical):
    """Per-window counts + gc (-1 invalid) like processSeq."""
    out = []
    gcs = []
    for i in range(len(seq) - k + 1):
        sub = seq[i:i + k]
        v = oracle.pack(sub)
        if v is None:
            out.append(0)
            gcs.append(-1)
        else:
            q = min(v, oracle.revcomp(v, k)) if canonical else v
            out.append(hash_counts.get(q, 0))
            gcs.append(oracle.gc_of_packed(v, k))
    return out, gcs


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sect")
    rng = random.Random(3)
    reads = ["".join(rng.choice("ACGT") for _ in range(60))
             for _ in range(40)]
    targets = [
        ("contig1 description here", reads[0] + reads[1]),
        ("contig2", "".join(rng.choice("ACGT") for _ in range(45))),
        ("with_n", reads[2][:20] + "N" + reads[3][:30]),
        ("short", "ACGT"),
        ("allgc", "GCGCGCGCGCGCGCGCGCGCGCGC"),
    ]
    reads_fa = tmp / "reads.fa"
    target_fa = tmp / "target.fa"
    _write_fasta(reads_fa, [(f"r{i}", s) for i, s in enumerate(reads)])
    _write_fasta(target_fa, targets)
    return tmp, reads, targets, str(reads_fa), str(target_fa)


@pytest.fixture(scope="module")
def run(data):
    tmp, reads, targets, reads_fa, target_fa = data
    k = 11
    s = Sect([reads_fa], target_fa)
    s.quiet = True
    s.output_prefix = str(tmp / "out")
    s.input.mer_len = k
    s.input.hash_size = 4096
    s.output_gc_stats = True
    s.extract_r = True
    s.extract_nr = True
    s.execute()
    s.save()
    return s, k, reads, targets, tmp


def test_sect_counts_cvg(run):
    s, k, reads, targets, tmp = run
    hc = oracle.count_seqs(reads, k)
    text = open(str(tmp / "out-counts.cvg")).read().splitlines()
    i = 0
    for name, seq in targets:
        assert text[i] == f">{name}"
        want, _ = _oracle_counts(seq, k, hc, True)
        if len(seq) >= k:
            got = [int(v) for v in text[i + 1].split(" ")]
            assert got == want, name
        else:
            assert text[i + 1] == "0"
        i += 2


def test_sect_stats(run):
    s, k, reads, targets, tmp = run
    hc = oracle.count_seqs(reads, k)
    lines = open(str(tmp / "out-stats.tsv")).read().splitlines()
    assert lines[0].startswith("seq_name\tmedian")
    for (name, seq), ln in zip(targets, lines[1:]):
        cols = ln.split("\t")
        assert cols[0] == name
        n = len(seq)
        nb = n - k + 1
        if nb <= 0:
            assert cols[1] == "0"
            assert cols[5] == str((n - k + 1) % (1 << 32))  # uint32 wrap
            continue
        want, gcs = _oracle_counts(seq, k, hc, True)
        sw = sorted(want)
        assert int(cols[1]) == sw[len(sw) // 2]
        assert abs(float(cols[2]) - sum(want) / nb) < 1e-4
        gs = seq.count("G") + seq.count("C")
        ns = seq.count("N")
        assert abs(float(cols[3]) - gs / (n - ns)) < 1e-4
        assert int(cols[4]) == n
        assert int(cols[6]) == sum(1 for g in gcs if g == -1)
        nz = sum(1 for c in want if c != 0)
        assert int(cols[8]) == nz


def test_sect_gc_counts(run):
    s, k, reads, targets, tmp = run
    hc = oracle.count_seqs(reads, k)
    text = open(str(tmp / "out-counts.gc")).read().splitlines()
    i = 0
    for name, seq in targets:
        assert text[i] == f">{name}"
        if len(seq) >= k:
            _, gcs = _oracle_counts(seq, k, hc, True)
            want = " ".join(
                f"{(-0.1 if g == -1 else g / k * 100.0):.1f}" for g in gcs)
            assert text[i + 1] == want, name
        else:
            assert text[i + 1] == "0.0"
        i += 2


def test_sect_contamination_y0_quirk(run):
    s, k, reads, targets, tmp = run
    mx = open(str(tmp / "out-contamination.mx")).read().splitlines()
    body = [ln for ln in mx if ln and not ln.startswith("#")]
    arr = np.array([[int(v) for v in ln.split(" ")] for ln in body],
                   np.uint64)
    # every base lands in coverage-bin 0 (average_cvg never assigned)
    assert arr[:, 1:].sum() == 0
    # all-GC sequence (gc_perc == 1.0) overflows into the unprinted row
    in_bounds_len = sum(len(seq) for _, seq in targets
                        if (seq.count("G") + seq.count("C")) < len(seq))
    assert arr[:, 0].sum() == in_bounds_len


def test_sect_regions(run):
    s, k, reads, targets, tmp = run
    hc = oracle.count_seqs(reads, k)
    rep = open(str(tmp / "out-repetitive.fa")).read()
    # contig1 = reads[0] + reads[1]: interior windows spanning the junction
    # appear once, others twice?  No — each read counted once, so coverage 1
    # except k-mers occurring in multiple reads.  Just assert format sanity
    # and that regions (if any) respect cov:2+ header.
    for ln in rep.splitlines():
        if ln.startswith(">"):
            assert "_cov:2+" in ln
    nr = open(str(tmp / "out-non_repetitive.fa")).read()
    for ln in nr.splitlines():
        if ln.startswith(">"):
            assert "_cov:1-2" in ln
    # spot-check the region reconstruction skip-base quirk on a synthetic
    # case: counts [2,2,0] over a 13-base seq, k=11 -> region closes at j=2,
    # emitted seq = seq[0:2] + seq[3:12] (base at j==2 skipped).
    from kat_tpu.tools.sect import Sect as S2
    import io
    s2 = S2.__new__(S2)
    s2.input = s.input
    buf = io.StringIO()
    rec = type("R", (), {"name": "x",
                         "seq": b"ACGTACGTACGTA"})()
    counts = [np.array([2, 2, 0], np.uint64)]
    s2._print_regions(buf, [rec], counts, 2, 0)
    lines = buf.getvalue().splitlines()
    assert lines[0] == ">x___region:1_length:11_pos:1:12_cov:2+"
    seq = "ACGTACGTACGTA"
    assert lines[1] == seq[0:2] + seq[3:12]


def test_sect_cvg_logscale_same_y0(data):
    """-l/--cvg_logscale executes the reference's log10 compression path
    (sect.cc:592-598), but because average_cvg is never assigned the
    double->uint16_t conversion of log10(0)*-inf lands in bin 0 exactly
    like the linear path: the contamination matrix must be identical."""
    tmp, reads, targets, reads_fa, target_fa = data
    for logscale, name in ((False, "lin"), (True, "log")):
        s = Sect([reads_fa], target_fa)
        s.output_prefix = str(tmp / f"cvg_{name}")
        s.cvg_logscale = logscale
        s.quiet = True
        s.input.mer_len = 11
        s.execute()
        s.save()
    lin = open(str(tmp / "cvg_lin-contamination.mx")).read()
    log = open(str(tmp / "cvg_log-contamination.mx")).read()
    assert lin == log
    body = [ln for ln in lin.splitlines() if ln and not ln.startswith("#")]
    arr = np.array([[int(v) for v in ln.split(" ")] for ln in body])
    assert arr[:, 1:].sum() == 0 and arr[:, 0].sum() > 0
