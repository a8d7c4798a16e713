"""CLI smoke tests: every mode end-to-end through kat_tpu.cli.main, the
analogue of the reference's shell integration tier (tests/test_*.sh —
exit-0 smoke on small data)."""

import random

import pytest

from kat_tpu import cli


def _write_fasta(path, named):
    with open(path, "w") as f:
        for name, s in named:
            f.write(f">{name}\n{s}\n")


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    rng = random.Random(1)
    reads = [("r%d" % i, "".join(rng.choice("ACGT") for _ in range(60)))
             for i in range(30)]
    asm = [("c1", reads[0][1] + reads[1][1])]
    r1 = tmp / "r1.fa"
    r2 = tmp / "r2.fa"
    a = tmp / "asm.fa"
    _write_fasta(r1, reads[:15])
    _write_fasta(r2, reads[15:])
    _write_fasta(a, asm)
    return tmp, str(r1), str(r2), str(a)


def test_cli_hist(files, capsys):
    tmp, r1, r2, a = files
    rc = cli.main(["hist", "-o", str(tmp / "h"), "-m", "11", "-H", "4096",
                   r1])
    assert rc == 0
    assert (tmp / "h").exists()


def test_cli_gcp(files):
    tmp, r1, r2, a = files
    rc = cli.main(["gcp", "-o", str(tmp / "g"), "-m", "11", "-H", "4096",
                   r1])
    assert rc == 0
    assert (tmp / "g.mx").exists()


def test_cli_comp(files):
    tmp, r1, r2, a = files
    rc = cli.main(["comp", "-o", str(tmp / "c"), "-m", "11", "-H", "4096",
                   "-I", "4096", r1, r2])
    assert rc == 0
    assert (tmp / "c-main.mx").exists()
    assert (tmp / "c.stats").exists()


def test_cli_comp_three_inputs(files):
    tmp, r1, r2, a = files
    rc = cli.main(["comp", "-o", str(tmp / "c3"), "-m", "11", "-H", "4096",
                   "-I", "4096", "-J", "4096", r1, r2, a])
    assert rc == 0
    for suffix in ("-main.mx", "-ends.mx", "-middle.mx", "-mixed.mx"):
        assert (tmp / ("c3" + suffix)).exists()


def test_cli_sect(files):
    tmp, r1, r2, a = files
    rc = cli.main(["sect", "-o", str(tmp / "s"), "-m", "11", "-H", "4096",
                   a, r1])
    assert rc == 0
    assert (tmp / "s-stats.tsv").exists()
    assert (tmp / "s-counts.cvg").exists()
    assert (tmp / "s-contamination.mx").exists()


def test_cli_cold(files):
    tmp, r1, r2, a = files
    rc = cli.main(["cold", "-o", str(tmp / "co"), "-m", "11", "-H", "4096",
                   a, r1])
    assert rc == 0
    assert (tmp / "co-stats.tsv").exists()


def test_cli_filter_kmer(files):
    tmp, r1, r2, a = files
    rc = cli.main(["filter", "kmer", "-o", str(tmp / "fk"), "-m", "11",
                   "-H", "4096", r1])
    assert rc == 0
    assert (tmp / "fk-in.jf11").exists()


def test_cli_filter_seq(files):
    tmp, r1, r2, a = files
    rc = cli.main(["filter", "seq", "-o", str(tmp / "fs"), "-m", "11",
                   "-H", "4096", "-T", "0.5", "--seq", a, r1])
    assert rc == 0
    assert (tmp / "fs.in.fa").exists()


def test_cli_version_and_help(capsys):
    with pytest.raises(SystemExit):
        cli.main(["--version"])
    out = capsys.readouterr().out
    assert "kat" in out
