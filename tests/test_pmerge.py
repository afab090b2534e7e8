"""--pmerge / --pmerge-list concatenation tests (Pmerge,
2.0/plink2_merge.cc:7019): merged trio matches the oracle byte-for-byte
(pvar/psam) and genotype-exactly (oracle reads our merged .pgen), and
non-concatenating jobs raise the reference's error."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("pmerge")
    subprocess.run(
        [ORACLE, "--dummy", "80", "60", "0.04", "scalar-pheno", "--seed",
         "31", "--out", "gq"],
        cwd=d, check=True, capture_output=True,
    )
    for name, lo, hi in (("part1", 0, 29), ("part2", 30, 999)):
        subprocess.run(
            [ORACLE, "--pfile", "gq", "--chr", "1", "--from-bp", str(lo),
             "--to-bp", str(hi), "--make-pgen", "--out", name],
            cwd=d, check=True, capture_output=True,
        )
    (d / "mlist.txt").write_text("part1\npart2\n")
    return d


def test_pmerge_concat(panel):
    from plink_tpu.cli import main

    d = panel
    subprocess.run(
        [ORACLE, "--pfile", "part1", "--pmerge", "part2", "--out", "o_m"],
        cwd=d, check=True, capture_output=True,
    )
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--pfile", "part1", "--pmerge", "part2", "--out", "t_m",
                     "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_m.pvar").read_text() == (d / "t_m.pvar").read_text()
    assert (d / "o_m.psam").read_text() == (d / "t_m.psam").read_text()
    for stem in ("o_m", "t_m"):
        subprocess.run(
            [ORACLE, "--pfile", stem, "--freq", "--out", f"{stem}_f"],
            cwd=d, check=True, capture_output=True,
        )
    assert (d / "o_m_f.afreq").read_text() == (d / "t_m_f.afreq").read_text()


def test_pmerge_list(panel):
    from plink_tpu.cli import main

    d = panel
    subprocess.run(
        [ORACLE, "--pmerge-list", "mlist.txt", "--out", "o_l"],
        cwd=d, check=True, capture_output=True,
    )
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--pmerge-list", "mlist.txt", "--out", "t_l",
                     "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_l.pvar").read_text() == (d / "t_l.pvar").read_text()
    assert (d / "o_l.psam").read_text() == (d / "t_l.psam").read_text()


def test_pmerge_nonconcat_errors(panel):
    from plink_tpu.cli import main

    d = panel
    old = os.getcwd()
    os.chdir(d)
    try:
        with pytest.raises(ValueError, match="Non-concatenating"):
            main(["--pfile", "part1", "--pmerge", "part1", "--out", "t_x",
                  "--silent"])
    finally:
        os.chdir(old)
