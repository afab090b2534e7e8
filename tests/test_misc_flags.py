"""--genotyping-rate / --pgen-info / --validate / --maj-ref /
--recover-var-ids / --indiv-sort differential tests."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("miscflags")
    subprocess.run(
        [ORACLE, "--dummy", "50", "40", "0.1", "--seed", "2", "--out", "gp"],
        cwd=d, check=True, capture_output=True,
    )
    return d


def _our_log(d, flags, out):
    from plink_tpu.cli import main

    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(flags + ["--out", out, "--silent"]) == 0
    finally:
        os.chdir(old)
    return (d / f"{out}.log").read_text().splitlines()


def test_info_log_lines(panel):
    d = panel
    subprocess.run(
        [ORACLE, "--pfile", "gp", "--genotyping-rate", "--pgen-info",
         "--validate", "--out", "o_i"],
        cwd=d, check=True, capture_output=True,
    )
    olog = (d / "o_i.log").read_text().splitlines()
    tlog = _our_log(d, ["--pfile", "gp", "--genotyping-rate", "--pgen-info",
                        "--validate"], "t_i")
    for key in ("genotyping rate is", "Variants: ", "Samples: ",
                "REF alleles", "phased", "dosages", "Validating"):
        o = [l for l in olog if key in l]
        t = [l for l in tlog if key in l]
        assert o and t and o[0] == t[0], (key, o[:1], t[:1])


def test_maj_ref(panel):
    from plink_tpu.cli import main

    d = panel
    flags = ["--pfile", "gp", "--maj-ref", "--export", "A"]
    subprocess.run([ORACLE] + flags + ["--out", "o_m"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(flags + ["--out", "t_m", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_m.raw").read_text() == (d / "t_m.raw").read_text()


def test_recover_var_ids(panel):
    from plink_tpu.cli import main

    d = panel
    subprocess.run([ORACLE, "--pfile", "gp", "--set-all-var-ids", "@:#",
                    "--make-pgen", "--out", "renamed"], cwd=d, check=True,
                   capture_output=True)
    flags = ["--pfile", "renamed", "--recover-var-ids", "gp.pvar",
             "--make-just-pvar"]
    subprocess.run([ORACLE] + flags + ["--out", "o_r"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(flags + ["--out", "t_r", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_r.pvar").read_text() == (d / "t_r.pvar").read_text()


def test_indiv_sort_ascii(panel):
    from plink_tpu.cli import main

    d = panel
    flags = ["--pfile", "gp", "--indiv-sort", "ascii", "--make-pgen"]
    subprocess.run([ORACLE] + flags + ["--out", "o_s"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(flags + ["--out", "t_s", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / "o_s.psam").read_text() == (d / "t_s.psam").read_text()
    for stem in ("o_s", "t_s"):
        subprocess.run([ORACLE, "--pfile", stem, "--missing", "--out",
                        f"{stem}_m"], cwd=d, check=True, capture_output=True)
    assert (d / "o_s_m.smiss").read_text() == (d / "t_s_m.smiss").read_text()
