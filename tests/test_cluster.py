"""--cluster / --neighbour / --mds-plot parity, byte-diffed against a
locally built plink 1.9 binary (calc_cluster_neighbor, plink_calc.c:8258)."""

import os
import subprocess

import pytest

ORACLE2 = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")
ORACLE19 = os.environ.get("PLINK19_ORACLE", "/tmp/oracle19/plink")
pytestmark = pytest.mark.skipif(
    not (os.path.exists(ORACLE19) and os.path.exists(ORACLE2)),
    reason="plink 1.9 oracle not built",
)


def run19(args, cwd):
    subprocess.run([ORACLE19] + args, cwd=cwd, check=True, capture_output=True)


def run_tpu(args, cwd):
    from plink_tpu.cli import main

    old = os.getcwd()
    os.chdir(cwd)
    try:
        assert main(args) == 0
    finally:
        os.chdir(old)


@pytest.fixture(scope="module")
def bed_panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("clust")
    subprocess.run(
        [ORACLE2, "--dummy", "60", "300", "0.05", "--seed", "7",
         "--out", "pp"], cwd=d, check=True, capture_output=True,
    )
    subprocess.run(
        [ORACLE2, "--pfile", "pp", "--make-bed", "--out", "pb"],
        cwd=d, check=True, capture_output=True,
    )
    return d


def _pair(d, extra, o, t):
    run19(["--bfile", "pb"] + extra + ["--allow-no-sex", "--out", o], str(d))
    run_tpu(["--bfile", "pb"] + extra
            + ["--allow-no-sex", "--out", t, "--silent"], str(d))


def _cmp(d, o, t, exts):
    for e in exts:
        assert (d / (o + e)).read_bytes() == (d / (t + e)).read_bytes(), e


CLUSTER123 = (".cluster1", ".cluster2", ".cluster3")


def test_default_complete_linkage(bed_panel):
    _pair(bed_panel, ["--cluster"], "o1", "t1")
    _cmp(bed_panel, "o1", "t1", CLUSTER123)


def test_cc_K(bed_panel):
    _pair(bed_panel, ["--cluster", "cc", "--K", "5"], "o2", "t2")
    _cmp(bed_panel, "o2", "t2", CLUSTER123)


def test_group_avg_mc(bed_panel):
    _pair(bed_panel, ["--cluster", "group-avg", "--mc", "10"], "o3", "t3")
    _cmp(bed_panel, "o3", "t3", CLUSTER123)


def test_missing_ibm_matrix(bed_panel):
    _pair(bed_panel, ["--cluster", "missing"], "o4", "t4")
    _cmp(bed_panel, "o4", "t4",
         (".cluster1", ".cluster2", ".cluster3.missing", ".mdist.missing"))


def test_only2_ppc(bed_panel):
    _pair(bed_panel, ["--cluster", "only2", "--ppc", "0.01"], "o5", "t5")
    _cmp(bed_panel, "o5", "t5", (".cluster2",))


def test_old_tiebreaks_mcc(bed_panel):
    _pair(bed_panel, ["--cluster", "old-tiebreaks", "--mcc", "5", "7"],
          "o6", "t6")
    _cmp(bed_panel, "o6", "t6", CLUSTER123)


def test_ppc_gap(bed_panel):
    _pair(bed_panel, ["--cluster", "--ppc", "0.05", "--ppc-gap", "200"],
          "o7", "t7")
    _cmp(bed_panel, "o7", "t7", CLUSTER123)


def test_neighbour(bed_panel):
    _pair(bed_panel, ["--cluster", "--neighbour", "1", "5"], "o8", "t8")
    _cmp(bed_panel, "o8", "t8", (".nearest",) + CLUSTER123)


def test_neighbour_ppc_offset_rows(bed_panel):
    # n1>1 exercises the reference's row-0-based value / n1-based Z quirk
    _pair(bed_panel, ["--neighbour", "2", "4", "--ppc", "0.01"], "o9", "t9")
    _cmp(bed_panel, "o9", "t9", (".nearest",))


def test_mds_svd(bed_panel):
    _pair(bed_panel, ["--cluster", "--mds-plot", "4"], "o10", "t10")
    _cmp(bed_panel, "o10", "t10", (".mds",))


def test_mds_eigendecomp_eigvals(bed_panel):
    _pair(bed_panel,
          ["--cluster", "--mds-plot", "3", "eigendecomp", "eigvals"],
          "o11", "t11")
    _cmp(bed_panel, "o11", "t11", (".mds", ".mds.eigvals"))


def test_mds_by_cluster(bed_panel):
    _pair(bed_panel, ["--cluster", "--K", "6", "--mds-plot", "2",
                      "by-cluster"], "o12", "t12")
    _cmp(bed_panel, "o12", "t12", (".mds",))


def test_mds_by_cluster_eigendecomp(bed_panel):
    _pair(bed_panel, ["--cluster", "--K", "4", "--mds-plot", "3",
                      "by-cluster", "eigendecomp", "eigvals"], "o13", "t13")
    _cmp(bed_panel, "o13", "t13", (".mds", ".mds.eigvals"))
