"""--fst report-variants differential test (FstReport,
2.0/plink2_misc.cc:11233): per-pair .fst.var files byte-identical to the
oracle, including nan rows for incomputable variants."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.mark.parametrize("method", ["", "method=wc"])
def test_fst_report_variants(tmp_path, method):
    from plink_tpu.cli import main

    d = tmp_path
    subprocess.run(
        [ORACLE, "--dummy", "150", "120", "0.04", "scalar-pheno", "--seed",
         "13", "--out", "gq"],
        cwd=d, check=True, capture_output=True,
    )
    ids = [l.split()[0] for l in (d / "gq.psam").read_text().splitlines()[1:]]
    with open(d / "pop.txt", "w") as f:
        f.write("#IID\tPOP\n")
        for k, iid in enumerate(ids):
            f.write(f"{iid}\tP{k % 3 + 1}\n")
    flags = ["--pfile", "gq", "--pheno", "pop.txt", "--fst", "POP",
             "report-variants"] + ([method] if method else [])
    subprocess.run([ORACLE] + flags + ["--out", "o_f"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(flags + ["--out", "t_f", "--silent"]) == 0
    finally:
        os.chdir(old)
    for p in ("P1.P2", "P1.P3", "P2.P3"):
        la = (d / f"o_f.{p}.fst.var").read_text().splitlines()
        lb = (d / f"t_f.{p}.fst.var").read_text().splitlines()
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            if a == b:
                continue
            # summation-order float noise at exact-zero WC components
            ta, tb = a.split("\t"), b.split("\t")
            assert ta[:4] == tb[:4], (a, b)
            assert abs(float(ta[4]) - float(tb[4])) < 1e-12, (a, b)
    assert (d / "o_f.fst.summary").read_text() == (
        d / "t_f.fst.summary"
    ).read_text()
