"""--mendel differential test: all four report files byte-identical."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


def test_mendel_differential(tmp_path):
    from plink_tpu.cli import main

    subprocess.run(
        [ORACLE, "--dummy", "240", "200", "0.06", "--seed", "71", "--out", "mp"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    lines = (tmp_path / "mp.psam").read_text().splitlines()
    rows = [l.split("\t") for l in lines[1:]]
    n = len(rows)
    third = n // 3
    with open(tmp_path / "mp.psam", "w") as f:
        f.write("#FID\tIID\tPAT\tMAT\tSEX\tPHENO1\n")
        for i, (iid, sex, ph) in enumerate(rows):
            if i < 2 * third:
                f.write(f"fam{i//2}\t{iid}\t0\t0\t{1 + (i % 2)}\t{ph}\n")
            else:
                k = i - 2 * third
                f.write(
                    f"fam{k}\t{iid}\t{rows[2*k][0]}\t{rows[2*k+1][0]}\t{sex}\t{ph}\n"
                )
    subprocess.run(
        [ORACLE, "--pfile", "mp", "--mendel", "--out", "o"], cwd=tmp_path,
        check=True, capture_output=True,
    )
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(["--pfile", "mp", "--mendel", "--out", "t"]) == 0
    finally:
        os.chdir(old)
    for ext in ("mendel", "imendel", "fmendel", "lmendel"):
        assert (tmp_path / f"o.{ext}").read_bytes() == (
            tmp_path / f"t.{ext}"
        ).read_bytes(), ext


def test_mendel_xymt_differential(tmp_path):
    """chr1/X/Y/MT mixed panel: male-het zap on X, female/het zap on Y,
    mother-only comparison on MT (codes 9-12)."""
    from plink_tpu.cli import main

    subprocess.run(
        [ORACLE, "--dummy", "240", "200", "0.10", "--seed", "72", "--out", "mp"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    lines = (tmp_path / "mp.psam").read_text().splitlines()
    rows = [l.split("\t") for l in lines[1:]]
    n = len(rows)
    third = n // 3
    with open(tmp_path / "mp.psam", "w") as f:
        f.write("#FID\tIID\tPAT\tMAT\tSEX\tPHENO1\n")
        for i, (iid, sex, ph) in enumerate(rows):
            if i < 2 * third:
                f.write(f"fam{i//2}\t{iid}\t0\t0\t{1 + (i % 2)}\t{ph}\n")
            else:
                k = i - 2 * third
                f.write(
                    f"fam{k}\t{iid}\t{rows[2*k][0]}\t{rows[2*k+1][0]}\t"
                    f"{1 + (k % 2)}\t{ph}\n"
                )
    # respread variants over chr1 / X / Y / MT (keeps sorted order 1<23<24<26)
    plines = (tmp_path / "mp.pvar").read_text().splitlines()
    with open(tmp_path / "mp.pvar", "w") as f:
        f.write(plines[0] + "\n")
        body = plines[1:]
        q = len(body) // 4
        for i, l in enumerate(body):
            cols = l.split("\t")
            cols[0] = ("1", "X", "Y", "MT")[min(i // q, 3)]
            f.write("\t".join(cols) + "\n")
    subprocess.run(
        [ORACLE, "--pfile", "mp", "--mendel", "--out", "o"], cwd=tmp_path,
        check=True, capture_output=True,
    )
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(["--pfile", "mp", "--mendel", "--out", "t"]) == 0
    finally:
        os.chdir(old)
    for ext in ("mendel", "imendel", "fmendel", "lmendel"):
        assert (tmp_path / f"o.{ext}").read_bytes() == (
            tmp_path / f"t.{ext}"
        ).read_bytes(), ext
