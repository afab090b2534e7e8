"""--indep-pairwise tests: banded Gram statistics vs brute-force numpy, and
byte-identical differential checks against the plink2 oracle across window
specs (count and kb modes)."""

import os
import subprocess

import numpy as np
import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")


def test_ld_band_stats_match_bruteforce(geno_factory):
    from plink_tpu.ops.ld import LdBand
    from plink_tpu.ops.pairwise import _pack_np

    codes = geno_factory(60, 37, missing_rate=0.15)
    n = codes.shape[1]
    npad = -(-n // 4) * 4
    packed = _pack_np(codes, npad)
    smask = np.zeros(npad, np.int8)
    smask[:n] = 1
    band = LdBand(packed, smask, width=20, chunk=16)

    x = np.where(codes == 0, 1, np.where(codes == 2, -1, 0)).astype(np.int64)
    valid = (codes != 3).astype(np.int64)
    xv = x * valid
    for i in range(60):
        for d in range(1, 21):
            j = i + d
            if j >= 60:
                break
            v = valid[i] & valid[j]
            assert band.pair("nm", i, j) == v.sum()
            assert band.pair("dot", i, j) == (xv[i] * xv[j]).sum()
            assert band.pair("sum_i", i, j) == (xv[i] * v).sum()
            assert band.pair("sum_j", i, j) == (xv[j] * v).sum()
            assert band.pair("ssq_i", i, j) == (xv[i] * xv[i] * v).sum()
            assert band.pair("ssq_j", i, j) == (xv[j] * xv[j] * v).sum()
    # per-variant aggregates
    assert (band.nm1 == valid.sum(1)).all()
    assert (band.homref1 == ((codes == 0) * valid).sum(1)).all()
    assert (band.homalt1 == ((codes == 2) * valid).sum(1)).all()


@pytest.mark.skipif(not os.path.exists(ORACLE), reason="plink2 oracle not built")
@pytest.mark.parametrize(
    "spec",
    [["50", "5", "0.2"], ["100", "10", "0.5"], ["200kb", "1", "0.3"],
     ["75", "1", "0.8"]],
)
def test_indep_pairwise_differential(tmp_path, spec):
    from plink_tpu.cli import main

    subprocess.run(
        [ORACLE, "--dummy", "400", "300", "0.05", "--seed", "31", "--out", "lp"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    subprocess.run(
        [ORACLE, "--pfile", "lp", "--indep-pairwise", *spec, "--out", "o"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    old = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(["--pfile", "lp", "--indep-pairwise", *spec, "--out", "t"]) == 0
    finally:
        os.chdir(old)
    assert (tmp_path / "o.prune.in").read_bytes() == (tmp_path / "t.prune.in").read_bytes()
    assert (tmp_path / "o.prune.out").read_bytes() == (tmp_path / "t.prune.out").read_bytes()
