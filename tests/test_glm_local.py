"""--glm local-covar=/local-psam=/local-pvar= differential tests
(GlmLocalOpen, 2.0/plink2_glm.cc:751): analysis restricted to the
local-pvar variant list with one covariate line each, LOCALk TEST rows
preceding file covariates."""

import os
import subprocess

import numpy as np
import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("glmlocal")
    for name, extra in (("gq", ["scalar-pheno"]), ("gp", [])):
        subprocess.run(
            [ORACLE, "--dummy", "200", "120", "0.04"] + extra
            + ["--seed", "13", "--out", name],
            cwd=d, check=True, capture_output=True,
        )
    rng = np.random.default_rng(8)
    ids = [l.split()[0] for l in (d / "gq.psam").read_text().splitlines()[1:]]
    (d / "loc.psam").write_text("#IID\n" + "".join(f"{i}\n" for i in ids))
    pvar = (d / "gq.pvar").read_text().splitlines()
    sel = pvar[1::30]
    (d / "loc.pvar").write_text(pvar[0] + "\n" + "\n".join(sel) + "\n")
    with open(d / "loc.cov", "w") as f:
        for _ in sel:
            f.write(" ".join(
                f"{rng.normal():.4f} {rng.normal():.4f}" for _ in ids
            ) + "\n")
    with open(d / "g.cov", "w") as f:
        f.write("#IID\tC1\n")
        for iid in ids:
            f.write(f"{iid}\t{rng.normal():.5f}\n")
    return d


def _compare(a, b, tol=1e-3):
    la = open(a).read().splitlines()
    lb = open(b).read().splitlines()
    assert la[0] == lb[0]
    assert len(la) == len(lb)
    for x, y in zip(la[1:], lb[1:]):
        for u, v in zip(x.split("\t"), y.split("\t")):
            if u == v:
                continue
            fu, fv = float(u), float(v)
            sape = abs(fu - fv) / max((abs(fu) + abs(fv)) / 2, 1e-300)
            assert min(sape, abs(fu - fv)) < tol, (x, y)


@pytest.mark.parametrize(
    "pfx,extra,suffix",
    [
        ("gq", [], "PHENO1.glm.linear"),
        ("gp", [], "PHENO1.glm.logistic.hybrid"),
        ("gq", ["--covar", "g.cov"], "PHENO1.glm.linear"),
    ],
)
def test_glm_local(panel, pfx, extra, suffix):
    from plink_tpu.cli import main

    d = panel
    flags = ["--pfile", pfx, "--glm", "local-covar=loc.cov",
             "local-psam=loc.psam", "local-pvar=loc.pvar"] + extra
    subprocess.run([ORACLE] + flags + ["--out", "o_l"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(flags + ["--out", "t_l", "--silent"]) == 0
    finally:
        os.chdir(old)
    _compare(d / f"o_l.{suffix}", d / f"t_l.{suffix}")
