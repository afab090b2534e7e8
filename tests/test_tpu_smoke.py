"""TPU-resident smoke tests (VERDICT r3 weak #9: TPU numerics were only
exercised by bench parity).  Each test runs a production command in a
SUBPROCESS on the real TPU backend (the test-suite conftest pins the CPU
backend in-process) and diffs the reports against the plink2 oracle.
Skipped when no TPU is reachable."""

import functools
import os
import subprocess
import sys

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")


@functools.lru_cache(maxsize=1)
def _tpu_available() -> bool:
    """Probe for a live TPU in a subprocess (the tunnel can hang; cap it)."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "print('TPUOK' if d and d[0].platform != 'cpu' else 'NO')"],
            capture_output=True, timeout=150, text=True, env=env,
        )
        return "TPUOK" in r.stdout
    except subprocess.TimeoutExpired:
        return False


pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


def _run_tpu_cli(args, cwd):
    """Run our CLI in a fresh process on the TPU backend."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "plink_tpu.cli"] + args + ["--silent"],
        cwd=cwd, env=env, capture_output=True, timeout=600, text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    if not _tpu_available():
        pytest.skip("no TPU backend reachable")
    d = tmp_path_factory.mktemp("tpusmoke")
    subprocess.run(
        [ORACLE, "--dummy", "500", "400", "0.03", "--seed", "21",
         "--out", "p"],
        cwd=d, check=True, capture_output=True,
    )
    return d


def test_tpu_freq_missing_hardy(panel):
    d = panel
    args = ["--pfile", "p", "--freq", "--missing", "--hardy"]
    subprocess.run([ORACLE] + args + ["--out", "o"], cwd=d, check=True,
                   capture_output=True)
    _run_tpu_cli(args + ["--out", "t"], str(d))
    for ext in (".afreq", ".vmiss", ".smiss", ".hardy"):
        assert (d / ("o" + ext)).read_text() == (d / ("t" + ext)).read_text()


def test_tpu_king_table(panel):
    d = panel
    args = ["--pfile", "p", "--make-king-table"]
    subprocess.run([ORACLE] + args + ["--out", "o"], cwd=d, check=True,
                   capture_output=True)
    _run_tpu_cli(args + ["--out", "t"], str(d))
    assert (d / "o.kin0").read_text() == (d / "t.kin0").read_text()


def test_tpu_grm(panel):
    import numpy as np

    d = panel
    args = ["--pfile", "p", "--make-grm-bin"]
    subprocess.run([ORACLE] + args + ["--out", "o"], cwd=d, check=True,
                   capture_output=True)
    _run_tpu_cli(args + ["--out", "t"], str(d))
    a = np.fromfile(d / "o.grm.bin", np.float32)
    b = np.fromfile(d / "t.grm.bin", np.float32)
    assert a.shape == b.shape
    assert np.allclose(a, b, rtol=2e-4, atol=2e-5)
    na = np.fromfile(d / "o.grm.N.bin", np.float32)
    nb = np.fromfile(d / "t.grm.N.bin", np.float32)
    assert np.array_equal(na, nb)


def test_tpu_glm(panel):
    import numpy as np

    d = panel
    rng = np.random.default_rng(3)
    ids = [l.split("\t")[0]
           for l in (d / "p.psam").read_text().splitlines()[1:]]
    with open(d / "p.cov", "w") as f:
        f.write("#IID\tC1\n")
        for iid in ids:
            f.write(f"{iid}\t{rng.normal():.6f}\n")
    args = ["--pfile", "p", "--glm", "hide-covar", "--covar", "p.cov"]
    subprocess.run([ORACLE] + args + ["--out", "o"], cwd=d, check=True,
                   capture_output=True)
    _run_tpu_cli(args + ["--out", "t"], str(d))

    def load(path):
        with open(path) as f:
            hdr = f.readline().rstrip("\n").split("\t")
            ii, ip = hdr.index("ID"), hdr.index("P")
            return {l.split("\t")[ii]: l.split("\t")[ip] for l in f}

    a = load(d / "o.PHENO1.glm.logistic.hybrid")
    b = load(d / "t.PHENO1.glm.logistic.hybrid")
    assert set(a) == set(b)
    for k, va in a.items():
        vb = b[k]
        if va == "NA" or vb == "NA":
            assert va == vb, k
        else:
            fa, fb = float(va), float(vb)
            assert abs(fa - fb) <= 1e-3 * max(abs(fa), 1e-8) + 1e-9, \
                (k, va, vb)
