"""--sample-diff and --pgen-diff differential tests."""

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
    d = tmp_path_factory.mktemp("diffcmds")
    subprocess.run(
        [ORACLE, "--dummy", "120", "150", "0.05", "--seed", "29", "--out", "dp"],
        cwd=d, check=True, capture_output=True,
    )
    return d


def _run_both(d, flags, stem_o, stem_t):
    from plink_tpu.cli import main

    subprocess.run([ORACLE] + flags + ["--out", stem_o], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(flags + ["--out", stem_t]) == 0
    finally:
        os.chdir(old)


def test_sample_diff(panel):
    flags = ["--pfile", "dp", "--sample-diff", "ids=per0", "per3", "per7"]
    _run_both(panel, flags, "os", "ts")
    assert (panel / "os.sdiff").read_bytes() == (panel / "ts.sdiff").read_bytes()
    assert (panel / "os.sdiff.summary").read_bytes() == (
        panel / "ts.sdiff.summary"
    ).read_bytes()


def test_sample_diff_base(panel):
    flags = ["--pfile", "dp", "--sample-diff", "counts-only", "base=per1",
             "per2", "per5"]
    _run_both(panel, flags, "ob", "tb")
    assert (panel / "ob.sdiff.summary").read_bytes() == (
        panel / "tb.sdiff.summary"
    ).read_bytes()


def test_pgen_diff(panel):
    import sys

    sys.path.insert(0, "/root/repo")
    from plink_tpu.dataset import load_dataset
    from plink_tpu.io.pgen_write import PgenWriter
    from plink_tpu.io.psam import write_psam
    from plink_tpu.io.pvar import write_pvar
    from plink_tpu.ops.pairwise import _unpack_np

    old = os.getcwd()
    os.chdir(panel)
    try:
        ds = load_dataset("dp")
        codes = _unpack_np(ds.reader.read_packed(0, 150))[:, :120]
        rng = np.random.default_rng(5)
        codes2 = codes.copy()
        flip = rng.random(codes.shape) < 0.02
        codes2[flip] = (codes2[flip] + 1) % 4
        with PgenWriter("dpm.pgen", 120, 150) as w:
            w.append_codes(codes2)
        write_pvar("dpm.pvar", ds.vi)
        write_psam("dpm.psam", ds.si)
    finally:
        os.chdir(old)
    flags = ["--pfile", "dp", "--pgen-diff", "dpm"]
    _run_both(panel, flags, "op", "tp")
    assert (panel / "op.pdiff").read_bytes() == (panel / "tp.pdiff").read_bytes()
