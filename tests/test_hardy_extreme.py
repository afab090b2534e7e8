"""Extreme-regime HWE p-values (ref: HweLnP with double-double tail sums,
2.0/include/plink2_highprec.h:36-60; lntoa_g mantissa-x-10^-exp output,
2.0/README.md:96-100): --hardy output distinguishes 1e-36893 from
1e-301027 and is byte-identical to the oracle."""

import os
import subprocess

import numpy as np
import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")
pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def extreme_panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("xp")
    n = 1_000_000
    rng = np.random.default_rng(1)
    variants = [np.ones(n, np.int8)]                    # all het
    g = np.zeros(n, np.int8); g[: n // 2] = 1
    variants.append(g)                                  # half het
    variants.append(
        rng.choice([0, 1, 2], size=n, p=[0.49, 0.42, 0.09]).astype(np.int8))
    g = np.zeros(n, np.int8); g[: n // 2] = 2
    variants.append(g)                                  # no hets, maf .5
    codes = np.stack(variants).astype(np.uint8)
    from plink_tpu.io.pgen_write import write_pgen_simple
    from plink_tpu.ops.pairwise import _pack_np

    packed = _pack_np(codes, -(-n // 4) * 4)
    write_pgen_simple(str(d / "x.pgen"), packed, n)
    with open(d / "x.pvar", "w") as f:
        f.write("#CHROM\tPOS\tID\tREF\tALT\n")
        for i in range(4):
            f.write(f"1\t{i+1}\tv{i}\tA\tC\n")
    with open(d / "x.psam", "w") as f:
        f.write("#IID\tSEX\n")
        for i in range(n):
            f.write(f"s{i}\t1\n")
    return d


@pytest.mark.parametrize("midp", [False, True])
def test_hardy_extreme_byte_identical(extreme_panel, midp):
    from plink_tpu.cli import main

    d = extreme_panel
    tag = "m" if midp else "p"
    args = ["--pfile", "x", "--hardy"] + (["midp"] if midp else [])
    subprocess.run(
        [ORACLE] + args + ["--out", f"o{tag}"],
        cwd=d, check=True, capture_output=True,
    )
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(args + ["--out", f"t{tag}", "--silent"]) == 0
    finally:
        os.chdir(old)
    assert (d / f"o{tag}.hardy").read_text() == (d / f"t{tag}.hardy").read_text()
    if not midp:
        body = (d / "ot.hardy") if False else (d / f"o{tag}.hardy")
        txt = body.read_text()
        assert "e-301027" in txt and "e-36893" in txt


def test_hwe_lnp_distinguishes_magnitudes():
    from plink_tpu.stats.hwe import hwe_exact_lnpvals
    from plink_tpu.utils.fmt import logp_to_str

    lnp = hwe_exact_lnpvals(
        np.array([0, 500000]), np.array([1000000, 500000]),
        np.array([0, 0]))
    s0, s1 = logp_to_str(lnp[0]), logp_to_str(lnp[1])
    assert s0 == "1.79167e-301027"
    assert s1 == "1.20478e-36893"
