"""Phased-dosage (dphase) differential tests.

Covers the full triangle against the plink2 oracle on a VCF with
GT + DS + HDS fields:
  1. import parity: ours and plink2 each --vcf dosage=HDS --make-pgen,
     then each exports its own pgen with vcf-dosage=HDS-force and the
     body lines must match byte-for-byte;
  2. read parity: our CLI exports *plink2's* pgen (validates our decoder
     against plink2's dphase writer, aux tracks #7-8);
  3. write parity: plink2 exports *our* pgen (validates our writer
     against plink2's decoder).

Reference semantics: ParseVcfBiallelicHds (2.0/plink2_import.cc:1034),
VcfConvertPhasedBiallelicDosageLine (:1220), ApplyHardCallThreshPhased
(2.0/plink2_data.cc:3377), PrintHdsPair (2.0/plink2_export.cc:3830),
pgen aux tracks #7-8 (pgen_spec/pgen_spec.tex:650-671).
"""

import os
import subprocess

import numpy as np
import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


def _mk_vcf(path, n_samples=37, n_variants=25, seed=7):
    """Random VCF with GT:DS:HDS covering phased/unphased, integer and
    fractional haplotype dosages, and missing calls."""
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.3\n")
        f.write("##contig=<ID=1>\n")
        f.write('##FORMAT=<ID=GT,Number=1,Type=String,Description="G">\n')
        f.write('##FORMAT=<ID=DS,Number=A,Type=Float,Description="D">\n')
        f.write('##FORMAT=<ID=HDS,Number=.,Type=Float,Description="H">\n')
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
                + "".join(f"\ts{k}" for k in range(n_samples)) + "\n")
        for v in range(n_variants):
            cells = []
            for s in range(n_samples):
                kind = rng.integers(0, 8)
                if kind == 0:
                    cells.append("./.")
                    continue
                h1 = round(float(rng.random()), 3)
                h2 = round(float(rng.random()), 3)
                if kind == 1:
                    h1 = float(rng.integers(0, 2))  # one side integer
                elif kind == 2:
                    h1, h2 = float(rng.integers(0, 2)), float(rng.integers(0, 2))
                g1, g2 = int(h1 >= 0.5), int(h2 >= 0.5)
                phased = kind != 3
                sep = "|" if phased else "/"
                ds = round(h1 + h2, 3)
                if kind == 4:
                    # DS only, phased GT (tests GT-phase + unphased dosage)
                    cells.append(f"{g1}{sep}{g2}:{ds}:.")
                elif kind == 5:
                    cells.append(f"{g1}{sep}{g2}:.:.")  # hardcall only
                else:
                    cells.append(f"{g1}{sep}{g2}:{ds}:{h1},{h2}")
            f.write(f"1\t{100 + v}\tv{v}\tA\tC\t.\t.\t.\tGT:DS:HDS\t"
                    + "\t".join(cells) + "\n")


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("dphase")
    _mk_vcf(d / "in.vcf")
    subprocess.run(
        [ORACLE, "--vcf", "in.vcf", "dosage=HDS", "--make-pgen", "--out",
         "o_p"], cwd=d, check=True, capture_output=True)
    from plink_tpu.cli import main

    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--vcf", "in.vcf", "dosage=HDS", "--make-pgen",
                     "--out", "t_p", "--silent"]) == 0
    finally:
        os.chdir(old)
    return d


def _body(path):
    return [l for l in open(path).read().splitlines()
            if not l.startswith("##")]


def _our_export(d, pfx, out, mode="HDS-force"):
    from plink_tpu.cli import main

    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--pfile", pfx, "--export", "vcf",
                     f"vcf-dosage={mode}", "--out", out, "--silent"]) == 0
    finally:
        os.chdir(old)


def test_import_parity(panel):
    d = panel
    subprocess.run([ORACLE, "--pfile", "o_p", "--export", "vcf",
                    "vcf-dosage=HDS-force", "--out", "o_x"], cwd=d,
                   check=True, capture_output=True)
    _our_export(d, "t_p", "t_x")
    assert _body(d / "o_x.vcf") == _body(d / "t_x.vcf")


def test_read_parity_on_oracle_pgen(panel):
    d = panel
    subprocess.run([ORACLE, "--pfile", "o_p", "--export", "vcf",
                    "vcf-dosage=HDS-force", "--out", "o_x2"], cwd=d,
                   check=True, capture_output=True)
    _our_export(d, "o_p", "t_on_o")
    assert _body(d / "o_x2.vcf") == _body(d / "t_on_o.vcf")


def test_write_parity_oracle_reads_ours(panel):
    d = panel
    subprocess.run([ORACLE, "--pfile", "t_p", "--export", "vcf",
                    "vcf-dosage=HDS-force", "--out", "o_on_t"], cwd=d,
                   check=True, capture_output=True)
    subprocess.run([ORACLE, "--pfile", "o_p", "--export", "vcf",
                    "vcf-dosage=HDS-force", "--out", "o_x3"], cwd=d,
                   check=True, capture_output=True)
    assert _body(d / "o_x3.vcf") == _body(d / "o_on_t.vcf")


def test_hds_mode_nonforce(panel):
    d = panel
    subprocess.run([ORACLE, "--pfile", "o_p", "--export", "vcf",
                    "vcf-dosage=HDS", "--out", "o_h"], cwd=d,
                   check=True, capture_output=True)
    _our_export(d, "t_p", "t_h", mode="HDS")
    assert _body(d / "o_h.vcf") == _body(d / "t_h.vcf")


def test_make_pgen_roundtrip_preserves_dphase(panel):
    """--pfile t_p --make-pgen must carry dosage+phase+dphase through."""
    from plink_tpu.cli import main

    d = panel
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(["--pfile", "t_p", "--make-pgen", "--out", "t_rt",
                     "--silent"]) == 0
    finally:
        os.chdir(old)
    subprocess.run([ORACLE, "--pfile", "t_rt", "--export", "vcf",
                    "vcf-dosage=HDS-force", "--out", "o_rt"], cwd=d,
                   check=True, capture_output=True)
    subprocess.run([ORACLE, "--pfile", "o_p", "--export", "vcf",
                    "vcf-dosage=HDS-force", "--out", "o_x4"], cwd=d,
                   check=True, capture_output=True)
    assert _body(d / "o_x4.vcf") == _body(d / "o_rt.vcf")
