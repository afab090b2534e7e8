"""--bp-space, --double-id/--const-fid/--id-delim, --allow-extra-chr:
byte-diffed vs the oracle."""

import os
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")
pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


def _tpu(args, cwd):
    from plink_tpu.cli import main

    old = os.getcwd()
    os.chdir(cwd)
    try:
        assert main(args + ["--silent"]) == 0
    finally:
        os.chdir(old)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    import numpy as np

    d = tmp_path_factory.mktemp("mflags")
    subprocess.run(
        [ORACLE, "--dummy", "30", "300", "0.02", "--seed", "9", "--out", "b"],
        cwd=d, check=True, capture_output=True,
    )
    rng = np.random.default_rng(1)
    lines = (d / "b.pvar").read_text().splitlines()
    out = [lines[0]]
    pos = 0
    for l in lines[1:]:
        p = l.split("\t")
        pos += int(rng.integers(1, 3000))
        p[1] = str(pos)
        out.append("\t".join(p))
    (d / "b.pvar").write_text("\n".join(out) + "\n")
    subprocess.run([ORACLE, "--pfile", "b", "--export", "vcf", "--out", "v"],
                   cwd=d, check=True, capture_output=True)
    txt = (d / "v.vcf").read_text()
    import re
    (d / "v.vcf").write_text(re.sub(r"per(\d+)", r"fam\1_ind\1", txt))
    return d


def test_bp_space(panel):
    d = panel
    subprocess.run(
        [ORACLE, "--pfile", "b", "--bp-space", "2000", "--write-snplist",
         "--out", "o"],
        cwd=d, check=True, capture_output=True,
    )
    _tpu(["--pfile", "b", "--bp-space", "2000", "--write-snplist",
          "--out", "t"], str(d))
    assert (d / "o.snplist").read_text() == (d / "t.snplist").read_text()


@pytest.mark.parametrize("mode", [
    ["--double-id"], ["--const-fid"], ["--const-fid", "7"],
    ["--id-delim", "_"],
])
def test_vcf_id_modes(panel, mode):
    d = panel
    tag = "".join(mode).replace("-", "")
    subprocess.run(
        [ORACLE, "--vcf", "v.vcf"] + mode + ["--make-pgen",
                                             "--out", f"o{tag}"],
        cwd=d, check=True, capture_output=True,
    )
    _tpu(["--vcf", "v.vcf"] + mode + ["--make-pgen", "--out", f"t{tag}"],
         str(d))
    assert (d / f"o{tag}.psam").read_text() == \
        (d / f"t{tag}.psam").read_text()


def test_clump_field_options(tmp_path):
    """--clump-id-field/--clump-p-field column-name search lists
    (ref 2.0/plink2_help.cc:2931-2933)."""
    from plink_tpu.cli import main

    subprocess.run(
        [ORACLE, "--dummy", "150", "500", "0.02", "scalar-pheno",
         "--seed", "22", "--out", "d"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    subprocess.run(
        [ORACLE, "--pfile", "d", "--glm", "allow-no-covars", "--out", "a"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    lines = (tmp_path / "a.PHENO1.glm.linear").read_text().splitlines()
    hdr = lines[0].replace("ID", "MARKER").replace("\tP", "\tPVAL")
    (tmp_path / "a2.txt").write_text("\n".join([hdr] + lines[1:]) + "\n")
    args = ["--pfile", "d", "--clump", "a2.txt", "--clump-id-field",
            "MARKER", "--clump-p-field", "PVAL", "--clump-p1", "0.05"]
    subprocess.run([ORACLE] + args + ["--out", "o"], cwd=tmp_path,
                   check=True, capture_output=True)
    _tpu(args + ["--out", "t"], str(tmp_path))
    assert (tmp_path / "o.clumps").read_text() == \
        (tmp_path / "t.clumps").read_text()


@pytest.mark.parametrize("fmt,ext", [("A", "raw"), ("AD", "raw"),
                                     ("A-transpose", "traw")])
def test_export_allele(tmp_path, fmt, ext):
    """--export-allele: count the named allele instead of REF in A/AD/Av
    exports (ref 2.0/plink2_help.cc:2429)."""
    from plink_tpu.cli import main

    subprocess.run(
        [ORACLE, "--dummy", "60", "50", "0.03", "--seed", "22", "--out", "d"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    lines = (tmp_path / "d.pvar").read_text().splitlines()
    with open(tmp_path / "ea.txt", "w") as f:
        for i, l in enumerate(lines[1:]):
            t = l.split("\t")
            if i % 2 == 0:
                f.write(f"{t[2]} {t[4]}\n")
    args = ["--pfile", "d", "--export", fmt, "--export-allele", "ea.txt"]
    subprocess.run([ORACLE] + args + ["--out", "o"], cwd=tmp_path,
                   check=True, capture_output=True)
    _tpu(args + ["--out", "t"], str(tmp_path))
    assert (tmp_path / f"o.{ext}").read_text() == \
        (tmp_path / f"t.{ext}").read_text()


def test_af_pseudocount(tmp_path):
    """--af-pseudocount: inferred freq (j+x)/(j+k+2x) applies to the --maf
    filter but not the --freq report (ref 2.0/plink2_help.cc:2295)."""
    from plink_tpu.cli import main

    subprocess.run(
        [ORACLE, "--dummy", "150", "300", "0.02", "--seed", "22",
         "--out", "d"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    for tag, extra in (("p", ["--af-pseudocount", "1"]), ("n", [])):
        args = ["--pfile", "d"] + extra + ["--maf", "0.1", "--freq",
                                           "--write-snplist"]
        subprocess.run([ORACLE] + args + ["--out", f"o{tag}"],
                       cwd=tmp_path, check=True, capture_output=True)
        _tpu(args + ["--out", f"t{tag}"], str(tmp_path))
        for ext in ("snplist", "afreq"):
            assert (tmp_path / f"o{tag}.{ext}").read_text() == \
                (tmp_path / f"t{tag}.{ext}").read_text(), (tag, ext)


def test_autosome_par(tmp_path):
    from plink_tpu.cli import main

    subprocess.run(
        [ORACLE, "--dummy", "30", "60", "0.02", "--seed", "3", "--out", "b"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    lines = (tmp_path / "b.pvar").read_text().splitlines()
    out = [lines[0]]
    for i, l in enumerate(lines[1:]):
        p = l.split("\t")
        p[0] = ["1", "X", "Y", "XY", "MT"][i % 5]
        out.append("\t".join(p))
    (tmp_path / "b.pvar").write_text("\n".join(out) + "\n")
    args = ["--pfile", "b", "--autosome-par", "--write-snplist"]
    subprocess.run([ORACLE] + args + ["--out", "o"], cwd=tmp_path,
                   check=True, capture_output=True)
    _tpu(args + ["--out", "t"], str(tmp_path))
    assert (tmp_path / "o.snplist").read_text() == \
        (tmp_path / "t.snplist").read_text()


def test_mach_r2_filter(tmp_path):
    """--mach-r2-filter: MaCH imputation quality bounds
    (MultiallelicDiploidMachR2, 2.0/include/pgenlib_misc.cc:3413)."""
    from plink_tpu.cli import main

    subprocess.run(
        [ORACLE, "--dummy", "150", "200", "0.03", "dosage-freq=0.5",
         "--seed", "15", "--out", "d"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    args = ["--pfile", "d", "--mach-r2-filter", "0.6", "1.4",
            "--write-snplist"]
    subprocess.run([ORACLE] + args + ["--out", "o"], cwd=tmp_path,
                   check=True, capture_output=True)
    _tpu(args + ["--out", "t"], str(tmp_path))
    assert (tmp_path / "o.snplist").read_text() == \
        (tmp_path / "t.snplist").read_text()


def test_minimac3_r2_filter(tmp_path):
    """--minimac3-r2-filter on a phased-dosage panel
    (MultiallelicDiploidMinimac3R2 with (l+r)^2 + (l-r)^2 hap terms,
    2.0/include/pgenlib_misc.cc:3413)."""
    from plink_tpu.cli import main

    subprocess.run(
        [ORACLE, "--dummy", "150", "200", "0.03", "dosage-freq=0.5",
         "phase-freq=0.5", "--seed", "16", "--out", "p"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    args = ["--pfile", "p", "--minimac3-r2-filter", "0.5", "1.5",
            "--write-snplist"]
    subprocess.run([ORACLE] + args + ["--out", "o"], cwd=tmp_path,
                   check=True, capture_output=True)
    _tpu(args + ["--out", "t"], str(tmp_path))
    assert (tmp_path / "o.snplist").read_text() == \
        (tmp_path / "t.snplist").read_text()


@pytest.mark.parametrize("spec", [
    [], ["counts"], ["cols=+machr2"], ["cols=+minimac3r2"],
    ["counts", "cols=chrom,ref,alt1,reffreq,alt1freq,nobs"],
    ["cols=chrom,pos,ref,alt1,reffreq,alt1freq,freq,machr2,nobs"],
    ["cols=chrom,eq,nobs"], ["counts", "cols=chrom,eq,nobs"],
    ["cols=chrom,numeq,nobs"], ["cols=chrom,alteq,nobs"],
])
def test_freq_cols(tmp_path, spec):
    """--freq cols= column sets + counts mode (headers/values per
    2.0/plink2_misc.cc WriteAlleleFreqs; count rendering via the
    shortest-roundtrip PrintDdosageDecimal, 2.0/plink2_common.cc:234)."""
    from plink_tpu.cli import main

    subprocess.run(
        [ORACLE, "--dummy", "150", "100", "0.03", "dosage-freq=0.5",
         "phase-freq=0.4", "--seed", "16", "--out", "p"],
        cwd=tmp_path, check=True, capture_output=True,
    )
    args = ["--pfile", "p", "--freq"] + spec
    subprocess.run([ORACLE] + args + ["--out", "o"], cwd=tmp_path,
                   check=True, capture_output=True)
    _tpu(args + ["--out", "t"], str(tmp_path))
    ext = "acount" if "counts" in spec else "afreq"
    assert (tmp_path / f"o.{ext}").read_text() == \
        (tmp_path / f"t.{ext}").read_text()


def test_bad_freqs_and_ac_founders_guards(tmp_path):
    """Driver degenerate-data guards (2.0/plink2.cc:2065-2105):
    --score with <50 founders errors unless --bad-freqs; --mac with
    nonfounders present requires --ac-founders/--nonfounders;
    --indep-pairwise with <50 samples errors unless --bad-ld."""
    import numpy as np
    import pytest as _pytest

    from plink_tpu.cli import main

    pfx = str(tmp_path / "t")
    assert main(["--dummy", "40", "60", "0.02", "--seed", "3",
                 "--out", pfx, "--silent"]) == 0
    with open(pfx + ".score", "w") as f:
        f.write("snp1 A 0.5\n")
    with _pytest.raises(ValueError, match="decent allele frequencies"):
        main(["--pfile", pfx, "--score", pfx + ".score",
              "--out", pfx + "s", "--silent"])
    assert main(["--pfile", pfx, "--score", pfx + ".score", "--bad-freqs",
                 "--out", pfx + "s2", "--silent"]) == 0
    with _pytest.raises(ValueError, match="linkage disequilibrium"):
        main(["--pfile", pfx, "--indep-pairwise", "10", "5", "0.5",
              "--out", pfx + "l", "--silent"])
    assert main(["--pfile", pfx, "--indep-pairwise", "10", "5", "0.5",
                 "--bad-ld", "--out", pfx + "l2", "--silent"]) == 0
    # introduce nonfounders: give two samples parent IDs
    psam = (tmp_path / "t.psam").read_text().splitlines()
    hdr = psam[0] + "\tPAT\tMAT"
    rows = [l + ("\tp1\tp2" if i < 2 else "\t0\t0")
            for i, l in enumerate(psam[1:])]
    (tmp_path / "t.psam").write_text(hdr + "\n" + "\n".join(rows) + "\n")
    with _pytest.raises(ValueError, match="ac-founders"):
        main(["--pfile", pfx, "--mac", "2", "--freq",
              "--out", pfx + "m", "--silent"])
    assert main(["--pfile", pfx, "--mac", "2", "--freq", "--ac-founders",
                 "--out", pfx + "m2", "--silent"]) == 0
    assert main(["--pfile", pfx, "--mac", "2", "--freq", "--nonfounders",
                 "--out", pfx + "m3", "--silent"]) == 0


def test_het_small_sample(tmp_path):
    """--het small-sample: Nei founder-count E(HET) (HetThread
    allele_freqs==nullptr branch, 2.0/plink2_misc.cc:9930-9940)."""
    import os
    import subprocess

    import pytest as _pytest

    from plink_tpu.cli import main

    oracle = os.environ.get("PLINK2_ORACLE",
                            "/tmp/oracle/2.0/build_dynamic/plink2")
    if not os.path.exists(oracle):
        _pytest.skip("no plink2 oracle")
    pfx = str(tmp_path / "h")
    subprocess.run([oracle, "--dummy", "120", "400", "0.05", "--seed", "8",
                    "--out", pfx], check=True, capture_output=True)
    subprocess.run([oracle, "--pfile", pfx, "--het", "small-sample",
                    "--out", pfx + "o"], check=True, capture_output=True)
    assert main(["--pfile", pfx, "--het", "small-sample",
                 "--out", pfx + "t", "--silent"]) == 0
    assert open(pfx + "o.het", "rb").read() == \
        open(pfx + "t.het", "rb").read()
