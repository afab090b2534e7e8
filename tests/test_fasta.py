"""--fa / --ref-from-fa / --normalize differential tests (ProcessFa /
RefFromFaContig / VNormalizeContig, 2.0/plink2_fasta.cc): pvar outputs and
post-rotation genotype exports byte-identical to the oracle, including the
reference's virtual-left-extension right-trimming quirk."""

import os
import random
import subprocess

import pytest

ORACLE = os.environ.get("PLINK2_ORACLE", "/tmp/oracle/2.0/build_dynamic/plink2")

pytestmark = pytest.mark.skipif(
    not os.path.exists(ORACLE), reason="plink2 oracle not built"
)


@pytest.fixture(scope="module")
def panel(tmp_path_factory):
    d = tmp_path_factory.mktemp("fasta")
    random.seed(5)
    seq = "".join(random.choice("ACGT") for _ in range(300))
    (d / "ref.fa").write_text(
        ">1\n" + "\n".join(seq[i:i + 60] for i in range(0, 300, 60)) + "\n"
    )
    lines = [
        "##fileformat=VCFv4.2", "##contig=<ID=1,length=300>",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3",
    ]
    gts = ["0/0", "0/1", "1/1"]
    for i in range(10):
        pos = 10 + i * 10
        base = seq[pos - 1]
        other = "A" if base != "A" else "G"
        if i % 3 == 0:
            ref, alt = base, other
        elif i % 3 == 1:
            ref, alt = other, base
        else:
            ref, alt = base + seq[pos], base
        row = f"1\t{pos}\tv{i}\t{ref}\t{alt}\t.\t.\t.\tGT"
        for s in range(3):
            row += "\t" + gts[(i + s) % 3]
        lines.append(row)
    (d / "in.vcf").write_text("\n".join(lines) + "\n")
    return d


@pytest.mark.parametrize(
    "flags,outfile",
    [
        (["--ref-from-fa", "force", "--make-just-pvar"], "pvar"),
        (["--normalize", "--make-just-pvar"], "pvar"),
        (["--ref-from-fa", "force", "--normalize", "--make-just-pvar"],
         "pvar"),
        (["--ref-from-fa", "force", "--export", "A"], "raw"),
    ],
)
def test_fasta_ops(panel, flags, outfile):
    from plink_tpu.cli import main

    d = panel
    full = ["--vcf", "in.vcf", "--fa", "ref.fa"] + flags
    subprocess.run([ORACLE] + full + ["--out", "o_f"], cwd=d, check=True,
                   capture_output=True)
    old = os.getcwd()
    os.chdir(d)
    try:
        assert main(full + ["--out", "t_f", "--silent"]) == 0
    finally:
        os.chdir(old)
    oo = [l for l in (d / f"o_f.{outfile}").read_text().splitlines()
          if not l.startswith("##")]
    tt = [l for l in (d / f"t_f.{outfile}").read_text().splitlines()
          if not l.startswith("##")]
    assert oo == tt


def test_ref_from_fa_noforce_errors(panel):
    from plink_tpu.cli import main

    d = panel
    old = os.getcwd()
    os.chdir(d)
    try:
        with pytest.raises(ValueError, match="force"):
            main(["--vcf", "in.vcf", "--fa", "ref.fa", "--ref-from-fa",
                  "--make-just-pvar", "--out", "t_e", "--silent"])
    finally:
        os.chdir(old)
