"""PLINK 1.9 --recode output formats with no 2.0 counterpart.

Behavior reference: recode() in 1.9/plink_data.c —
  structure  (:14176, .recode.strct_in)
  bimbam[-1chr] (:13351, .recode.geno.txt/.pheno.txt/.pos.txt)
  lgen[-ref] (:13655, .lgen/.fam/.map[/.ref])
  23         (:13138, .txt single-sample 23andMe)
  fastphase[-1chr] (:13529, [.chr-*].recode.phase.inp)
plink2 2.0 rejects these export formats ("... have been implemented so
far"); they exist only in the 1.9 codebase, so this module follows the
1.9 conventions byte-for-byte: A1 = minor allele by founder frequency,
heterozygous-haploid calls exported as missing, 1.9 .fam/.map sidecars.
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..ops.pairwise import _unpack_np
from ..utils.fmt import dtoa_g
from ..utils.logging import RunLogger

_FORMATS = {
    "structure", "bimbam", "bimbam-1chr", "lgen", "lgen-ref", "23",
    "fastphase", "fastphase-1chr",
}


def _bed_codes(ds: Dataset, a1_is_alt: np.ndarray, inc_s: np.ndarray,
               inc_v: np.ndarray) -> np.ndarray:
    """[Mv, Ns] 1.9 bed-style codes: 0=hom A1, 1=missing, 2=het, 3=hom A2.

    1.9 writes genotypes as stored by default -- erasing heterozygous
    haploid calls on output is the opt-in --set-hh-missing flag, NOT the
    default ("PLINK 1.07's behavior of doing this automatically on output
    was removed"); haploid_fix only fires when that flag is set."""
    codes = _unpack_np(ds.all_packed())[:, : ds.raw_sample_ct]
    codes = codes[np.ix_(inc_v, inc_s)]
    # our codes: 0=hom-ref 1=het 2=hom-alt 3=missing
    alt_ct = codes.astype(np.int8)
    flip = a1_is_alt[inc_v]
    # A1 copies per genotype
    a1ct = np.where(flip[:, None], alt_ct, 2 - alt_ct)
    bed = np.empty_like(codes)
    bed[a1ct == 2] = 0
    bed[a1ct == 1] = 2
    bed[a1ct == 0] = 3
    bed[codes == 3] = 1
    return bed


def _pheno_strs(ds: Dataset, inc_s: np.ndarray) -> list[str]:
    """1.9 sixth-column phenotype rendering: cc -> 1/2, qt -> dtoa_g,
    missing -> -9."""
    pc = next(iter(ds.si.phenos.values()), None)
    out = []
    for i in inc_s:
        if pc is None or not pc.nonmiss[i]:
            out.append("-9")
        elif pc.kind == "cc":
            out.append(str(int(pc.data[i]) + 1))
        elif pc.kind == "qt":
            out.append(dtoa_g(float(pc.data[i])))
        else:
            out.append("-9")
    return out


def _write_fam(ds: Dataset, inc_s: np.ndarray, path: str,
               delim: str = " ") -> None:
    si = ds.si
    ph = _pheno_strs(ds, inc_s)
    with open(path, "w") as f:
        for k, i in enumerate(inc_s):
            pat = si.pat[i] if si.pat is not None else "0"
            mat = si.mat[i] if si.mat is not None else "0"
            f.write(
                f"{si.fid[i]}{delim}{si.iid[i]}{delim}{pat}{delim}{mat}"
                f"{delim}{int(si.sex[i])}{delim}{ph[k]}\n"
            )


def _write_map(ds: Dataset, inc_v: np.ndarray, path: str) -> None:
    vi = ds.vi
    ci = vi.chr_info
    cm = vi.cm
    with open(path, "w") as f:
        for v in inc_v:
            cms = dtoa_g(float(cm[v])) if cm is not None else "0"
            f.write(
                f"{ci.name19(int(vi.chrom[v]))}\t{vi.vid[v]}\t{cms}\t"
                f"{int(vi.pos[v])}\n"
            )


def run_recode19(ds: Dataset, cfg, log: RunLogger) -> None:
    fmt = cfg.recode19
    if fmt not in _FORMATS:
        raise ValueError(f"--recode: unsupported format '{fmt}'")
    from .basic_reports import alt_allele_freqs

    freqs = alt_allele_freqs(ds, founders_only=True)
    a1_is_alt = ~(freqs > 0.5)
    inc_s = np.flatnonzero(ds.sample_mask)
    inc_v = np.flatnonzero(ds.variant_mask)
    vi = ds.vi
    si = ds.si
    alt1 = vi.alt1()
    a1 = np.where(a1_is_alt, alt1, vi.ref)
    a2 = np.where(a1_is_alt, vi.ref, alt1)
    bed = _bed_codes(ds, a1_is_alt, inc_s, inc_v)

    if fmt == "structure":
        path = cfg.out + ".recode.strct_in"
        with open(path, "w") as f:
            for v in inc_v:
                f.write(f"{vi.vid[v]} ")
            f.write("\n")
            # inter-marker map distances; -1 opens each chromosome
            last_chrom = None
            last_pos = 0
            for v in inc_v:
                ch = int(vi.chrom[v])
                if ch != last_chrom:
                    f.write("-1 ")
                    last_chrom = ch
                else:
                    f.write(f"{int(vi.pos[v]) - last_pos} ")
                last_pos = int(vi.pos[v])
            f.write("\n")
            # cluster code = 1-based order of first FID appearance
            fid_codes: dict[str, int] = {}
            cells = np.array([" 1 1", " 0 0", " 1 2", " 2 2"])
            for k, i in enumerate(inc_s):
                fid = str(si.fid[i])
                code = fid_codes.setdefault(fid, len(fid_codes) + 1)
                f.write(str(si.iid[i]) + f" {code}")
                f.write("".join(cells[bed[:, k]]))
                f.write("\n")
        log.log(f"--recode structure to {path} ... done.")
        return

    if fmt in ("bimbam", "bimbam-1chr"):
        if fmt == "bimbam-1chr" and len(set(vi.chrom[inc_v].tolist())) > 1:
            raise ValueError(
                "--recode bimbam-1chr requires a single-chromosome dataset."
            )
        base = cfg.out + ".recode."
        ci = vi.chr_info
        with open(base + "pos.txt", "w") as f:
            for v in inc_v:
                line = f"{vi.vid[v]} {int(vi.pos[v])}"
                if fmt == "bimbam":
                    line += f" {ci.name19(int(vi.chrom[v]))}"
                f.write(line + "\n")
        with open(base + "pheno.txt", "w") as f:
            for s in _pheno_strs(ds, inc_s):
                f.write(s + "\n")
        with open(base + "geno.txt", "w") as f:
            f.write(f"{inc_s.size}\n{inc_v.size}\nIND")
            for i in inc_s:
                f.write("," + str(si.iid[i]))
            f.write("\n")
            for r, v in enumerate(inc_v):
                c1 = str(a1[v])[0]
                c2 = str(a2[v])[0]
                cells = np.array(
                    [f",{c1}{c1}", ",??", f",{c1}{c2}", f",{c2}{c2}"])
                f.write(str(vi.vid[v]) + "".join(cells[bed[r]]) + "\n")
        log.log(
            f"--recode bimbam{'-1chr' if fmt != 'bimbam' else ''} to "
            f"{base}geno.txt + {base}pheno.txt + {base}pos.txt ... done."
        )
        return

    if fmt in ("lgen", "lgen-ref"):
        lg = cfg.out + ".lgen"
        with open(lg, "w") as f:
            for r, v in enumerate(inc_v):
                s1 = str(a1[v])
                s2 = str(a2[v])
                vid = str(vi.vid[v])
                cells = [f" {vid}  {s1} {s1}\n", f" {vid}  0 0\n",
                         f" {vid}  {s1} {s2}\n", f" {vid}  {s2} {s2}\n"]
                skip = 3 if fmt == "lgen-ref" else 4
                col = bed[r]
                for k, i in enumerate(inc_s):
                    g = col[k]
                    if g == skip:
                        continue
                    # the reference's collapsed-id copy predates its
                    # space-delimiter conversion, so FID\tIID keeps the tab
                    # (1.9/plink_data.c:13667 + :12138 ordering)
                    f.write(f"{si.fid[i]}\t{si.iid[i]}" + cells[g])
        if fmt == "lgen-ref":
            with open(cfg.out + ".ref", "w") as f:
                for v in inc_v:
                    s1, s2 = str(a1[v]), str(a2[v])
                    line = str(vi.vid[v])
                    if s2 != "0":
                        line += f" {s2}"
                    if s1 != "0":
                        line += f" {s1}"
                    f.write(line + "\n")
        _write_fam(ds, inc_s, cfg.out + ".fam")
        _write_map(ds, inc_v, cfg.out + ".map")
        log.log(f"--recode {fmt} to {lg} + sidecars ... done.")
        return

    if fmt == "23":
        import time as _time

        path = cfg.out + ".txt"
        ci = vi.chr_info
        k0 = 0  # first included sample
        male = bool(ds.male_mask()[inc_s[k0]])
        with open(path, "w") as f:
            f.write(
                "# This data file generated by PLINK at: "
                + _time.ctime() + "\n"
                "#\n"
                "# Below is a text version of your data.  Fields are "
                "TAB-separated.\n"
                "# Each line corresponds to a single SNP.  For each SNP, "
                "we provide its\n"
                "# identifier, its location on a reference human genome, "
                "and the genotype call.\n"
                "# For further information (e.g. which reference build "
                "was used), consult the\n"
                "# original source of your data.\n"
                "#\n"
                "# rsid\tchromosome\tposition\tgenotype\n"
            )
            from ..utils.chrom import MT_CODE, X_CODE, Y_CODE

            for r, v in enumerate(inc_v):
                ch = int(vi.chrom[v])
                chs = ci.name(ch)  # human names (X/Y/MT)
                g = int(bed[r, k0])
                c1, c2 = str(a1[v])[0], str(a2[v])[0]
                haploid_out = ch == Y_CODE or ch == MT_CODE or (
                    male and ch == X_CODE)
                if g == 0:
                    gt = c1 + c1
                elif g == 2:
                    gt = c2 + c1
                elif g == 3:
                    gt = c2 + c2
                else:
                    gt = "--"
                if haploid_out and g in (0, 3):
                    gt = gt[0]
                f.write(f"{vi.vid[v]}\t{chs}\t{int(vi.pos[v])}\t{gt}\n")
        log.log(f"--recode 23 to {path} ... done.")
        return

    # fastphase / fastphase-1chr
    chroms = vi.chrom[inc_v]
    if fmt == "fastphase-1chr" and len(set(chroms.tolist())) > 1:
        raise ValueError(
            "--recode fastphase-1chr requires a single-chromosome dataset."
        )
    ci = vi.chr_info
    uniq = list(dict.fromkeys(chroms.tolist()))
    for ch in uniq:
        rows = np.flatnonzero(chroms == ch)
        if fmt == "fastphase":
            path = f"{cfg.out}.chr-{ci.name19(int(ch))}.recode.phase.inp"
        else:
            path = f"{cfg.out}.recode.phase.inp"
        with open(path, "w") as f:
            f.write(f"{inc_s.size}\n{rows.size}\nP ")
            for r in rows:
                f.write(f"{int(vi.pos[inc_v[r]])} ")
            f.write("\n")
            c1 = np.array([str(a1[inc_v[r]])[0] for r in rows])
            c2 = np.array([str(a2[inc_v[r]])[0] for r in rows])
            for k, i in enumerate(inc_s):
                f.write(f"# ID {si.iid[i]}\n")
                g = bed[rows, k]
                h1 = np.where(g == 3, c2, c1)
                h2 = np.where(g == 0, c1, c2)
                h1 = np.where(g == 1, "?", h1)
                h2 = np.where(g == 1, "?", h2)
                f.write("".join(h1) + "\n" + "".join(h2) + "\n")
        log.log(f"--recode fastphase to {path} ... done.")
