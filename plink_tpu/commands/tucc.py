"""--tucc: transmitted/untransmitted case/pseudocontrol dataset.

Behavior reference: make_pseudocontrols (1.9/plink_family.c:5975-6365).
X/MT/haploid variants are excluded; Mendel errors are erased trio-wise;
each trio emits a case sample `<IID>_T` (the child's genotype, i.e. the
transmitted alleles) and a pseudocontrol `<IID>_U` built from the
untransmitted parental alleles (tucc_table, plink_family.c:5975).  With
'write-bed', outputs <out>.tucc.bed/.bim/.fam; otherwise a bare
.tucc.ped (no .map - reference quirk).
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..utils.chrom import MT_CODE, X_CODE, Y_CODE
from ..utils.logging import RunLogger
from .family import _bed_codes, _erase_mendel, build_trios_19

# index = child bed geno | father<<2 | mother<<4; result low 2 bits =
# transmitted (child), high 2 bits = untransmitted pseudocontrol
# (1.9/plink_family.c:5975 tucc_table)
_TUCC_TABLE = np.array(
    [0, 5, 5, 5, 5, 5, 5, 5, 8, 5, 2, 5, 5, 5, 10, 5,
     5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 5,
     8, 5, 2, 5, 5, 5, 5, 5, 12, 5, 10, 3, 5, 5, 14, 11,
     5, 5, 10, 5, 5, 5, 5, 5, 5, 5, 14, 11, 5, 5, 5, 15],
    np.uint8)


def _sexchar(sex, i):
    s = int(sex[i])
    return str(s) if s in (1, 2) else "0"


def run_tucc(ds: Dataset, cfg, log: RunLogger) -> None:
    vi = ds.vi
    write_bed = "write-bed" in (cfg.tucc or ())
    if not write_bed:
        log.log("Warning: --tucc without 'write-bed' is deprecated.")
    ci = vi.chr_info
    inc = np.flatnonzero(ds.variant_mask)
    chrom = vi.chrom[inc]
    autosomal = ~np.isin(chrom, (X_CODE, Y_CODE, MT_CODE))
    n_excl = int((~autosomal).sum())
    if n_excl:
        log.log(f"Excluding {n_excl} X/MT/haploid variant"
                f"{'' if n_excl == 1 else 's'} from --tucc dataset.")
        if n_excl == len(inc):
            from ..cli import FlagError

            raise FlagError("No variants remaining for --tucc.")
        inc = inc[autosomal]
    trios, _fams = build_trios_19(ds)
    T = trios.shape[0]
    if T == 0:
        log.log("Warning: Skipping --tucc since there are no trios.")
        return

    from .basic_reports import alt_allele_freqs

    af = alt_allele_freqs(ds, founders_only=True)
    a1_full = ~(af > 0.5)
    a1_is_alt = a1_full[inc]
    male = ds.male_mask()[: ds.raw_sample_ct]
    bed = _bed_codes(ds, inc, a1_is_alt)
    bed = _erase_mendel(bed, trios, male, None)
    child, dad, mom = trios[:, 0], trios[:, 1], trios[:, 2]
    idx = (bed[:, child].astype(np.int64)
           | (bed[:, dad].astype(np.int64) << 2)
           | (bed[:, mom].astype(np.int64) << 4))
    tu = _TUCC_TABLE[idx]          # [M, T] 4-bit transmitted/untrans

    si = ds.si
    alt1 = vi.alt1()

    def a1a2(v):
        a = str(alt1[v]) if a1_full[v] else str(vi.ref[v])
        b = str(vi.ref[v]) if a1_full[v] else str(alt1[v])
        miss = "0"
        return (miss if a == "." else a), (miss if b == "." else b)

    if write_bed:
        with open(cfg.out + ".tucc.fam", "w") as fh:
            for t in range(T):
                c = int(child[t])
                sx = _sexchar(si.sex, c)
                for tag, ph in (("T", "2"), ("U", "1")):
                    fh.write(f"{si.fid[c]}\t{si.iid[c]}_{tag}\t0\t0\t"
                             f"{sx}\t{ph}\n")
        cm = vi.cm
        with open(cfg.out + ".tucc.bim", "w") as fh:
            for v in inc:
                v = int(v)
                cms = "0" if cm is None else f"{cm[v]:.8g}"
                a, b = a1a2(v)
                fh.write(f"{ci.name19(int(vi.chrom[v]))}\t{vi.vid[v]}"
                         f"\t{cms}\t{int(vi.pos[v])}\t{a}\t{b}\n")
        # 2T samples per variant: trio t -> byte t//2, child geno in
        # bits (4*(t%2)), untransmitted in bits (4*(t%2)+2)
        tct2 = (T + 1) // 2
        out = np.zeros((len(inc), tct2), np.uint8)
        ev = tu[:, 0::2]
        out[:, : ev.shape[1]] |= ev
        if T > 1:
            ov = tu[:, 1::2].astype(np.uint8) << 4
            out[:, : ov.shape[1]] |= ov
        with open(cfg.out + ".tucc.bed", "wb") as fh:
            fh.write(b"\x6c\x1b\x01")
            fh.write(out.tobytes())
        log.log(f"--tucc write-bed: Pseudo cases/controls written to "
                f"{cfg.out}.tucc.bed + {cfg.out}.tucc.bim + "
                f"{cfg.out}.tucc.fam .")
    else:
        miss = "0"
        alleles = [a1a2(int(v)) for v in inc]
        with open(cfg.out + ".tucc.ped", "w") as fh:
            for t in range(T):
                c = int(child[t])
                sx = _sexchar(si.sex, c)
                for k, (tag, ph) in enumerate(
                        (("T", "2"), ("U", "1"))):
                    parts = [f"{si.fid[c]} {si.iid[c]}_{tag} 0 0 "
                             f"{sx} {ph} "]
                    gv = (tu[:, t] >> (2 * k)) & 3
                    for j in range(len(inc)):
                        g = int(gv[j])
                        a, b = alleles[j]
                        if g == 1:
                            parts.append(f" {miss} {miss}")
                        elif g == 0:
                            parts.append(f" {a} {a}")
                        elif g == 3:
                            parts.append(f" {b} {b}")
                        else:
                            parts.append(f" {a} {b}")
                    fh.write("".join(parts) + "\n")
        log.log(f"--tucc: Pseudo cases/controls written to "
                f"{cfg.out}.tucc.ped .")
