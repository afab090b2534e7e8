"""--sample-counts: per-sample genotype class counts.

Behavior reference: SampleCounts (2.0/plink2_misc.cc:7000-area; header table
:6979).  Default columns (empirically verified against a local plink2 on
dummy panels):
  HOM_REF_CT                      hom-ref genotypes, all variants
  HOM_ALT_SNP_CT / HET_SNP_CT     hom-alt / het at SNPs (both alleles len-1,
                                  non-symbolic)
  DIPLOID_TRANSITION_CT           genotypes carrying >=1 ALT at A<->G / C<->T
                                  SNPs (genotype count, not allele count)
  DIPLOID_TRANSVERSION_CT         same at other base-pair SNPs
  DIPLOID_NONSNP_NONSYMBOLIC_CT   ALT-carrying genotypes at non-SNP variants
  DIPLOID_SINGLETON_CT            het calls where the minor allele count is 1
  HAP_REF/HAP_ALT/MISSING_INCL_FEMALE_Y_CT

Sex-chromosome haploid accounting not yet implemented (HAP_* emit counts on
Y/MT treating every sample as haploid carriers would be wrong for mixed-sex
panels; currently those columns are only correct for autosomal data).
"""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..ops.counts import sample_plane_weighted
from ..utils.logging import RunLogger

_TS = {("A", "G"), ("G", "A"), ("C", "T"), ("T", "C")}
_BASES = {"A", "C", "G", "T"}


def write_sample_counts(ds: Dataset, out_prefix: str, log: RunLogger) -> None:
    vi = ds.vi
    alt1 = vi.alt1()
    is_snp = np.array(
        [len(str(r)) == 1 and len(str(a)) == 1 and not str(a).startswith("<")
         for r, a in zip(vi.ref, alt1)]
    )
    is_ts = np.array(
        [(str(r).upper(), str(a).upper()) in _TS for r, a in zip(vi.ref, alt1)]
    )
    is_base_pair = np.array(
        [str(r).upper() in _BASES and str(a).upper() in _BASES
         for r, a in zip(vi.ref, alt1)]
    )
    is_tv = is_snp & is_base_pair & ~is_ts
    is_ts = is_snp & is_ts
    is_nonsnp = ~is_snp & ~np.array([str(a).startswith("<") for a in alt1])

    gc = ds.geno_counts()
    # ref GetSingletonIdx (:6016-6034): a singleton variant has exactly ONE
    # sample with a non-ref non-missing genotype (het or hom-alt); that
    # carrier gets the count
    singleton = (gc[:, 1] + gc[:, 2]) == 1

    vmask = ds.variant_mask
    n = ds.raw_sample_ct
    sums = {}
    specs = {
        # name -> (homref w, het w, homalt w, miss w) variant selectors
        "HOM_REF_CT": (vmask, None, None, None),
        "HOM_ALT_SNP_CT": (None, None, vmask & is_snp, None),
        "HET_SNP_CT": (None, vmask & is_snp, None, None),
        "DIPLOID_TRANSITION_CT": (None, vmask & is_ts, vmask & is_ts, None),
        "DIPLOID_TRANSVERSION_CT": (None, vmask & is_tv, vmask & is_tv, None),
        "DIPLOID_NONSNP_NONSYMBOLIC_CT": (
            None, vmask & is_nonsnp, vmask & is_nonsnp, None,
        ),
        "DIPLOID_SINGLETON_CT": (None, vmask & singleton, vmask & singleton, None),
        "HAP_REF_INCL_FEMALE_Y_CT": (None, None, None, None),
        "HAP_ALT_INCL_FEMALE_Y_CT": (None, None, None, None),
        "MISSING_INCL_FEMALE_Y_CT": (None, None, None, vmask),
    }
    for name in specs:
        sums[name] = np.zeros(n)
    for v0, packed in ds.iter_packed_blocks():
        vct = packed.shape[0]
        z = np.zeros(vct)
        for name, sels in specs.items():
            w = np.stack(
                [z if s is None else s[v0 : v0 + vct].astype(np.float64)
                 for s in sels],
                axis=1,
            )
            if w.any():
                sums[name] += sample_plane_weighted(packed, n, w, f64=False)

    inc = np.flatnonzero(ds.sample_mask)
    si = ds.si
    use_fid = si.has_fid and any(str(si.fid[i]) != "0" for i in inc)
    path = out_prefix + ".scount"
    with open(path, "w") as f:
        f.write(
            ("#FID\tIID" if use_fid else "#IID") + "\t" + "\t".join(specs) + "\n"
        )
        for i in inc:
            idp = f"{si.fid[i]}\t{si.iid[i]}" if use_fid else str(si.iid[i])
            f.write(
                idp + "".join(f"\t{int(round(sums[k][i]))}" for k in specs) + "\n"
            )
    log.log(f"--sample-counts: Results written to {path} .")
