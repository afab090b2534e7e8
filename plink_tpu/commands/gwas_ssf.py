"""--gwas-ssf: convert --glm output to GWAS-SSF summary-statistic TSV.

Behavior reference: GwasSsfInternal / GwasSsfOneFile
(2.0/plink2_glm.cc:172, :641): required input columns CHROM POS REF ALT A1
A1_FREQ TEST OBS_CT BETA|OR SE|LOG(OR)_SE P; only TEST==ADD rows with
numeric results and all-ACGT alleles are emitted; chromosome is rendered
as a numeric code (X=23, Y=24, XY->23, MT=25); variant_id is the
synthetic {chr}_{pos}_{ref}_{alt} when a non-provisional REF exists
(#NA for provisional/multi-ALT rows), with an extra rsid column when IDs
look like rsIDs; ref_allele column reports EA/OA/#NA.
"""

from __future__ import annotations

from ..utils.fmt import dtoa_g
from ..utils.logging import RunLogger

_ACGT = set("ACGT")


def _all_acgt(s: str) -> bool:
    return bool(s) and all(c in _ACGT for c in s)


def _is_rsid(s: str) -> bool:
    return s.startswith("rs") and len(s) > 2 and s[2:].isdigit()


def _ssf_one(path: str, out_path: str, rsid_mode: str, log: RunLogger,
             a1freq_limit: float = 0.0) -> None:
    with open(path) as f:
        lines = f.read().splitlines()
    hdr = lines[0].lstrip("#").split("\t")
    col = {c: j for j, c in enumerate(hdr)}
    required = ["CHROM", "POS", "REF", "ALT", "A1", "A1_FREQ", "TEST", "OBS_CT"]
    if not all(c in col for c in required):
        raise ValueError(
            f"--gwas-ssf: {path} does not have all required input columns."
        )
    is_or = "OR" in col
    eff_col = col["OR"] if is_or else col.get("BETA")
    se_col = col.get("LOG(OR)_SE", col.get("SE"))
    p_col = col.get("P")
    if eff_col is None or se_col is None or p_col is None:
        raise ValueError(
            f"--gwas-ssf: {path} does not have all required input columns."
        )
    provref_col = col.get("PROVISIONAL_REF?")
    omitted_col = col.get("OMITTED")
    id_col = col.get("ID")

    # two-pass: detect real (non-provisional) REF rows + rsid ids
    real_ref_found = provref_col is None
    force_rsid = False
    if provref_col is not None or (rsid_mode == "infer" and id_col is not None):
        for ln in lines[1:]:
            t = ln.split("\t")
            if provref_col is not None and t[provref_col] == "N":
                real_ref_found = True
            if (
                rsid_mode == "infer" and id_col is not None
                and _is_rsid(t[id_col])
            ):
                force_rsid = True
            if real_ref_found and (force_rsid or rsid_mode != "infer"):
                break
    rsid_col_out = force_rsid or rsid_mode == "yes"

    def chr_code(name: str) -> str:
        u = name.upper()
        if u in ("X", "CHRX"):
            return "23"
        if u in ("Y", "CHRY"):
            return "24"
        if u in ("XY", "PAR1", "PAR2"):
            return "23"
        if u in ("MT", "M", "CHRM", "CHRMT"):
            return "25"
        return name.lstrip("chr") if name.startswith("chr") else name

    out = open(out_path, "w")
    hdr_out = [
        "chromosome", "base_pair_location", "effect_allele", "other_allele",
        "odds_ratio" if is_or else "beta", "standard_error",
        "effect_allele_frequency", "p_value",
    ]
    if real_ref_found:
        hdr_out.append("variant_id")
    if rsid_col_out:
        hdr_out.append("rsid")
    hdr_out.append("n")
    if real_ref_found:
        hdr_out.append("ref_allele")
    out.write("\t".join(hdr_out) + "\n")
    n_rows = 0
    for ln in lines[1:]:
        t = ln.split("\t")
        if t[col["TEST"]] != "ADD":
            continue
        if t[p_col][:1].upper() == "N":  # NA result
            continue
        effect = t[col["A1"]]
        if not _all_acgt(effect):
            continue
        ref = t[col["REF"]]
        if omitted_col is not None:
            other = t[omitted_col]
            if not _all_acgt(other):
                continue
            if ref == effect:
                ref_match = 0
            elif ref == other:
                ref_match = 1
            else:
                ref_match = 2
        else:
            alt = t[col["ALT"]]
            if "," in alt:
                continue
            if effect == alt:
                other, ref_match = ref, 1
            elif effect == ref:
                other, ref_match = alt, 0
            else:
                raise ValueError(
                    f"A1 allele in {path} matches neither REF nor ALT."
                )
            if not _all_acgt(other):
                continue
        provref = provref_col is not None and t[provref_col] == "Y"
        cc = chr_code(t[col["CHROM"]])
        freq_str = t[col["A1_FREQ"]]
        if a1freq_limit > 0.0:
            try:
                fv = float(freq_str)
            except ValueError:
                raise ValueError(f"Invalid A1_FREQ in {path} .")
            if fv < a1freq_limit:
                freq_str = dtoa_g(a1freq_limit)
        row = [
            cc, t[col["POS"]], effect, other, t[eff_col], t[se_col],
            freq_str, t[p_col],
        ]
        if real_ref_found:
            if ref_match == 2 or provref:
                row.append("#NA")
            else:
                pair = other if ref_match == 0 else effect
                row.append(f"{cc}_{t[col['POS']]}_{ref}_{pair}")
        if rsid_col_out:
            vid = t[id_col] if id_col is not None else ""
            row.append(vid if _is_rsid(vid) else "#NA")
        row.append(t[col["OBS_CT"]])
        if real_ref_found:
            row.append(
                "#NA" if (provref or ref_match == 2)
                else ("OA" if ref_match == 1 else "EA")
            )
        out.write("\t".join(row) + "\n")
        n_rows += 1
    out.close()


def run_gwas_ssf(cfg, log: RunLogger) -> None:
    files = []
    rsid_mode = "infer"
    a1freq_limit = 0.0
    for a in cfg.gwas_ssf:
        if a.startswith("file="):
            files.append(a[5:])
        elif a.startswith("file-list="):
            with open(a[10:]) as f:
                files.extend(l.strip() for l in f if l.strip())
        elif a.startswith("rsid="):
            rsid_mode = a[5:]
        elif a in ("allow-ambiguous-indels", "zs", "delete-orig-glm"):
            pass  # accepted; ambiguity checks are skipped
        elif a.startswith("a1freq-lower-limit="):
            # privacy masking (ref GwasSsfInternal, 2.0/plink2_glm.cc:
            # 498-510): freqs below the limit print the limit itself;
            # plink2 stores limit*(1-kSmallEpsilon)
            a1freq_limit = float(a[len("a1freq-lower-limit="):]) \
                * (1.0 - 2.0 ** -44)
        else:
            raise ValueError(f"Invalid --gwas-ssf argument '{a}'.")
    if not files:
        raise ValueError("--gwas-ssf requires file= or file-list=.")
    for p in files:
        _ssf_one(p, p + ".ssf.tsv", rsid_mode, log, a1freq_limit)
    log.log(f"--gwas-ssf file=/file-list=: {len(files)} file"
            f"{'s' if len(files) != 1 else ''} processed.")
