"""Fixed-order command pipeline (ref: Plink2Core, 2.0/plink2.cc:836).

Commands in one invocation execute as a dataflow over shared masks in the
reference's fixed dependency order (SURVEY.md section 3.1):
  load -> sample filters -> variant filters -> counts -> freq/missing/hardy
  reports -> hwe/maf enforcement -> king -> grm -> pca -> make-pgen/export
  -> ld prune -> score -> glm
"""

from __future__ import annotations

import os

import numpy as np

from .cli import Config, FlagError
from .dataset import Dataset, load_dataset
from .utils.logging import RunLogger, set_logger


def _load(cfg: Config, log: RunLogger) -> Dataset:
    if cfg.pfile:
        return load_dataset(cfg.pfile,
                            missing_pheno=cfg.input_missing_phenotype)
    if cfg.bfile:
        return load_dataset(cfg.bfile,
                            missing_pheno=cfg.input_missing_phenotype)
    if cfg.pedmap:
        return _import_pedmap(cfg.pedmap, cfg.out, log)
    if cfg.vcf:
        return _import_vcf(cfg.vcf[0], cfg.out, log, cfg.vcf[1:], cfg)
    if cfg.gen or cfg.data:
        return _import_oxford(cfg, log)
    if cfg.bgen:
        return _import_bgen(cfg, log)
    if cfg.tped:
        return _import_tped(cfg, log)
    if cfg.eigfile:
        return _import_eig(cfg, log)
    if cfg.bcf:
        return _import_bcf(cfg, log)
    if cfg.import_dosage:
        return _import_dosage_file(cfg, log)
    if cfg.dummy:
        return _generate_dummy(cfg, log)
    raise ValueError(
        "no input fileset specified (--pfile/--bfile/--file/--vcf/--dummy)"
    )


def _apply_import_id_mode(si, cfg) -> None:
    """--double-id / --const-fid / --id-delim sample-ID handling on text
    imports (ref VcfSampleLine parsing, 2.0/plink2_import.cc)."""
    mode = getattr(cfg, "vcf_id_mode", None) if cfg is not None else None
    if not mode:
        return
    kind, arg = mode
    if kind == "double":
        si.fid = si.iid.copy()
        si.has_fid = True
    elif kind == "const":
        si.fid = np.full(si.sample_ct, arg, dtype=object)
        # FID 0 means "no FID": the psam keeps its #IID-only header
        si.has_fid = arg != "0"
    else:  # delim
        fid, iid, sid = [], [], []
        any_sid = False
        for x in si.iid:
            parts = str(x).split(arg)
            if len(parts) == 1:
                raise FlagError(
                    f"--id-delim: no '{arg}' in sample ID '{x}'.")
            fid.append(parts[0])
            iid.append(parts[1])
            sid.append(parts[2] if len(parts) > 2 else "0")
            any_sid = any_sid or len(parts) > 2
        si.fid = np.array(fid, dtype=object)
        si.iid = np.array(iid, dtype=object)
        if any_sid:
            si.sid = np.array(sid, dtype=object)
        si.has_fid = True


def _import_vcf(path: str, out_prefix: str, log: RunLogger,
                mods: tuple = (), cfg=None) -> Dataset:
    """--vcf: convert to a temporary .pgen trio, then proceed (ref workflow:
    VcfToPgen writes <out>-temporary.* and Plink2Core consumes them,
    2.0/plink2.cc import path)."""
    from .io.pgen_write import PgenWriter
    from .io.psam import write_psam
    from .io.pvar import write_pvar
    from .io.vcf import DEFAULT_IMPORT_HARD_CALL_THRESH, read_vcf

    dosage_field = None
    for m in mods:
        if m.startswith("dosage="):
            dosage_field = m.split("=", 1)[1]
    gp_force = dosage_field == "GP-force"
    if gp_force:
        dosage_field = "GP"
    thresh_kw = {}
    if cfg is not None:
        hc = cfg.hard_call_thresh
        erase = cfg.dosage_erase_thresh
        if erase > (hc if hc is not None else 16384 // 10):
            raise ValueError(
                "--dosage-erase-threshold value cannot be larger than "
                "--hard-call-threshold value."
            )
        if cfg.import_dosage_certainty != 0.0:
            hc_eff = hc if hc is not None else DEFAULT_IMPORT_HARD_CALL_THRESH
            if hc_eff + cfg.import_dosage_certainty * 16384 >= 16384:
                raise ValueError(
                    "--hard-call-threshold + --import-dosage-certainty "
                    "settings conflict."
                )
        thresh_kw = dict(
            hard_call_thresh=hc,
            dosage_erase_thresh=erase,
            import_dosage_certainty=cfg.import_dosage_certainty,
            min_gq=cfg.vcf_min_gq, min_dp=cfg.vcf_min_dp,
            max_dp=cfg.vcf_max_dp,
            halfcall_mode=(
                cfg.vcf_half_call if cfg.vcf_half_call is not None else 3
            ),
        )
        if dosage_field == "GP" and not gp_force and \
                cfg.import_dosage_certainty == 0.0:
            # VcfToPgen errors when a FORMAT/DS header coexists with
            # unforced dosage=GP (2.0/plink2_import.cc:3000)
            from .io.vcf import _open_text
            with _open_text(path) as probe:
                for ln in probe:
                    if not ln.startswith("##"):
                        break
                    if ln.startswith("##FORMAT=<ID=DS,") or \
                            ln.startswith("##FORMAT=<ID=DS>"):
                        raise ValueError(
                            "--vcf dosage=GP specified, but "
                            "--import-dosage-certainty was not and FORMAT/DS "
                            "header line is present; use 'dosage=DS' or "
                            "'dosage=GP-force'."
                        )
    tmp = out_prefix + "-temporary"
    # VCF REF is trusted (not provisional), matching VcfToPgen
    if dosage_field:
        vi, si, codes, dosage_rows, ma_rows = read_vcf(
            path, dosage_field=dosage_field, **thresh_kw)
        if ma_rows:
            # the reference refuses this too (2.0/plink2_import.cc:3343)
            raise NotImplementedError(
                "--vcf multiallelic dosage import is under development."
            )
        # dosage rows are 6-tuples (dosage_ids, dosage_vals, dphase_ids,
        # dphase_deltas, phasepresent[N], phaseinfo[N]); HDS import (and
        # DS + phased-GT interplay) can produce hardcall-phase and explicit
        # dphase tracks alongside the dosages
        any_aux_phase = any(
            dr is not None and (dr[4].any() or dr[2].size)
            for dr in dosage_rows
        )
        with PgenWriter(tmp + ".pgen", si.sample_ct, vi.variant_ct,
                        trusted_ref=True, nonref_flags=vi.nonref,
                        with_dosage=True,
                        with_phase=any_aux_phase) as w:
            z16 = np.zeros(0, "<u2")
            zid = np.zeros(0, np.uint32)
            for r, dr in zip(codes, dosage_rows):
                if dr is None:
                    w.append_codes_with_dosage(r, zid, z16)
                elif any_aux_phase:
                    w.append_codes_with_phase(
                        r, dr[4], dr[5], dr[0], dr[1], dr[2], dr[3]
                    )
                else:
                    w.append_codes_with_dosage(r, dr[0], dr[1])
    else:
        vi, si, codes, phase_rows, ma_rows = read_vcf(
            path, with_phase=True, **thresh_kw)
        any_phase = any(pp is not None and pp[0].any() for pp in phase_rows)
        if ma_rows:
            acs = [len(str(a).split(",")) + 1 for a in vi.alt]
            with PgenWriter(tmp + ".pgen", si.sample_ct, vi.variant_ct,
                            trusted_ref=True, nonref_flags=vi.nonref,
                            with_multiallelic=True,
                            with_phase=any_phase) as w:
                z = np.zeros(0, np.int64)
                for r_i, r in enumerate(codes):
                    p = ma_rows.get(r_i)
                    pr = phase_rows[r_i] if any_phase else None
                    pp_, pi_ = (pr if pr is not None else (None, None))
                    if pp_ is not None and not pp_.any():
                        pp_ = pi_ = None
                    if p is None:
                        w.append_codes_multiallelic(
                            r, z, z, z, z, z, 2,
                            phasepresent=pp_, phaseinfo=pi_)
                    else:
                        w.append_codes_multiallelic(
                            r, *p, acs[r_i],
                            phasepresent=pp_, phaseinfo=pi_)
        elif any_phase:
            with PgenWriter(tmp + ".pgen", si.sample_ct, vi.variant_ct,
                            trusted_ref=True, nonref_flags=vi.nonref,
                            with_phase=True) as w:
                for r, pr in zip(codes, phase_rows):
                    pp, pi = pr
                    w.append_codes_with_phase(r, pp, pi)
        else:
            with PgenWriter(tmp + ".pgen", si.sample_ct, vi.variant_ct,
                            trusted_ref=True, nonref_flags=vi.nonref) as w:
                w.append_codes(codes)
    _apply_import_id_mode(si, cfg)
    write_pvar(tmp + ".pvar", vi)
    write_psam(tmp + ".psam", si)
    log.log(
        f"--vcf: {vi.variant_ct} variants, {si.sample_ct} samples imported from "
        f"{path}."
    )
    return load_dataset(tmp)


def _import_oxford(cfg: Config, log: RunLogger) -> Dataset:
    """--gen + --sample (or --data prefix): Oxford import via a temporary
    .pgen trio (OxGenToPgen, 2.0/plink2_import.cc)."""
    from .io.oxford import read_gen
    from .io.pgen_write import PgenWriter
    from .io.psam import write_psam
    from .io.pvar import write_pvar

    if cfg.data:
        gen_path = cfg.data[0] + ".gen"
        sample_path = cfg.sample or (cfg.data[0] + ".sample")
        mods = set(cfg.data[1:])
    else:
        gen_path = cfg.gen[0]
        mods = set(cfg.gen[1:])
        if not cfg.sample:
            raise ValueError("--gen requires --sample.")
        sample_path = cfg.sample
    ref_mode = "ref-last"
    for m in ("ref-first", "ref-last", "ref-unknown"):
        if m in mods:
            ref_mode = m
    vi, si, codes = read_gen(gen_path, sample_path, ref_mode)
    tmp = cfg.out + "-temporary"
    trusted = ref_mode != "ref-unknown"
    with PgenWriter(tmp + ".pgen", si.sample_ct, vi.variant_ct,
                    trusted_ref=trusted) as w:
        w.append_codes(codes)
    write_pvar(tmp + ".pvar", vi)
    write_psam(tmp + ".psam", si)
    log.log(
        f"--gen: {vi.variant_ct} variants, {si.sample_ct} samples imported "
        f"from {gen_path}."
    )
    return load_dataset(tmp)


def _import_bcf(cfg: Config, log: RunLogger) -> Dataset:
    """--bcf: BCF2.2 import via temporary pgen trio (phased hardcalls and
    multiallelic patches preserved, mirroring the VCF importer)."""
    from .io.bcf import read_bcf
    from .io.pgen_write import PgenWriter
    from .io.psam import write_psam
    from .io.pvar import write_pvar

    vi, si, codes, phase_rows, ma_rows = read_bcf(cfg.bcf[0],
                                                  with_phase=True)
    tmp = cfg.out + "-temporary"
    any_phase = any(pr is not None and pr[0].any() for pr in phase_rows)
    if ma_rows:
        acs = [len(str(a).split(",")) + 1 for a in vi.alt]
        with PgenWriter(tmp + ".pgen", si.sample_ct, vi.variant_ct,
                        trusted_ref=True, with_multiallelic=True,
                        with_phase=any_phase) as w:
            z = np.zeros(0, np.int64)
            for r_i in range(vi.variant_ct):
                p = ma_rows.get(r_i)
                pr = phase_rows[r_i] if any_phase else None
                pp_, pi_ = (pr if pr is not None else (None, None))
                if pp_ is not None and not pp_.any():
                    pp_ = pi_ = None
                if p is None:
                    w.append_codes_multiallelic(
                        codes[r_i], z, z, z, z, z, 2,
                        phasepresent=pp_, phaseinfo=pi_)
                else:
                    w.append_codes_multiallelic(
                        codes[r_i], *p, acs[r_i],
                        phasepresent=pp_, phaseinfo=pi_)
    elif any_phase:
        with PgenWriter(tmp + ".pgen", si.sample_ct, vi.variant_ct,
                        trusted_ref=True, with_phase=True) as w:
            for r_i in range(vi.variant_ct):
                pr = phase_rows[r_i]
                if pr is None:
                    pr = (np.zeros(si.sample_ct, bool),
                          np.zeros(si.sample_ct, bool))
                w.append_codes_with_phase(codes[r_i], pr[0], pr[1])
    else:
        with PgenWriter(tmp + ".pgen", si.sample_ct, vi.variant_ct,
                        trusted_ref=True) as w:
            w.append_codes(codes)
    write_pvar(tmp + ".pvar", vi)
    write_psam(tmp + ".psam", si)
    log.log(f"--bcf: {vi.variant_ct} variants, {si.sample_ct} samples "
            f"imported from {cfg.bcf[0]}.")
    return load_dataset(tmp)


def _import_eig(cfg: Config, log: RunLogger) -> Dataset:
    """--eigfile: Eigensoft packedancestrymap import via temporary pgen."""
    from .io.eig import read_eig
    from .io.pgen_write import PgenWriter
    from .io.psam import write_psam
    from .io.pvar import write_pvar

    vi, si, codes = read_eig(cfg.eigfile)
    tmp = cfg.out + "-temporary"
    with PgenWriter(tmp + ".pgen", si.sample_ct, vi.variant_ct,
                    trusted_ref=True) as w:
        w.append_codes(codes)
    write_pvar(tmp + ".pvar", vi)
    write_psam(tmp + ".psam", si)
    log.log(f"--eigfile: {vi.variant_ct} variants, {si.sample_ct} samples "
            f"imported from {cfg.eigfile}.geno .")
    return load_dataset(tmp)


def _import_tped(cfg: Config, log: RunLogger) -> Dataset:
    """--tped + --tfam (TpedToPgen, 2.0/plink2_import_legacy.cc)."""
    from .io.ped import read_tfam, read_tped
    from .io.pgen_write import PgenWriter
    from .io.psam import write_psam
    from .io.pvar import write_pvar

    if not cfg.tfam:
        raise ValueError("--tped requires --tfam.")
    si = read_tfam(cfg.tfam)
    vi, codes = read_tped(cfg.tped, si.sample_ct)
    tmp = cfg.out + "-temporary"
    with PgenWriter(tmp + ".pgen", si.sample_ct, vi.variant_ct) as w:
        w.append_codes(codes)
    write_pvar(tmp + ".pvar", vi)
    write_psam(tmp + ".psam", si)
    log.log(f"--tped: {vi.variant_ct} variants, {si.sample_ct} samples "
            f"imported from {cfg.tped}.")
    return load_dataset(tmp)


def _import_dosage_file(cfg: Config, log: RunLogger) -> Dataset:
    """--import-dosage: PLINK 1.x-style allele dosage file -> pgen with a
    dosage track (ref Plink1DosageToPgen, 2.0/plink2_import.cc; file
    grammar shared with 1.9 --dosage: header 'SNP A1 A2' + FID/IID pairs,
    format=1/2/3, skip0/1/2, dose1, noheader)."""
    import gzip

    from .io.pgen_write import PgenWriter
    from .io.psam import read_psam, write_psam
    from .io.pvar import VariantInfo, write_pvar
    from .utils.chrom import ChrInfo

    args = cfg.import_dosage
    path = args[0]
    mods = args[1:]
    fmt = 2
    skip0 = skip1 = skip2 = 0
    noheader = dose1 = False
    ref_first = False
    single_chr = None
    chr_col = pos_col = None
    id_delim = None
    for m in mods:
        if m.startswith("format="):
            fmt = int(m.split("=")[1])
        elif m.startswith("skip0="):
            skip0 = int(m.split("=")[1])
        elif m.startswith("skip1="):
            skip1 = int(m.split("=")[1])
        elif m.startswith("skip2="):
            skip2 = int(m.split("=")[1])
        elif m == "noheader":
            noheader = True
        elif m == "dose1":
            dose1 = True
        elif m == "ref-first":
            ref_first = True
        elif m == "ref-last":
            ref_first = False
        elif m.startswith("single-chr="):
            single_chr = m.split("=")[1]
        elif m.startswith("chr-col-num="):
            chr_col = int(m.split("=")[1]) - 1
        elif m.startswith("pos-col-num="):
            pos_col = int(m.split("=")[1]) - 1
        elif m.startswith("id-delim="):
            id_delim = m.split("=")[1]
        else:
            raise FlagError(f"--import-dosage: unknown modifier '{m}'.")
    psam_path = cfg.psam or cfg.fam
    if not psam_path:
        raise FlagError("--import-dosage requires --psam/--fam.")
    si = read_psam(psam_path)
    n = si.sample_ct

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        lines = [l.split() for l in f if l.strip()]
    vals_per = {1: 1, 2: 2, 3: 3}[fmt]
    id0 = skip0 + skip1 + skip2 + 3
    if noheader:
        order = list(range(n))
        body = lines
    else:
        hdr = lines[0]
        ids = hdr[id0:]
        if id_delim:
            pairs = [tuple(x.split(id_delim, 1)) for x in ids]
        else:
            pairs = [(ids[2 * k], ids[2 * k + 1])
                     for k in range(len(ids) // 2)]
        by_id = {(str(si.fid[i]), str(si.iid[i])): i for i in range(n)}
        by_iid = {str(si.iid[i]): i for i in range(n)}
        order = []
        for fid_, iid_ in pairs:
            i = by_id.get((fid_, iid_), by_iid.get(iid_, -1))
            order.append(i)
        body = lines[1:]

    # optional .map for variant metadata
    map_meta = {}
    if cfg.map:
        with open(cfg.map) as f:
            for ln in f:
                t = ln.split()
                if len(t) >= 4:
                    map_meta[t[1]] = (t[0], int(t[3]))
    ci = ChrInfo()
    chroms, poss, vids, refs, alts = [], [], [], [], []
    rows = []
    dos_rows = []
    hc_halfdist = 8192 - (cfg.hard_call_thresh
                          if cfg.hard_call_thresh is not None
                          else 16384 // 10)
    for t in body:
        vid, a1, a2 = t[skip0], t[skip0 + skip1 + 1], t[skip0 + skip1 + 2]
        toks = t[id0:]
        d = np.full(n, np.nan)
        for k, i in enumerate(order):
            if i < 0:
                continue
            chunk = toks[k * vals_per : (k + 1) * vals_per]
            if len(chunk) < vals_per:
                continue
            try:
                vv = [float(x) for x in chunk]
            except ValueError:
                continue
            if fmt == 1:
                dd = vv[0] * (2.0 if dose1 else 1.0)
            elif fmt == 2:
                dd = 2.0 * vv[0] + vv[1]
            else:
                dd = 2.0 * vv[0] + vv[1]
            if 0.0 <= dd <= 2.0:
                d[i] = dd
        # A1 dosage -> ALT dosage (A1 = ALT under default ref-last)
        alt_d = d if not ref_first else d
        if ref_first:
            ref, alt = a1, a2
            alt_d = 2.0 - d
        else:
            ref, alt = a2, a1
        dint = np.round(alt_d * 16384.0)
        fin = np.isfinite(dint)
        dint_i = dint[fin].astype(np.int64)
        halfdist = np.abs((dint_i & 16383) - 8192)
        g = np.full(n, 3, np.uint8)
        g[np.flatnonzero(fin)] = np.where(
            halfdist < hc_halfdist, 3, (dint_i + 8192) >> 14
        ).astype(np.uint8)
        store = halfdist < 8192
        dids = np.flatnonzero(fin)[store].astype(np.uint32)
        dvals = dint_i[store].astype("<u2")
        rows.append(g)
        dos_rows.append((dids, dvals))
        if vid in map_meta:
            ch, pos = map_meta[vid]
        else:
            ch = single_chr if single_chr is not None else (
                t[chr_col] if chr_col is not None else "0")
            pos = int(t[pos_col]) if pos_col is not None else 0
        chroms.append(ci.code(str(ch)))
        poss.append(pos)
        vids.append(vid)
        refs.append(ref)
        alts.append(alt)

    vi = VariantInfo(
        chrom=np.array(chroms, np.int16), pos=np.array(poss, np.int32),
        vid=np.array(vids, dtype=object), ref=np.array(refs, dtype=object),
        alt=np.array(alts, dtype=object), chr_info=ci,
    )
    tmp = cfg.out + "-temporary"
    with PgenWriter(tmp + ".pgen", n, vi.variant_ct,
                    with_dosage=True) as w:
        for g, (dids, dvals) in zip(rows, dos_rows):
            w.append_codes_with_dosage(g, dids, dvals)
    write_pvar(tmp + ".pvar", vi)
    write_psam(tmp + ".psam", si)
    log.log(
        f"--import-dosage: {vi.variant_ct} variants, {n} samples imported "
        f"from {path}."
    )
    return load_dataset(tmp)


def _import_bgen(cfg: Config, log: RunLogger) -> Dataset:
    """--bgen [+ --sample]: BGEN import via a temporary .pgen trio."""
    from .io.bgen import read_bgen
    from .io.pgen_write import PgenWriter
    from .io.psam import write_psam
    from .io.pvar import write_pvar

    mods = set(cfg.bgen[1:])
    ref_mode = "ref-last"
    for m in ("ref-first", "ref-last", "ref-unknown"):
        if m in mods:
            ref_mode = m
    vi, si, codes, aux_rows, skipped_ma = read_bgen(
        cfg.bgen[0], cfg.sample, ref_mode,
        hard_call_thresh=cfg.hard_call_thresh,
        dosage_erase_thresh=cfg.dosage_erase_thresh,
        import_dosage_certainty=cfg.import_dosage_certainty,
    )
    if skipped_ma:
        log.log(
            f"Warning: {skipped_ma} multiallelic variant"
            f"{'s' if skipped_ma != 1 else ''} skipped (not yet supported)."
        )
    tmp = cfg.out + "-temporary"
    any_dosage = any(a is not None and a[0].size for a in aux_rows)
    any_phase = any(
        a is not None and (a[4].any() or a[2].size) for a in aux_rows
    )
    trusted = ref_mode != "ref-unknown"
    if any_dosage or any_phase:
        with PgenWriter(tmp + ".pgen", si.sample_ct, vi.variant_ct,
                        trusted_ref=trusted, with_dosage=any_dosage,
                        with_phase=any_phase) as w:
            z16 = np.zeros(0, "<u2")
            zid = np.zeros(0, np.uint32)
            for r, a in zip(codes, aux_rows):
                if a is None:
                    if any_phase:
                        w.append_codes_with_phase(
                            r, np.zeros(r.size, bool), np.zeros(r.size, bool),
                            zid, z16, np.zeros(0, np.uint32),
                            np.zeros(0, "<i2"))
                    else:
                        w.append_codes_with_dosage(r, zid, z16)
                elif any_phase:
                    w.append_codes_with_phase(r, a[4], a[5], a[0], a[1],
                                              a[2], a[3])
                else:
                    w.append_codes_with_dosage(r, a[0], a[1])
    else:
        with PgenWriter(tmp + ".pgen", si.sample_ct, vi.variant_ct,
                        trusted_ref=trusted) as w:
            w.append_codes(codes)
    write_pvar(tmp + ".pvar", vi)
    write_psam(tmp + ".psam", si)
    log.log(
        f"--bgen: {vi.variant_ct} variants, {si.sample_ct} samples imported "
        f"from {cfg.bgen[0]}."
    )
    return load_dataset(tmp)


def _import_pedmap(prefix: str, out_prefix: str, log: RunLogger) -> Dataset:
    """Convert .ped/.map to an in-memory dataset backed by a temp .pgen."""
    from .io.ped import read_map, read_ped
    from .io.pgen_write import PgenWriter
    from .io.psam import write_psam
    from .io.pvar import write_pvar

    vi = read_map(prefix + ".map")
    si, codes = read_ped(prefix + ".ped", vi)
    tmp = out_prefix + "-temporary"
    with PgenWriter(tmp + ".pgen", si.sample_ct, vi.variant_ct) as w:
        w.append_codes(codes)
    write_pvar(tmp + ".pvar", vi)
    write_psam(tmp + ".psam", si)
    log.log(f"--file: {vi.variant_ct} variants, {si.sample_ct} samples imported from "
            f"{prefix}.ped + .map.")
    return load_dataset(tmp)


def _generate_dummy(cfg: Config, log: RunLogger) -> Dataset:
    """--dummy: synthetic panel generator (ref: GenerateDummy,
    2.0/plink2_import.cc:16326)."""
    from .commands.dummy import generate_dummy

    return generate_dummy(cfg, log)


def _run_loop_cats(cfg: Config) -> int:
    """--loop-cats: re-run variant filters + commands once per category of
    a categorical phenotype/covariate, with the sample set restricted to
    that category and outputs named <out>.<catname>.* (ref Plink2Core
    loop, 2.0/plink2.cc:2010-2034)."""
    import copy
    import tempfile

    prefix = cfg.pfile or cfg.bfile
    if not prefix:
        raise FlagError("--loop-cats requires --pfile/--bfile input.")
    ds = load_dataset(prefix, missing_pheno=cfg.input_missing_phenotype)
    name = cfg.loop_cats
    pc = ds.si.phenos.get(name)
    if pc is None and cfg.pheno:
        from .commands.glm import _match_rows, _read_table
        from .io.psam import _build_pheno

        id_mode, ids, colnames, vals = _read_table(cfg.pheno)
        rows = _match_rows(ds, id_mode, ids)
        if name in colnames:
            c_ = colnames.index(name)
            col = ["NA"] * ds.raw_sample_ct
            for r_, idx in enumerate(rows):
                if idx >= 0:
                    col[idx] = vals[r_][c_]
            pc = _build_pheno(name, col)
    if pc is None and cfg.covar:
        from .commands.glm import _match_rows, _read_table
        from .io.psam import _build_pheno

        id_mode, ids, colnames, vals = _read_table(cfg.covar)
        rows = _match_rows(ds, id_mode, ids)
        if name in colnames:
            c_ = colnames.index(name)
            col = ["NA"] * ds.raw_sample_ct
            for r_, idx in enumerate(rows):
                if idx >= 0:
                    col[idx] = vals[r_][c_]
            pc = _build_pheno(name, col)
    if pc is None:
        raise FlagError(f"--loop-cats: phenotype '{name}' not found.")
    if pc.kind != "cat":
        raise FlagError(f"--loop-cats: '{name}' is not categorical.")

    user_keep_ids = None
    if cfg.keep:
        user_keep_ids = set()
        with open(cfg.keep) as f:
            for ln in f:
                t = ln.split()
                if t:
                    user_keep_ids.add(t[-1])  # IID (last of FID IID / IID)

    rc_any = 0
    si = ds.si
    for code, cat in enumerate(pc.categories):
        if code == 0:
            continue  # missing-category sentinel
        members = np.flatnonzero(pc.data == code)
        if user_keep_ids is not None:
            members = np.array(
                [i for i in members if str(si.iid[i]) in user_keep_ids],
                dtype=np.int64)
        if members.size == 0:
            continue
        with tempfile.NamedTemporaryFile(
                "w", suffix=".keep", delete=False) as kf:
            for i in members:
                kf.write(f"{si.fid[i]}\t{si.iid[i]}\n"
                         if si.has_fid else f"{si.iid[i]}\n")
            keep_path = kf.name
        try:
            cfg2 = copy.copy(cfg)
            cfg2.loop_cats = None
            cfg2.keep = keep_path
            cfg2.out = f"{cfg.out}.{cat}"
            # the loop-cats column is consumed by the loop (the reference
            # clears it from the pheno/covar sets inside Plink2Core)
            cfg2.drop_pheno_names = cfg.drop_pheno_names + (name,)
            rc = run_pipeline(cfg2)
            rc_any = rc_any or rc
        finally:
            os.unlink(keep_path)
    return rc_any


def _degenerate_data_checks(cfg: Config, ds, log: RunLogger) -> None:
    """Driver-level degenerate-data guards (ref 2.0/plink2.cc:2065-2105):
    * LD-estimating commands with <50 founders error unless --bad-ld;
    * commands needing decent allele frequencies (--score[-list],
      --check-sex/--impute-sex, --het) with <50 founders error unless
      --read-freq / --bad-freqs / enough samples under --nonfounders;
    * --mac/--max-mac/"--freq counts" with nonfounders present require
      --ac-founders or --nonfounders.
    """
    founder_ct = int(ds.founder_mask.sum())
    sample_ct = ds.raw_sample_ct
    ld_needed = bool(cfg.indep_pairwise or cfg.indep_pairphase or cfg.ld)
    if ld_needed and founder_ct < 50 and not cfg.bad_ld:
        if sample_ct < 50:
            raise ValueError(
                "This run estimates linkage disequilibrium between "
                "variants, but there are less than 50 samples to estimate "
                "from.  You should perform this operation on a larger "
                "dataset.\n(Strictly speaking, you can also override this "
                "error with --bad-ld, but this is almost always a bad "
                "idea.)")
        raise ValueError(
            "This run estimates linkage disequilibrium between variants, "
            "but there are less than 50 founders to estimate from.  "
            "--make-founders may help.\n(Strictly speaking, you can also "
            "override this error with --bad-ld, but this is almost always "
            "a bad idea.)")
    decent_needed = bool(cfg.score or cfg.score_list or cfg.check_sex
                         or cfg.impute_sex or cfg.het)
    if decent_needed and not cfg.read_freq and not cfg.bad_freqs and (
            sample_ct < 50
            or (not cfg.nonfounders and founder_ct < 50)):
        if not cfg.nonfounders and sample_ct >= 50:
            raise ValueError(
                "This run requires decent allele frequencies, but they "
                "aren't being loaded with --read-freq, and less than 50 "
                "founders are available to impute them from.  Possible "
                "solutions:\n* You can use --nonfounders to include "
                "nonfounders when imputing allele\n  frequencies.\n* You "
                "can generate (with --freq) or obtain an allele frequency "
                "file based on a\n  larger similar-population reference "
                "dataset, and load it with --read-freq.\n* (Not "
                "recommended) You can override this error with "
                "--bad-freqs.")
        raise ValueError(
            "This run requires decent allele frequencies, but they aren't "
            "being loaded with --read-freq, and less than 50 samples are "
            "available to impute them from.\nYou should generate (with "
            "--freq) or obtain an allele frequency file based on a larger "
            "similar-population reference dataset, and load it with "
            "--read-freq.")
    wants_counts = (cfg.mac is not None or cfg.max_mac is not None
                    or (cfg.freq and cfg.freq_counts
                        and not cfg.read_freq))
    if wants_counts and sample_ct != founder_ct and not cfg.nonfounders \
            and not cfg.ac_founders:
        raise ValueError(
            '--mac/--max-mac/"--freq counts" specified, but with neither\n'
            "--ac-founders nor --nonfounders; and nonfounders are "
            "present.")


def run_pipeline(cfg: Config) -> int:
    if cfg.loop_cats:
        return _run_loop_cats(cfg)
    if cfg.zst_decompress:
        from .io.compress import zst_decompress

        return zst_decompress(
            cfg.zst_decompress[0],
            cfg.zst_decompress[1] if len(cfg.zst_decompress) > 1 else None,
        )
    log = RunLogger(cfg.out, silent=cfg.silent)
    set_logger(log)
    log.banner(["plink2t"] + cfg.argv)
    if cfg.seed is not None:
        np.random.seed(cfg.seed)
    try:
        # file-only commands that need no genotype input
        if cfg.cfile or cfg.cnv_list:
            from .commands.cnv import run_cnv

            run_cnv(cfg, log)
            log.log(f"End of run; total wall-clock {log.elapsed():.2f}s.")
            return 0
        if cfg.dosage is not None:
            from .commands.dosage19 import run_dosage

            run_dosage(cfg, log)
            log.log(f"End of run; total wall-clock {log.elapsed():.2f}s.")
            return 0
        if cfg.unrelated_heritability is not None and (
                cfg.grm_bin or cfg.grm_gz):
            from .commands.herit import run_unrelated_heritability

            run_unrelated_heritability(cfg, log)
            log.log(f"End of run; total wall-clock {log.elapsed():.2f}s.")
            return 0
        if cfg.meta_analysis:
            from .commands.meta import run_meta_analysis

            run_meta_analysis(cfg, log)
            log.log(f"End of run; total wall-clock {log.elapsed():.2f}s.")
            return 0
        if cfg.gene_report is not None:
            from .commands.gene_report import run_gene_report

            run_gene_report(cfg, log)
            log.log(f"End of run; total wall-clock {log.elapsed():.2f}s.")
            return 0
        if cfg.annotate is not None:
            from .commands.annotate import run_annotate

            run_annotate(cfg, log)
            log.log(f"End of run; total wall-clock {log.elapsed():.2f}s.")
            return 0
        if cfg.adjust_file or cfg.gwas_ssf:
            if cfg.adjust_file:
                from .commands.adjust import run_adjust_file

                run_adjust_file(cfg, log)
            if cfg.gwas_ssf:
                from .commands.gwas_ssf import run_gwas_ssf

                run_gwas_ssf(cfg, log)
            log.log(f"End of run; total wall-clock {log.elapsed():.2f}s.")
            return 0
        if cfg.pmerge or cfg.pmerge_list:
            from .commands.pmerge import run_pmerge

            merged_prefix = run_pmerge(cfg, log)
            ds = load_dataset(merged_prefix)
        else:
            ds = _load(cfg, log)
        log.log(
            f"{ds.raw_variant_ct} variants and {ds.raw_sample_ct} samples loaded."
        )
        if cfg.output_chr != "MT":
            ds.vi.chr_info.set_output_chr(cfg.output_chr)
        if cfg.prune or cfg.require_pheno is not None \
                or cfg.require_covar is not None:
            F.require_pheno_filter(ds, cfg, log)
        _degenerate_data_checks(cfg, ds, log)
        if cfg.read_freq:
            # --read-freq: externally supplied allele frequencies override
            # computed ones wherever freqs are consumed
            ov = {}
            with open(cfg.read_freq) as f:
                hdr = f.readline().lstrip("#").split()
                idc = hdr.index("ID")
                fc = hdr.index("ALT_FREQS")
                for ln in f:
                    t = ln.split()
                    try:
                        ov[t[idc]] = float(t[fc])
                    except ValueError:
                        pass
            fo = np.full(ds.raw_variant_ct, np.nan)
            for i, vid_ in enumerate(ds.vi.vid):
                if str(vid_) in ov:
                    fo[i] = ov[str(vid_)]
            ds.freq_override = fo
            log.log(f"--read-freq: {int(np.isfinite(fo).sum())} frequencies loaded.")
        if cfg.pheno:
            # 2.0 psam input: --pheno APPENDS to the psam phenotype columns;
            # they are only dropped when --pheno-name/--pheno-col-nums is
            # also given (ref ignore_psam_phenos, 2.0/plink2.cc:955).
            # plink1 filesets (.fam/.ped col-6 phenotype): --pheno REPLACES
            # the fam phenotype (1.9 semantics; the fam column has no name
            # of its own to coexist under).
            from .commands.glm import _match_rows, _read_table
            from .io.psam import _build_pheno

            id_mode, ids, colnames, vals = _read_table(cfg.pheno)
            rows = _match_rows(ds, id_mode, ids)
            n_raw = ds.raw_sample_ct
            plink1_fam = cfg.pfile is None and cfg.vcf is None \
                and cfg.bcf is None
            phenos = {} if (getattr(cfg, "pheno_name", None) or plink1_fam) \
                else dict(ds.si.phenos)
            for c_, nm_ in enumerate(colnames):
                col = ["NA"] * n_raw
                for r_, idx in enumerate(rows):
                    if idx >= 0:
                        col[idx] = vals[r_][c_]
                phenos[nm_] = _build_pheno(nm_, col)
            ds.si.phenos = phenos

        if cfg.af_pseudocount:
            ds.af_pseudocount = cfg.af_pseudocount
        if cfg.drop_pheno_names:
            for nm_ in cfg.drop_pheno_names:
                ds.si.phenos.pop(nm_, None)

        # ---- sample filters (plink2.cc:1325-1899 order) ----
        from .commands import filters as F

        if cfg.update_ids or cfg.update_parents:
            from .commands import update_meta as U

            if cfg.update_ids:
                U.update_ids(ds, cfg.update_ids, log)
            if cfg.update_parents:
                U.update_parents(ds, cfg.update_parents, log)

        if cfg.keep:
            F.keep_remove_samples(ds, cfg.keep, keep=True, log=log)
        if cfg.remove:
            F.keep_remove_samples(ds, cfg.remove, keep=False, log=log)
        if cfg.keep_females:
            ds.sample_mask &= ds.female_mask()
            ds.invalidate_counts()
            log.log(f"--keep-females: {ds.sample_ct} samples remaining.")
        if cfg.keep_males:
            ds.sample_mask &= ds.male_mask()
            ds.invalidate_counts()
            log.log(f"--keep-males: {ds.sample_ct} samples remaining.")
        if cfg.update_sex:
            F.update_sex(ds, cfg.update_sex, log)
        if (cfg.keep_cats or cfg.keep_cat_names or cfg.remove_cats
                or cfg.remove_cat_names):
            F.keep_remove_cats(ds, cfg, log)
        if cfg.keep_if:
            F.keep_remove_if(ds, cfg, cfg.keep_if, keep=True, log=log)
        if cfg.remove_if:
            F.keep_remove_if(ds, cfg, cfg.remove_if, keep=False, log=log)
        if cfg.keep_founders:
            F.keep_founders_filter(ds, True, log)
        if cfg.keep_nonfounders:
            F.keep_founders_filter(ds, False, log)
        if cfg.mind is not None:
            F.mind_filter(ds, cfg.mind, log)
        if ds.sample_ct == 0:
            raise ValueError("No samples remaining after main filters.")

        if cfg.fa and (cfg.ref_from_fa is not None or cfg.normalize):
            from .commands.fasta import process_fa

            process_fa(ds, cfg, log)

        # ---- variant metadata edits, then variant filters ----
        if cfg.allelexxxx is not None:
            from .commands.update_meta import allelexxxx_recode

            allelexxxx_recode(ds, cfg.allelexxxx[0], cfg.allelexxxx[1], log)
        if cfg.update_name or cfg.update_map or cfg.update_alleles:
            from .commands import update_meta as U

            if cfg.update_name:
                U.update_name(ds, cfg.update_name, log)
            if cfg.update_map:
                U.update_map(ds, cfg.update_map, log)
            if cfg.update_alleles:
                U.update_alleles(ds, cfg.update_alleles, log)
        if cfg.extract:
            F.extract_exclude_variants(ds, cfg.extract, extract=True, log=log)
        if cfg.extract_intersect:
            F.extract_intersect(ds, cfg.extract_intersect, log)
        if cfg.minimac3_r2_filter is not None:
            F.minimac3_r2_filter(ds, cfg.minimac3_r2_filter[0],
                                 cfg.minimac3_r2_filter[1], log)
        if cfg.mach_r2_filter is not None:
            F.mach_r2_filter(ds, cfg.mach_r2_filter[0],
                             cfg.mach_r2_filter[1], log)
        if cfg.bp_space is not None:
            F.bp_space_filter(ds, cfg.bp_space, log)
        if cfg.extract_if_info:
            F.info_expr_filter(ds, cfg.extract_if_info, extract=True, log=log)
        if cfg.exclude_if_info:
            F.info_expr_filter(ds, cfg.exclude_if_info, extract=False,
                               log=log)
        if cfg.require_info:
            F.require_info_filter(ds, cfg.require_info, require=True, log=log)
        if cfg.require_no_info:
            F.require_info_filter(ds, cfg.require_no_info, require=False,
                                  log=log)
        if cfg.exclude:
            F.extract_exclude_variants(ds, cfg.exclude, extract=False, log=log)
        if (cfg.snp or cfg.snps or cfg.exclude_snp or cfg.exclude_snps
                or cfg.from_id or cfg.to_id):
            F.snp_window_filter(ds, cfg, log)
        if cfg.chr:
            F.filter_chr(ds, cfg.chr, log, keep=True)
        if cfg.not_chr:
            F.filter_chr(ds, cfg.not_chr, log, keep=False)
        if cfg.autosome:
            F.filter_autosomes(ds, log)
        if cfg.autosome_par:
            F.filter_autosomes(ds, log, include_par=True)
        if cfg.from_bp is not None:
            ds.variant_mask &= ds.vi.pos >= cfg.from_bp
        if cfg.to_bp is not None:
            ds.variant_mask &= ds.vi.pos <= cfg.to_bp
        if cfg.snps_only:
            F.snps_only_filter(ds, cfg.snps_only_acgt, log)
        if cfg.min_alleles is not None or cfg.max_alleles is not None:
            F.allele_ct_filter(ds, cfg.min_alleles, cfg.max_alleles, log)
        if cfg.var_min_qual is not None:
            F.var_qual_filter(ds, cfg.var_min_qual, log)
        if cfg.var_filter is not None:
            F.var_filter_filter(ds, cfg.var_filter, log)
        if cfg.set_all_var_ids:
            F.set_all_var_ids(ds, cfg.set_all_var_ids, log)
        if cfg.set_missing_var_ids:
            F.set_missing_var_ids(ds, cfg.set_missing_var_ids, log)
        if cfg.ref_allele:
            F.ref_alt_allele(ds, cfg.ref_allele, set_ref=True, log=log)
        if cfg.alt_allele:
            F.ref_alt_allele(ds, cfg.alt_allele, set_ref=False, log=log)
        if cfg.sort_vars:
            F.sort_vars(ds, log)
        if cfg.maj_ref:
            F.maj_ref(ds, log)
        if cfg.recover_var_ids:
            F.recover_var_ids(ds, cfg.recover_var_ids, log)
        if cfg.rm_dup is not None:
            F.rm_dup(ds, cfg.rm_dup, log)
        if cfg.thin is not None or cfg.thin_count is not None:
            F.thin_variants(ds, cfg.thin, cfg.thin_count, cfg, log)
        if cfg.thin_indiv is not None \
                or cfg.thin_indiv_count is not None:
            F.thin_samples(ds, cfg.thin_indiv, cfg.thin_indiv_count,
                           cfg, log)

        # --pheno-svd replaces the phenotype set before any analysis,
        # matching the reference's early driver position (plink2.cc:1899)
        if cfg.pheno_svd:
            from .commands.pheno_svd import run_pheno_svd

            run_pheno_svd(ds, cfg, log)

        # ---- counts-based reports and enforcement, in the reference's exact
        # order (plink2.cc:2310-2479): freq -> geno-counts -> missing ->
        # --geno enforcement -> hardy -> --hwe -> --maf/--mac ----
        from .commands import basic_reports as R

        if cfg.freq:
            with log.phase("--freq"):
                R.write_freq(ds, cfg.out, log,
                             founders_only=not cfg.nonfounders,
                             zs=cfg.freq_zs, counts=cfg.freq_counts,
                             cols=cfg.freq_cols)
        if cfg.geno_counts:
            with log.phase("--geno-counts"):
                R.write_geno_counts(ds, cfg.out, log, zs=cfg.geno_counts_zs)
        if cfg.missing:
            with log.phase("--missing"):
                R.write_missing(ds, cfg.out, log, zs=cfg.missing_zs)
        if cfg.geno is not None:
            F.geno_filter(ds, cfg.geno, log)
        if cfg.hardy:
            R.write_hardy(ds, cfg.out, log, midp=cfg.hardy_midp,
                          founders_only=not cfg.nonfounders,
                          zs=cfg.hardy_zs)
        if cfg.hwe is not None:
            F.hwe_filter(ds, cfg.hwe, cfg.hwe_midp, log)
        if any(v is not None for v in (cfg.maf, cfg.max_maf, cfg.mac, cfg.max_mac)):
            F.maf_filter(ds, log, cfg.maf, cfg.max_maf, cfg.mac, cfg.max_mac,
                         nonfounders=cfg.nonfounders)

        # ---- 1.9 set definitions (--set/--make-set): after all QC
        # filters, may itself narrow the variant set via --gene/--gene-all
        # (define_sets call position, 1.9/plink.c filter pipeline) ----
        ds.set_info = None
        if cfg.set_file or cfg.make_set:
            from .commands.sets import define_sets, run_write_set

            ds.set_info = define_sets(ds, cfg, log)
            if ds.set_info is not None and (cfg.write_set or cfg.set_table):
                run_write_set(ds, ds.set_info, cfg, log)

        # ---- relationship / matrix commands ----
        if cfg.make_king or cfg.make_king_table or cfg.king_cutoff is not None:
            from .commands.king import run_king

            with log.phase('--make-king'):
                run_king(ds, cfg, log)
        if cfg.make_grm_bin or cfg.make_grm_list or cfg.make_rel or cfg.pca is not None:
            from .commands.grm import run_grm_pca

            with log.phase('--make-grm/--pca'):
                run_grm_pca(ds, cfg, log)

        # ---- sample reports ----
        if cfg.het:
            from .commands.het import write_het

            write_het(ds, cfg.out, log,
                      small_sample=cfg.het_small_sample)
        if cfg.sample_counts:
            from .commands.sample_counts import write_sample_counts

            write_sample_counts(ds, cfg.out, log)
        if cfg.fst:
            from .commands.fst import run_fst

            run_fst(ds, cfg, log)
        if cfg.mendel:
            from .commands.mendel import run_mendel

            run_mendel(ds, cfg, log)
        if cfg.sdiff:
            from .commands.sdiff import run_sdiff

            run_sdiff(ds, cfg, log)
        if cfg.pgen_diff:
            from .commands.pgen_diff import run_pgen_diff

            run_pgen_diff(ds, cfg, log)

        if cfg.check_sex is not None or cfg.impute_sex is not None:
            from .commands.check_sex import run_check_sex

            run_check_sex(ds, cfg, log, impute=cfg.impute_sex is not None)

        # ---- dataset writers ----
        if cfg.write_samples:
            path = cfg.out + ".id"
            si = ds.si
            inc = np.flatnonzero(ds.sample_mask)
            use_fid = si.has_fid and any(str(si.fid[i]) != "0" for i in inc)
            with open(path, "w") as f:
                f.write(("#FID\tIID" if use_fid else "#IID") + "\n")
                for i in inc:
                    f.write((f"{si.fid[i]}\t{si.iid[i]}" if use_fid else str(si.iid[i])) + "\n")
            log.log(f"--write-samples: Sample IDs written to {path} .")
        if cfg.write_snplist:
            from .io.compress import open_out

            f, path = open_out(cfg.out + ".snplist", cfg.write_snplist_zs)
            with f:
                for i in np.flatnonzero(ds.variant_mask):
                    f.write(str(ds.vi.vid[i]) + "\n")
            log.log(f"--write-snplist: IDs written to {path} .")
        if cfg.genotyping_rate is not None:
            F.genotyping_rate(ds, log)
        if cfg.pgen_info:
            src_path = (cfg.pfile + ".pgen") if cfg.pfile else "input.pgen"
            F.pgen_info(ds, src_path, log)
        if cfg.validate:
            src_path = (cfg.pfile + ".pgen") if cfg.pfile else "input.pgen"
            F.validate_pgen(ds, src_path, log)
        if cfg.indiv_sort:
            ds.sample_order = F.indiv_sort_order(ds, cfg.indiv_sort, log)
        if cfg.make_just_psam or cfg.make_just_pvar:
            from .io.psam import write_psam
            from .io.pvar import write_pvar

            if cfg.make_just_psam:
                write_psam(cfg.out + ".psam", ds.si, ds.sample_mask)
                log.log(f"--make-just-psam: {cfg.out}.psam written.")
            if cfg.make_just_pvar:
                write_pvar(cfg.out + ".pvar", ds.vi, ds.variant_mask)
                log.log(f"--make-just-pvar: {cfg.out}.pvar written.")
        if cfg.make_pgen or cfg.make_bed:
            from .commands.make_pgen import make_pgen

            if cfg.make_bed:
                make_pgen(ds, cfg.out, log, fmt="bed")
            if cfg.make_pgen:
                make_pgen(ds, cfg.out, log, fmt="pgen")
        if cfg.export_fmts:
            from .commands.export import run_export

            with log.phase('--export'):
                run_export(ds, cfg, log)

        # ---- LD / scoring / association ----
        if cfg.indep_pairwise:
            from .commands.ld import indep_pairwise

            indep_pairwise(ds, cfg, log)
        if cfg.indep_pairphase:
            from .commands.ld import indep_pairwise

            indep_pairwise(ds, cfg, log, phased=True)
        if cfg.vcor:
            from .commands.vcor import run_vcor

            with log.phase('--r2/--r'):
                run_vcor(ds, cfg, log)
        if cfg.ld:
            from .commands.ld_console import run_ld_console

            run_ld_console(ds, cfg, log)
        if cfg.variant_score:
            from .commands.vscore import run_vscore

            run_vscore(ds, cfg, log)
        if cfg.score or cfg.score_list:
            from .commands.score import score_report

            with log.phase('--score'):
                score_report(ds, cfg, log)
        if cfg.glm:
            from .commands.glm import run_glm

            with log.phase('--glm'):
                run_glm(ds, cfg, log)
        if cfg.linear19 is not None or cfg.logistic19 is not None:
            from .commands.glm19 import run_glm19

            if cfg.linear19 is not None:
                run_glm19(ds, cfg, log, linear=True)
            if cfg.logistic19 is not None:
                run_glm19(ds, cfg, log, linear=False)
        if cfg.assoc or cfg.model:
            from .commands import assoc19

            if cfg.assoc:
                _pc = next(iter(ds.si.phenos.values()), None)
                if _pc is not None and _pc.kind == "qt":
                    from .commands.qassoc import run_qassoc

                    run_qassoc(ds, cfg, log)
                else:
                    assoc19.run_assoc(ds, cfg, log)
            if cfg.model:
                assoc19.run_model(ds, cfg, log)
        if cfg.recode19:
            from .commands.recode19 import run_recode19

            run_recode19(ds, cfg, log)
        if cfg.genome:
            from .commands.genome import run_genome

            run_genome(ds, cfg, log)
        if cfg.distance is not None or cfg.distance_matrix or cfg.ibs_matrix:
            from .commands.distance import run_distance

            run_distance(ds, cfg, log)
        if cfg.cluster is not None or cfg.neighbour is not None:
            from .commands.cluster import run_cluster

            run_cluster(ds, cfg, log)
        elif cfg.mds_plot is not None:
            raise FlagError("--mds-plot must be used with --cluster.")
        if cfg.homozyg is not None or any(
                getattr(cfg, f) is not None for f in (
                    "homozyg_snp", "homozyg_kb", "homozyg_density",
                    "homozyg_gap", "homozyg_het", "homozyg_window_snp",
                    "homozyg_window_het", "homozyg_window_missing",
                    "homozyg_window_threshold", "homozyg_match")):
            from .commands.homozyg import run_homozyg

            run_homozyg(ds, cfg, log)
        if cfg.blocks is not None:
            from .commands.blocks import run_blocks

            run_blocks(ds, cfg, log)
        if cfg.tdt is not None:
            from .commands.family import run_tdt

            run_tdt(ds, cfg, log)
        if cfg.tucc is not None:
            from .commands.tucc import run_tucc

            run_tucc(ds, cfg, log)
        if cfg.make_perm_pheno is not None:
            from .commands.perm_pheno import run_make_perm_pheno

            run_make_perm_pheno(ds, cfg, log)
        if cfg.ibs_test is not None:
            from .commands.ibs_test import run_ibs_test

            run_ibs_test(ds, cfg, log)
        if cfg.groupdist is not None:
            from .commands.groupdist import run_groupdist

            run_groupdist(ds, cfg, log)
        if cfg.regress_distance is not None:
            from .commands.groupdist import run_regress_distance

            run_regress_distance(ds, cfg, log)
        if cfg.qfam is not None:
            from .commands.qfam import run_qfam

            run_qfam(ds, cfg, log)
        if cfg.dfam is not None:
            from .commands.dfam import run_dfam

            run_dfam(ds, cfg, log)
        if cfg.fast_epistasis is not None:
            from .commands.epistasis import run_fast_epistasis

            run_fast_epistasis(ds, cfg, log)
        if cfg.epistasis is not None:
            from .commands.epi_reg import run_epistasis

            run_epistasis(ds, cfg, log)
        if cfg.test_missing is not None:
            from .commands.testmiss import run_test_missing

            run_test_missing(ds, cfg, log)
        if cfg.twolocus is not None:
            from .commands.twolocus import run_twolocus

            run_twolocus(ds, cfg, log)
        if cfg.flip_scan is not None:
            from .commands.flipscan import run_flipscan

            run_flipscan(ds, cfg, log)
        if cfg.show_tags is not None:
            from .commands.show_tags import run_show_tags

            run_show_tags(ds, cfg, log)
        if cfg.test_mishap:
            from .commands.mishap import run_test_mishap

            run_test_mishap(ds, cfg, log)
        if cfg.gxe is not None:
            from .commands.gxe import run_gxe

            run_gxe(ds, cfg, log)
        if cfg.lasso is not None:
            from .commands.lasso import run_lasso

            run_lasso(ds, cfg, log)
        if cfg.mh:
            from .commands.cmh import run_cmh

            run_cmh(ds, cfg, log)
        if cfg.mh2:
            from .commands.cmh import run_mh2

            if cfg.mh:
                raise FlagError("--mh2 cannot be used with --mh/--bd.")
            run_mh2(ds, cfg, log)
        if cfg.homog:
            from .commands.cmh import run_homog

            run_homog(ds, cfg, log)
        if cfg.clump:
            from .commands.clump import run_clump

            run_clump(ds, cfg, log)

        log.log(f"End of run; total wall-clock {log.elapsed():.2f}s.")
        return 0
    except Exception as e:
        log.log(f"Error: {e}")
        raise
    finally:
        log.close()
