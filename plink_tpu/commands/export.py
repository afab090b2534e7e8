"""--export: dataset exporters.

Behavior reference: Exportf (2.0/plink2_export.cc:11731).  Implemented
formats: VCF/VCF-4.3 (+bgz, +vcf-dosage=, ExportVcf :4700-area), BCF,
BGEN-1.2/1.3 (+.sample), Oxford gen/sample, ped/tped, A / AD /
A-transpose raw matrices, compound-genotypes, PHYLIP (+phased),
ind-major-bed, EIGENSOFT eig/eigt, haps/hapslegend.  Sample columns are
rendered with numpy byte-LUTs (vectorized over whole variant rows)
instead of per-genotype inner loops.

Still missing vs the reference: structure, bimbam, 23andMe, lgen,
fastphase (NotImplementedError below keeps the gap honest).
"""

from __future__ import annotations

import time

import numpy as np

from ..dataset import Dataset
from ..ops.pairwise import _unpack_np
from ..utils.logging import RunLogger
from .basic_reports import _provref_strs

_GT_LUT = np.frombuffer(b"\t0/0\t0/1\t1/1\t./.", dtype=np.uint8).reshape(4, 4)


def run_export(ds: Dataset, cfg, log: RunLogger) -> None:
    fmts = [f for f in cfg.export_fmts]
    for fmt in fmts:
        fl = fmt.lower()
        if fl in ("vcf", "vcf-4.2", "vcf-4.3"):
            ds_mode = None
            for a in fmts:
                if a.startswith("vcf-dosage="):
                    ds_mode = a.split("=", 1)[1]
            _export_vcf(ds, cfg, log, dosage_mode=ds_mode,
                        v43=fl != "vcf-4.2")
        elif fmt.startswith("vcf-dosage=") or fl == "bgz":
            continue
        elif fmt == "A":
            _export_raw(ds, cfg, log, with_het=False)
        elif fmt == "AD":
            _export_raw(ds, cfg, log, with_het=True)
        elif fl == "ped":
            _export_ped(ds, cfg, log)
        elif fl == "tped":
            _export_tped(ds, cfg, log)
        elif fl == "oxford":
            _export_oxford(ds, cfg, log, sample_v2="sample-v2" in fmts)
        elif fl == "oxford-v2":
            _export_oxford(ds, cfg, log, v2=True,
                           sample_v2="sample-v2" in fmts)
        elif fl == "sample-v2":
            continue  # modifier consumed by oxford/haps/bgen handlers
        elif fl in ("a-transpose", "av"):
            _export_traw(ds, cfg, log)
        elif fl == "bgen-1.1":
            from ..io.bgen import write_bgen11

            path = cfg.out + ".bgen"
            write_bgen11(ds, path)
            log.log(f"--export bgen-1.1: {path} written.")
            _export_oxford_sample(ds, cfg, log,
                                  v2="sample-v2" in fmts)
        elif fl in ("bgen-1.2", "bgen-1.3"):
            from ..io.bgen import write_bgen

            path = cfg.out + ".bgen"
            write_bgen(ds, path, fl[-3:])
            log.log(f"--export {fl}: {path} written.")
            _export_oxford_sample(ds, cfg, log,
                                  v2="sample-v2" in fmts)
        elif fl == "bcf":
            from ..io.bcf import write_bcf

            path = cfg.out + ".bcf"
            write_bcf(ds, path)
            log.log(f"--export bcf: {path} written.")
        elif fl == "compound-genotypes":
            _export_compound(ds, cfg, log)
        elif fl in ("phylip", "phylip-phased"):
            _export_phylip(ds, cfg, log, phased=fl == "phylip-phased")
        elif fl == "ind-major-bed":
            _export_ind_major_bed(ds, cfg, log)
        elif fl in ("eig", "eigt"):
            _export_eig(ds, cfg, log, transposed=fl == "eigt")
        elif fl in ("haps", "hapslegend"):
            _export_haps(ds, cfg, log, legend=fl == "hapslegend")
        else:
            # same surface as the reference (2.0/plink2.cc --export parse)
            raise NotImplementedError(
                "Only VCF, BCF, oxford, bgen-1.x, haps, hapslegend, A, AD, "
                "Av, ped, tped,\ncompound-genotypes, phylip, phylip-phased, "
                "eig, eigt, and ind-major-bed output\nhave been implemented "
                "so far.")


def _pheno_strs(ds: Dataset, inc_s) -> list[str]:
    """First phenotype column rendered plink1-style (cc -> 1/2, missing -9)."""
    si = ds.si
    if si.phenos:
        pc = next(iter(si.phenos.values()))
        out = []
        for i in inc_s:
            if not pc.nonmiss[i]:
                out.append("-9")
            elif pc.kind == "cc":
                out.append(str(int(pc.data[i]) + 1))
            else:
                from ..utils.fmt import g6

                out.append(g6(pc.data[i]))
        return out
    return ["-9"] * len(inc_s)


def _export_allele_flips(ds, cfg):
    """--export-allele: per-variant flip mask (count the named allele
    instead of REF in A/AD/Av exports; ref 2.0/plink2_help.cc:2429).
    Entries naming the ALT1 allele flip the count; entries matching REF
    (or not matching either) keep the REF count."""
    flips = np.zeros(ds.raw_variant_ct, bool)
    path = getattr(cfg, "export_allele", None)
    if not path:
        return flips
    amap = {}
    with open(path) as f:
        for ln in f:
            t = ln.split()
            if len(t) >= 2:
                amap[t[0]] = t[1]
    alt1 = ds.vi.alt1()
    for v in range(ds.raw_variant_ct):
        a = amap.get(str(ds.vi.vid[v]))
        if a is not None and a == str(alt1[v]):
            flips[v] = True
    return flips


def _export_raw(ds: Dataset, cfg, log: RunLogger, with_het: bool) -> None:
    """--export A / AD -> .raw: REF-allele dosage (and _HET indicator)
    per variant (ref: plink2 'A'/'AD' export; REF is the counted allele)."""
    si = ds.si
    inc_s = np.flatnonzero(ds.sample_mask)
    inc_v = np.flatnonzero(ds.variant_mask)
    phenos = _pheno_strs(ds, inc_s)
    path = cfg.out + ".raw"
    # counted-allele dosage per code (default REF: homref=2, het=1,
    # homalt=0, missing=NA; --export-allele flips listed variants)
    flips = _export_allele_flips(ds, cfg)
    alt1_all = ds.vi.alt1()
    cnt = {0: "2", 1: "1", 2: "0", 3: "NA"}
    cnt_f = {0: "0", 1: "1", 2: "2", 3: "NA"}
    het = {0: "0", 1: "1", 2: "0", 3: "NA"}
    with open(path, "w") as f:
        hdr = ["FID", "IID", "PAT", "MAT", "SEX", "PHENOTYPE"]
        for v in inc_v:
            counted = alt1_all[v] if flips[v] else ds.vi.ref[v]
            tag = f"{ds.vi.vid[v]}_{counted}"
            hdr.append(tag)
            if with_het:
                hdr.append(f"{ds.vi.vid[v]}_HET")
        f.write("\t".join(hdr) + "\n")
        from ..ops.pairwise import _unpack_np

        codes_all = []
        for v0, packed in ds.iter_packed_blocks():
            sel = [i for i in range(packed.shape[0]) if ds.variant_mask[v0 + i]]
            if sel:
                codes_all.append(
                    _unpack_np(packed[sel])[:, : ds.raw_sample_ct][:, inc_s]
                )
        codes = np.vstack(codes_all) if codes_all else np.zeros((0, len(inc_s)), np.uint8)
        for k, i in enumerate(inc_s):
            pat = si.pat[i] if si.pat is not None else "0"
            mat = si.mat[i] if si.mat is not None else "0"
            row = [str(si.fid[i]), str(si.iid[i]), str(pat), str(mat),
                   str(int(si.sex[i])), phenos[k]]
            for j, g in enumerate(codes[:, k]):
                row.append((cnt_f if flips[inc_v[j]] else cnt)[int(g)])
                if with_het:
                    row.append(het[int(g)])
            f.write("\t".join(row) + "\n")
    log.log(f"--export {'AD' if with_het else 'A'}: {path} written.")


def _ped_lut(ref: str, alt: str) -> dict[int, str]:
    # .bed allele convention: A1 = ALT, A2 = REF; het written "ALT REF"
    return {0: f"{ref}\t{ref}", 1: f"{alt}\t{ref}", 2: f"{alt}\t{alt}",
            3: "0\t0"}


def _export_ped(ds: Dataset, cfg, log: RunLogger) -> None:
    si = ds.si
    inc_s = np.flatnonzero(ds.sample_mask)
    inc_v = np.flatnonzero(ds.variant_mask)
    phenos = _pheno_strs(ds, inc_s)
    alt1 = ds.vi.alt1()
    luts = [_ped_lut(str(ds.vi.ref[v]), str(alt1[v])) for v in inc_v]
    from ..ops.pairwise import _unpack_np

    codes_all = []
    for v0, packed in ds.iter_packed_blocks():
        sel = [i for i in range(packed.shape[0]) if ds.variant_mask[v0 + i]]
        if sel:
            codes_all.append(_unpack_np(packed[sel])[:, : ds.raw_sample_ct][:, inc_s])
    codes = np.vstack(codes_all) if codes_all else np.zeros((0, len(inc_s)), np.uint8)
    with open(cfg.out + ".ped", "w") as f:
        for k, i in enumerate(inc_s):
            pat = si.pat[i] if si.pat is not None else "0"
            mat = si.mat[i] if si.mat is not None else "0"
            row = [str(si.fid[i]), str(si.iid[i]), str(pat), str(mat),
                   str(int(si.sex[i])), phenos[k]]
            for vv, g in enumerate(codes[:, k]):
                row.append(luts[vv][int(g)])
            f.write("\t".join(row) + "\n")
    ci = ds.vi.chr_info
    cm = ds.vi.cm
    with open(cfg.out + ".map", "w") as f:
        for v in inc_v:
            cmv = f"{cm[v]:g}" if cm is not None else "0"
            f.write(
                f"{ci.name(int(ds.vi.chrom[v]))}\t{ds.vi.vid[v]}\t{cmv}\t"
                f"{ds.vi.pos[v]}\n"
            )
    log.log(f"--export ped: {cfg.out}.ped + {cfg.out}.map written.")


def _export_tped(ds: Dataset, cfg, log: RunLogger) -> None:
    si = ds.si
    inc_s = np.flatnonzero(ds.sample_mask)
    inc_v = np.flatnonzero(ds.variant_mask)
    phenos = _pheno_strs(ds, inc_s)
    alt1 = ds.vi.alt1()
    ci = ds.vi.chr_info
    cm = ds.vi.cm
    from ..ops.pairwise import _unpack_np

    with open(cfg.out + ".tped", "w") as f:
        for v0, packed in ds.iter_packed_blocks():
            sel = [i for i in range(packed.shape[0]) if ds.variant_mask[v0 + i]]
            if not sel:
                continue
            codes = _unpack_np(packed[sel])[:, : ds.raw_sample_ct][:, inc_s]
            for r, i_local in enumerate(sel):
                v = v0 + i_local
                lut = _ped_lut(str(ds.vi.ref[v]), str(alt1[v]))
                cmv = f"{cm[v]:g}" if cm is not None else "0"
                row = [ci.name(int(ds.vi.chrom[v])), str(ds.vi.vid[v]), cmv,
                       str(ds.vi.pos[v])]
                row.extend(lut[int(g)] for g in codes[r])
                f.write("\t".join(row) + "\n")
    with open(cfg.out + ".tfam", "w") as f:
        for k, i in enumerate(inc_s):
            pat = si.pat[i] if si.pat is not None else "0"
            mat = si.mat[i] if si.mat is not None else "0"
            f.write(
                f"{si.fid[i]}\t{si.iid[i]}\t{pat}\t{mat}\t{int(si.sex[i])}\t"
                f"{phenos[k]}\n"
            )
    log.log(f"--export tped: {cfg.out}.tped + {cfg.out}.tfam written.")


def _dosage_decimal(rem: int) -> str:
    """Fractional-part printer for 16384ths (PrintDosageDecimal,
    2.0/plink2_common.cc:160): shortest round-tripping decimal, else
    banker's-rounded 5 digits."""
    rt = (rem * 2 + 1) * 625
    if rt % 2048 < 1250:
        return "." + f"{rt // 2048:04d}".rstrip("0")
    five = (3125 * rem + 256) // 512 - (1 if rem % 1024 == 256 else 0)
    first = five // 10000
    last4 = five - first * 10000
    s = "." + str(first)
    if last4:
        s += f"{last4:04d}".rstrip("0")
    return s


def _five_dec_32768(v: int) -> str:
    """Raw 5-decimal banker's rendering of v/32768 (the shared fallback of
    PrintDdosageDecimal / PrintHdsPair, 2.0/plink2_common.cc:265)."""
    five = (3125 * v + 512) // 1024 - (1 if (v % 2048) == 512 else 0)
    first = five // 10000
    last4 = five - first * 10000
    s = "0." + str(first)
    if last4:
        s += str(last4).zfill(4).rstrip("0")
    return s


def _print_hap_nonint(v: int) -> str:
    """Haploid dosage v/32768 in [0,1]: shortest representation that
    round-trips within ((v-0.5)/32768, (v+0.5)/32768)
    (PrintHaploidNonintDosage -> PrintDdosageDecimal,
    2.0/plink2_common.cc:234)."""
    if not (v & 32767):
        return "1" if v == 32768 else "0"
    range_top = v * 1250 + 625
    if (range_top % 4096) < 1250:
        return "0." + str(range_top // 4096).zfill(4).rstrip("0")
    return _five_dec_32768(v)


def _fmt_x10k(v: int) -> str:
    if v == 10000:
        return "1"
    if v == 0:
        return "0"
    return "0." + str(v).zfill(4).rstrip("0")


def _print_hds_pair(dosage_int: int, delta: int) -> str:
    """Left,right haplotype dosages with minimum decimal places such that
    sum and difference round-trip (PrintHdsPair,
    2.0/plink2_export.cc:3830)."""
    sum_top = (dosage_int * 2 + 1) * 625
    diffp1_top = (delta * 2 + 32769) * 625
    if (sum_top % 2048) < 1250 and (diffp1_top % 20480) < 1250 and \
            (sum_top & 2048) == (diffp1_top & 2048):
        sum_x10k = sum_top // 2048
        diff_x10k = diffp1_top // 2048 - 10000
        return (_fmt_x10k((sum_x10k + diff_x10k) // 2) + ","
                + _fmt_x10k((sum_x10k - diff_x10k) // 2))

    def _side(v):
        if not (v & 32767):
            return "1" if v == 32768 else "0"
        return _five_dec_32768(v)

    return _side(dosage_int + delta) + "," + _side(dosage_int - delta)


def _print_small_dosage(val: int) -> str:
    """DS value in 16384ths (PrintSmallDosage, 2.0/plink2_common.h:444)."""
    whole, rem = divmod(int(val), 16384)
    return str(whole) + (_dosage_decimal(rem) if rem else "")


def _export_vcf(ds: Dataset, cfg, log: RunLogger,
                dosage_mode: str | None = None, v43: bool = True) -> None:
    """dosage_mode: None / DS / DS-force / HDS / HDS-force (ExportVcf
    vcf_mode handling, 2.0/plink2_export.cc:4104-4133)."""
    with_ds = dosage_mode is not None
    write_hds = with_ds and dosage_mode.startswith("HDS")
    hds_force = dosage_mode == "HDS-force"
    ds_force = dosage_mode in ("DS-force", "HDS-force")
    if with_ds and not ds_force and not ds.has_dosage:
        log.log(
            "Warning: No dosage data present.  "
            + ("DS and HDS fields" if write_hds else "DS field")
            + " will not be exported."
        )
        with_ds = write_hds = False
        dosage_mode = None
    vi = ds.vi
    si = ds.si
    inc_s = np.flatnonzero(ds.sample_mask)
    inc_v = np.flatnonzero(ds.variant_mask)
    path = cfg.out + ".vcf"
    ci = vi.chr_info
    bgz = "bgz" in cfg.export_fmts or "vcf-4.2-bgz" in cfg.export_fmts
    chroms_present = []
    seen = set()
    for c in vi.chrom[inc_v]:
        if c not in seen:
            seen.add(c)
            chroms_present.append(c)
    use_fid = si.has_fid and any(str(si.fid[i]) != "0" for i in inc_s)
    if bgz:
        from ..io.compress import BgzfWriter

        path += ".gz"
        out_cm = BgzfWriter(path)
    else:
        out_cm = open(path, "wb")
    with out_cm as f:
        hdr = f"##fileformat=VCFv4.{3 if v43 else 2}\n"
        hdr += f"##fileDate={time.strftime('%Y%m%d')}\n"
        hdr += "##source=PLINKv2.0\n"
        # copy ##contig lines carried in the .pvar header (keyed by ID;
        # attributes like length are preserved -- ExportVcf,
        # 2.0/plink2_export.cc:4218-4279); regenerate for chromosomes
        # without one
        contig_of = {}
        for ln_ in (vi.header_lines or ()):
            if ln_.startswith("##contig=<ID="):
                idv = ln_[len("##contig=<ID="):]
                for stop_ in (",", ">"):
                    cut = idv.find(stop_)
                    if cut >= 0:
                        idv = idv[:cut]
                        break
                contig_of[idv] = ln_.rstrip("\n")
        for c in chroms_present:
            nm_ = ci.name(int(c))
            hdr += contig_of.get(nm_, f"##contig=<ID={nm_}>") + "\n"
        _, prov_fn = _provref_strs(ds)
        any_prov = any(
            prov_fn(int(v)).lstrip("\t") == "Y" for v in inc_v
        )
        if any_prov:
            hdr += ('##INFO=<ID=PR,Number=0,Type=Flag,Description='
                    '"Provisional reference allele, may not be based on '
                    'real reference genome">\n')
        hdr += '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">\n'
        if with_ds:
            hdr += ('##FORMAT=<ID=DS,Number=A,Type=Float,Description='
                    '"Estimated Alternate Allele Dosage : [P(0/1)+2*P(1/1)]">\n')
        if write_hds:
            # HDS ploidy intentionally does NOT match GT ploidy in the
            # haploid case (ExportVcf, 2.0/plink2_export.cc:4366-4368)
            hdr += ('##FORMAT=<ID=HDS,Number=.,Type=Float,Description='
                    '"Estimated Haploid Alternate Allele Dosage ">\n')
        cols = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
        ids = [
            (f"{si.fid[i]}_{si.iid[i]}" if use_fid else str(si.iid[i]))
            for i in inc_s
        ]
        hdr += cols + "".join("\t" + s for s in ids) + "\n"
        f.write(hdr.encode())
        qual = vi.qual
        filt = vi.filt
        info = vi.info
        phased_ds = ds.has_phase
        _vcf_prev_phased = np.ones(len(inc_s), bool)
        for v0, packed in ds.iter_packed_blocks():
            vct = packed.shape[0]
            sel = [i for i in range(vct) if ds.variant_mask[v0 + i]]
            if not sel:
                continue
            codes = _unpack_np(packed[sel])[:, : ds.raw_sample_ct][:, inc_s]
            if phased_ds and with_ds:
                pass  # unified GT:DS[:HDS] renderer below handles phase
            elif phased_ds:
                # per-sample running prev_phased state (initially phased):
                # hets print '|' iff phased and update the state; hom/missing
                # separators follow the current state (plink2's VCF exporter
                # prev_phased tracking)
                gt_rows = []
                ma_mask_ph = ds.multiallelic_mask()
                for r, i_local in enumerate(sel):
                    pp, pi = ds.phase_row(v0 + i_local)
                    pps, pis = pp[inc_s], pi[inc_s]
                    c = codes[r]
                    if ma_mask_ph[v0 + i_local]:
                        # multiallelic: allele pairs + phase; the het set
                        # includes aux1b patches (phase_row handles it)
                        ac = ds.allele_codes(int(v0 + i_local))[inc_s]
                        miss = ac[:, 0] < 0
                        het = (~miss) & (ac[:, 0] != ac[:, 1])
                        prev = _vcf_prev_phased
                        state = np.where(het, pps, prev)
                        cells = []
                        for col in range(len(inc_s)):
                            sep = "|" if state[col] else "/"
                            if miss[col]:
                                cells.append(f".{sep}.")
                            else:
                                a, b = int(ac[col, 0]), int(ac[col, 1])
                                if het[col] and pps[col] and pis[col]:
                                    cells.append(f"{b}|{a}")
                                else:
                                    cells.append(f"{a}{sep}{b}")
                        _vcf_prev_phased[het] = pps[het]
                        gt_rows.append("\t" + "\t".join(cells))
                        continue
                    het = c == 1
                    cells = np.empty(len(inc_s), dtype="U3")
                    prev = _vcf_prev_phased
                    state = np.where(het, pps, prev)
                    sep = np.where(state, "|", "/")
                    half = {0: ("0", "0"), 2: ("1", "1"), 3: (".", ".")}
                    for code_val, (la, ra) in half.items():
                        m = c == code_val
                        cells[m] = np.char.add(
                            np.char.add(la, sep[m]), ra
                        )
                    cells[het & pps & ~pis] = "0|1"
                    cells[het & pps & pis] = "1|0"
                    cells[het & ~pps] = "0/1"
                    _vcf_prev_phased[het] = pps[het]
                    gt_rows.append("\t" + "\t".join(cells))
            else:
                gt_bytes = _GT_LUT[codes].reshape(codes.shape[0], -1)
            ma_mask = ds.multiallelic_mask()
            ma_rows_gt = {}
            for r, i_local in enumerate(sel):
                i = v0 + i_local
                if ma_mask[i] and not phased_ds:
                    ac = ds.allele_codes(int(i))[inc_s]
                    cells = [
                        "./." if a < 0 else f"{a}/{b}" for a, b in ac
                    ]
                    ma_rows_gt[r] = "\t" + "\t".join(cells)
            for r, i_local in enumerate(sel):
                i = v0 + i_local
                q = "." if qual is None or qual[i] is None else str(qual[i])
                fl = "." if filt is None or filt[i] is None else str(filt[i])
                inf = "." if info is None or info[i] is None else str(info[i])
                if any_prov and prov_fn(int(i)).lstrip("\t") == "Y":
                    inf = "PR" if inf == "." else inf + ";PR"
                if not with_ds:
                    meta = (
                        f"{ci.name(int(vi.chrom[i]))}\t{vi.pos[i]}\t"
                        f"{vi.vid[i]}\t{vi.ref[i]}\t{vi.alt[i]}\t{q}\t{fl}\t"
                        f"{inf}\tGT"
                    )
                    f.write(meta.encode())
                    if r in ma_rows_gt:
                        f.write(ma_rows_gt[r].encode())
                    elif phased_ds:
                        f.write(gt_rows[r].encode())
                    else:
                        f.write(gt_bytes[r].tobytes())
                    f.write(b"\n")
                    continue
                aux = ds.reader.read_dosage(i)
                ds_of = {}
                if aux.dosage_ids is not None:
                    for sid, val in zip(aux.dosage_ids, aux.dosage_vals):
                        ds_of[int(sid)] = int(val)
                dp_of = {}
                if aux.dphase_ids is not None:
                    for sid, dv in zip(aux.dphase_ids, aux.dphase_delta):
                        dp_of[int(sid)] = int(dv)
                if phased_ds:
                    pp_full, pi_full = ds.phase_row(int(i))
                    pps, pis = pp_full[inc_s], pi_full[inc_s]
                else:
                    pps = pis = np.zeros(len(inc_s), bool)
                # per-variant FORMAT column (ExportVcf,
                # 2.0/plink2_export.cc:4990-4999)
                has_ds_col = bool(ds_of) or ds_force
                hds_here = False
                if write_hds and has_ds_col:
                    hds_here = hds_force or bool(dp_of) or (
                        bool(ds_of) and any(
                            pps[col] and int(s_raw) in ds_of
                            for col, s_raw in enumerate(inc_s)
                        )
                    )
                fmt_col = "GT" + (":DS" if has_ds_col else "") + (
                    ":HDS" if hds_here else "")
                meta = (
                    f"{ci.name(int(vi.chrom[i]))}\t{vi.pos[i]}\t{vi.vid[i]}\t"
                    f"{vi.ref[i]}\t{vi.alt[i]}\t{q}\t{fl}\t{inf}\t{fmt_col}"
                )
                f.write(meta.encode())
                c = codes[r]
                # variants with neither hardcall-phase nor dphase use the
                # unphased writer: '/' separators, prev_phased untouched
                # (ExportVcf some_phased branch, 2.0/plink2_export.cc:4764+)
                some_phased = bool(pps.any()) or bool(dp_of)
                row = []
                for col, s_raw in enumerate(inc_s):
                    g = int(c[col])
                    if some_phased:
                        if g == 1:
                            _vcf_prev_phased[col] = pps[col]
                        sep = "|" if _vcf_prev_phased[col] else "/"
                    else:
                        sep = "/"
                    if g == 0:
                        cell = "0" + sep + "0"
                    elif g == 2:
                        cell = "1" + sep + "1"
                    elif g == 3:
                        cell = "." + sep + "."
                    elif some_phased and pps[col]:
                        cell = "1|0" if pis[col] else "0|1"
                    else:
                        cell = "0/1"
                    dv = ds_of.get(int(s_raw))
                    if dv is not None:
                        cell += ":" + _print_small_dosage(dv)
                        if write_hds:
                            if pps[col] or int(s_raw) in dp_of:
                                delta = dp_of.get(int(s_raw))
                                if delta is None:
                                    # implicit: hardcall-phase + homdist
                                    delta = (32768 - dv if dv > 16384
                                             else dv)
                                    if not pis[col]:
                                        delta = -delta
                                cell += ":" + _print_hds_pair(dv, delta)
                            elif hds_force:
                                h = _print_hap_nonint(dv)
                                cell += ":" + h + "," + h
                    elif ds_force:
                        cell += ":" + "012."[g]
                        if hds_force:
                            if g == 1 and pps[col]:
                                cell += ":1,0" if pis[col] else ":0,1"
                            else:
                                cell += (":0,0", ":0.5,0.5", ":1,1",
                                         ":.,.")[g]
                    row.append(cell)
                f.write(("\t" + "\t".join(row) + "\n").encode())
    log.log(
        f"--export vcf: {len(inc_v)} variants, {len(inc_s)} samples written to "
        f"{path} ."
    )


def _export_oxford(ds: Dataset, cfg, log: RunLogger,
                   v2: bool = False, sample_v2: bool = False) -> None:
    """--export oxford[-v2]: .gen + .sample (ExportOxGen,
    2.0/plink2_export.cc:583; allele order ALT REF, triplets P(homALT)
    P(het) P(homREF), missing genotype = "0 0 0"; v2 writes the variant ID
    twice (SNPID + rsid columns, :658) and the single-ID .sample format).
    chrY missingness is only accumulated for non-female samples (:698),
    and the .sample missing rate divides by variant_ct for males but
    variant_ct - y_ct for everyone else (:3372-3388)."""
    from ..ops.pairwise import _unpack_np

    inc_s = np.flatnonzero(ds.sample_mask)
    inc_v = np.flatnonzero(ds.variant_mask)
    vi = ds.vi
    alt1 = vi.alt1()
    gen_path = cfg.out + ".gen"
    miss_ct = np.zeros(ds.raw_sample_ct, np.int64)
    nonfemale = ds.si.sex[inc_s] != 2
    is_y_all = ds.is_chry()
    y_ct = int(is_y_all[inc_v].sum())
    _TRIP = {0: "0 0 1", 1: "0 1 0", 2: "1 0 0", 3: "0 0 0"}
    with open(gen_path, "w") as f:
        for v in inc_v:
            codes = _unpack_np(ds.reader.read_packed(int(v), 1))[0][
                : ds.raw_sample_ct
            ][inc_s]
            m = codes == 3
            if bool(is_y_all[v]):
                m = m & nonfemale
            miss_ct[inc_s] += m
            vid2 = f"{vi.vid[v]} " if v2 else ""
            f.write(
                f"{vi.chr_info.name(vi.chrom[v])} {vi.vid[v]} {vid2}"
                f"{vi.pos[v]} "
                f"{alt1[v]} {vi.ref[v]} "
                + " ".join(_TRIP[c] for c in codes)
                + "\n"
            )
    log.log(f"--export oxford{'-v2' if v2 else ''}: {gen_path} written.")
    _export_oxford_sample(ds, cfg, log, miss_ct, len(inc_v), y_ct=y_ct,
                          v2=sample_v2)


def _export_oxford_sample(ds: Dataset, cfg, log: RunLogger,
                          miss_ct=None, vct=None, y_ct: int = 0,
                          v2: bool = False) -> None:
    from ..ops.pairwise import _unpack_np
    from ..utils.fmt import g6

    inc_s = np.flatnonzero(ds.sample_mask)
    if miss_ct is None:
        inc_v = np.flatnonzero(ds.variant_mask)
        vct = len(inc_v)
        miss_ct = np.zeros(ds.raw_sample_ct, np.int64)
        for v in inc_v:
            codes = _unpack_np(ds.reader.read_packed(int(v), 1))[0][
                : ds.raw_sample_ct
            ]
            miss_ct += codes == 3
    sample_path = cfg.out + ".sample"
    si = ds.si
    pheno_items = list(si.phenos.items())

    def _mr(i):
        if not vct:
            return "0"
        recip = (1.0 / vct) if si.sex[i] == 1 else (1.0 / (vct - y_ct))
        return g6(miss_ct[i] * recip)

    if v2:
        # ExportOxSampleV2 (2.0/plink2_export.cc:3443): single pasted ID
        # column, optional father/mother columns, D-coded sex
        use_fid = any(str(si.fid[i]) != "0" for i in inc_s)
        pat = getattr(si, "pat", None)
        mat = getattr(si, "mat", None)
        write_parents = (
            pat is not None and mat is not None
            and any(str(pat[i]) != "0" or str(mat[i]) != "0" for i in inc_s)
        )
        with open(sample_path, "w") as f:
            f.write("ID missing"
                    + (" father mother" if write_parents else "") + " sex"
                    + "".join(f" {n}" for n, _ in pheno_items) + "\n")
            f.write("0 0" + (" D D" if write_parents else "") + " D"
                    + "".join(
                        " B" if pc.kind == "cc"
                        else (" D" if pc.kind == "cat" else " P")
                        for _, pc in pheno_items) + "\n")
            for i in inc_s:
                sid = (f"{si.fid[i]}_{si.iid[i]}" if use_fid
                       else str(si.iid[i]))
                row = f"{sid} {_mr(i)}"
                if write_parents:
                    row += f" {pat[i]} {mat[i]}"
                row += f" {si.sex[i]}" if si.sex[i] else " NA"
                for _, pc in pheno_items:
                    if not pc.nonmiss[i]:
                        row += " NA"
                    elif pc.kind == "cc":
                        row += f" {int(pc.data[i])}"
                    elif pc.kind == "cat":
                        cats = getattr(pc, "categories", None)
                        row += (f" {cats[int(pc.data[i])]}" if cats
                                else f" {int(pc.data[i])}")
                    else:
                        row += f" {g6(pc.data[i])}"
                f.write(row + "\n")
        log.log(f"--export: {sample_path} written.")
        return
    with open(sample_path, "w") as f:
        f.write("ID_1 ID_2 missing sex"
                + "".join(f" {n}" for n, _ in pheno_items) + "\n")
        f.write("0 0 0 D" + "".join(
            " B" if pc.kind == "cc" else (" D" if pc.kind == "cat" else " P")
            for _, pc in pheno_items) + "\n")
        for i in inc_s:
            sex = str(si.sex[i]) if si.sex[i] else "NA"
            row = f"{si.fid[i]} {si.iid[i]} {_mr(i)} {sex}"
            for _, pc in pheno_items:
                if not pc.nonmiss[i]:
                    row += " NA"
                elif pc.kind == "cc":
                    row += f" {int(pc.data[i])}"
                elif pc.kind == "cat":
                    row += f" {int(pc.data[i])}"
                else:
                    row += f" {g6(pc.data[i])}"
            f.write(row + "\n")
    log.log(f"--export: {sample_path} written.")


def _export_traw(ds: Dataset, cfg, log: RunLogger) -> None:
    """--export A-transpose: .traw variant-major counted-allele matrix
    (DosageTransposeThread, 2.0/plink2_export.cc:9238): header CHR SNP (C)M
    POS COUNTED ALT + FID_IID sample columns; COUNTED = REF allele, values
    are per-sample REF counts with NA for missing."""
    from ..ops.pairwise import _unpack_np

    inc_s = np.flatnonzero(ds.sample_mask)
    inc_v = np.flatnonzero(ds.variant_mask)
    vi = ds.vi
    si = ds.si
    alt1 = vi.alt1()
    path = cfg.out + ".traw"
    _CNT = {0: "2", 1: "1", 2: "0", 3: "NA"}
    with open(path, "w") as f:
        f.write("CHR\tSNP\t(C)M\tPOS\tCOUNTED\tALT")
        for i in inc_s:
            f.write(f"\t{si.fid[i]}_{si.iid[i]}")
        f.write("\n")
        flips = _export_allele_flips(ds, cfg)
        _CNT_F = {0: "0", 1: "1", 2: "2", 3: "NA"}
        for v in inc_v:
            codes = _unpack_np(ds.reader.read_packed(int(v), 1))[0][
                : ds.raw_sample_ct
            ][inc_s]
            cm = vi.cm[v] if vi.cm is not None else 0
            cm_s = f"{cm:g}" if cm else "0"
            if flips[v]:
                counted, other = alt1[v], vi.ref[v]
                lut = _CNT_F
            else:
                counted, other = vi.ref[v], alt1[v]
                lut = _CNT
            f.write(
                f"{vi.chr_info.name(vi.chrom[v])}\t{vi.vid[v]}\t{cm_s}\t"
                f"{vi.pos[v]}\t{counted}\t{other}\t"
                + "\t".join(lut[c] for c in codes)
                + "\n"
            )
    log.log(f"--export A-transpose: {path} written.")


_IUPAC = {
    frozenset("AC"): "M", frozenset("AG"): "R", frozenset("AT"): "W",
    frozenset("CG"): "S", frozenset("CT"): "Y", frozenset("GT"): "K",
}


def _export_phylip(ds: Dataset, cfg, log: RunLogger, phased: bool = False) -> None:
    """--export phylip[-phased] (ExportPhylip, 2.0/plink2_export.cc:10439):
    header "N M" (2N rows with _A/_B name suffixes when phased), IDs padded
    to max-ID-length + 2*phased + 3, one base per variant (unphased het =
    IUPAC ambiguity code, missing = N); non-ACGT alleles error."""
    from ..ops.pairwise import _unpack_np

    inc_s = np.flatnonzero(ds.sample_mask)
    inc_v = np.flatnonzero(ds.variant_mask)
    vi = ds.vi
    si = ds.si
    alt1 = vi.alt1()
    base_ids = [str(si.iid[i]) for i in inc_s]
    if phased:
        ids = [x for b in base_ids for x in (b + "_A", b + "_B")]
    else:
        ids = base_ids
    width = max(len(x) for x in ids) + 3
    nrow = len(ids)
    mat = np.empty((nrow, len(inc_v)), dtype="U1")
    for col, v in enumerate(inc_v):
        ref, alt = str(vi.ref[v]), str(alt1[v])
        if ref not in "ACGT" or alt not in "ACGT" or not ref or not alt:
            raise ValueError(
                f"--export phylip: 0-based variant #{v} has allele code(s) "
                "outside {A,C,G,T,missing}. (Did you forget --snps-only?)"
            )
        codes = _unpack_np(ds.reader.read_packed(int(v), 1))[0][
            : ds.raw_sample_ct
        ][inc_s]
        if phased:
            pp, pi = ds.phase_row(int(v))
            pps, pis = pp[inc_s], pi[inc_s]
            if ((codes == 1) & ~pps).any():
                raise ValueError(
                    "--export phylip-phased: data is not fully phased."
                )
            h1 = np.where(codes == 2, alt, ref)
            h2 = h1.copy()
            het = codes == 1
            h1 = np.where(het & pis, alt, np.where(het & ~pis, ref, h1))
            h2 = np.where(het & pis, ref, np.where(het & ~pis, alt, h2))
            h1 = np.where(codes == 3, "N", h1)
            h2 = np.where(codes == 3, "N", h2)
            mat[0::2, col] = h1
            mat[1::2, col] = h2
        else:
            hetc = _IUPAC.get(frozenset((ref, alt)), "N") if ref != alt else ref
            lut = np.array([ref, hetc, alt, "N"], dtype="U1")
            mat[:, col] = lut[codes]
    path = cfg.out + ".phy"
    with open(path, "w") as f:
        f.write(f"{nrow} {len(inc_v)}\n")
        for r, name in enumerate(ids):
            f.write(name.ljust(width) + "".join(mat[r]) + "\n")
    log.log(
        f"--export phylip{'-phased' if phased else ''}: {path} written."
    )


def _export_compound(ds: Dataset, cfg, log: RunLogger) -> None:
    """--export compound-genotypes: .ped with two-character genotype columns
    ("ALT-first" pair order like the ped exporter, missing = 00) + .map."""
    from ..ops.pairwise import _unpack_np

    inc_s = np.flatnonzero(ds.sample_mask)
    inc_v = np.flatnonzero(ds.variant_mask)
    vi = ds.vi
    si = ds.si
    alt1 = vi.alt1()
    map_path = cfg.out + ".map"
    with open(map_path, "w") as f:
        for v in inc_v:
            cm = vi.cm[v] if vi.cm is not None else 0
            f.write(
                f"{vi.chr_info.name(vi.chrom[v])}\t{vi.vid[v]}\t{cm:g}\t"
                f"{vi.pos[v]}\n"
            )
    log.log(f"Writing {map_path} ... done.")
    codes_all = np.stack([
        _unpack_np(ds.reader.read_packed(int(v), 1))[0][: ds.raw_sample_ct][inc_s]
        for v in inc_v
    ])
    pheno = _pheno_strs(ds, inc_s)
    path = cfg.out + ".ped"
    with open(path, "w") as f:
        for r, i in enumerate(inc_s):
            pat = str(si.pat[i]) if si.pat is not None else "0"
            mat = str(si.mat[i]) if si.mat is not None else "0"
            row = [str(si.fid[i]), str(si.iid[i]), pat, mat,
                   str(si.sex[i]), pheno[r]]
            for col, v in enumerate(inc_v):
                ref, alt = str(vi.ref[v]), str(alt1[v])
                pair = {0: ref + ref, 1: alt + ref, 2: alt + alt, 3: "00"}[
                    int(codes_all[col, r])
                ]
                row.append(pair)
            f.write("\t".join(row) + "\n")
    log.log(f"--export compound-genotypes: {path} written.")


def _export_ind_major_bed(ds: Dataset, cfg, log: RunLogger) -> None:
    """--export ind-major-bed: sample-major plink1 .bed (magic 6c 1b 00)
    with companion .bim/.fam (TransposeToPlink1SmajWriteThread,
    2.0/plink2_export_legacy.cc:104)."""
    from ..io import write_bim
    from ..ops.pairwise import _unpack_np
    from .make_pgen import _write_fam

    inc_s = np.flatnonzero(ds.sample_mask)
    inc_v = np.flatnonzero(ds.variant_mask)
    codes_all = np.stack([
        _unpack_np(ds.reader.read_packed(int(v), 1))[0][: ds.raw_sample_ct][inc_s]
        for v in inc_v
    ])  # [V, N]
    # plink1 2-bit coding: 00 hom-alt(A1), 10 het, 11 hom-ref, 01 missing
    plink1 = np.array([3, 2, 0, 1], np.uint8)[codes_all].T  # [N, V]
    N, V = plink1.shape
    vpad = -(-V // 4) * 4
    padded = np.full((N, vpad), 3, np.uint8)  # pad hom-ref? plink zero-pads
    padded[:, :V] = plink1
    padded[:, V:] = 0
    b = (padded[:, 0::4] | (padded[:, 1::4] << 2) | (padded[:, 2::4] << 4)
         | (padded[:, 3::4] << 6)).astype(np.uint8)
    path = cfg.out + ".bed"
    with open(path, "wb") as f:
        f.write(bytes([0x6C, 0x1B, 0x00]))
        f.write(b.tobytes())
    write_bim(cfg.out + ".bim", ds.vi, ds.variant_mask)
    _write_fam(cfg.out + ".fam", ds)
    log.log(f"--export ind-major-bed: {path} written.")


def _eighash(names) -> int:
    h = 0
    for nm in names:
        sh = 0
        for ch in str(nm):
            sh = (sh * 23 + ord(ch)) & 0xFFFFFFFF
        h = ((h * 17) ^ sh) & 0xFFFFFFFF
    return h


def _export_eig(ds: Dataset, cfg, log: RunLogger, transposed: bool) -> None:
    """--export eig/eigt: Eigensoft packedancestrymap trio (ExportEigSnp/
    Ind/Geno, 2.0/plink2_export.cc:10797-11475): .snp (ID CHR CM POS REF
    ALT), .ind (ID sex-char pheno), binary .geno with "GENO"/"TGENO" header
    record carrying sample/variant counts and the 23/17 rolling name hashes,
    then 2-bit REF-allele counts (missing=3) packed sample0-in-top-bits."""
    from ..ops.pairwise import _unpack_np

    inc_s = np.flatnonzero(ds.sample_mask)
    inc_v = np.flatnonzero(ds.variant_mask)
    vi = ds.vi
    si = ds.si
    alt1 = vi.alt1()
    snp_path = cfg.out + ".snp"
    with open(snp_path, "w") as f:
        for v in inc_v:
            cm = vi.cm[v] if vi.cm is not None else 0
            f.write(
                f"{vi.vid[v]}\t{vi.chr_info.name(vi.chrom[v])}\t{cm:g}\t"
                f"{vi.pos[v]}\t{vi.ref[v]}\t{alt1[v]}\n"
            )
    v_hash = _eighash(vi.vid[inc_v])
    ind_path = cfg.out + ".ind"
    pheno_items = list(si.phenos.items())
    with open(ind_path, "w") as f:
        for i in inc_s:
            sx = {1: "M", 2: "F"}.get(int(si.sex[i]), "U")
            if pheno_items:
                _, pc = pheno_items[0]
                if not pc.nonmiss[i]:
                    ph = "???"
                elif pc.kind == "cc":
                    ph = "Case" if pc.data[i] else "Control"
                elif pc.kind == "cat":
                    ph = str(pc.categories[int(pc.data[i])])
                else:
                    from ..utils.fmt import g6

                    ph = g6(pc.data[i])
            else:
                ph = "???"
            f.write(f"{si.iid[i]}\t{sx}\t{ph}\n")
    s_hash = _eighash([str(si.iid[i]) for i in inc_s])
    codes_all = np.stack([
        _unpack_np(ds.reader.read_packed(int(v), 1))[0][: ds.raw_sample_ct][inc_s]
        for v in inc_v
    ])  # [V, N] alt counts
    refcount = np.array([2, 1, 0, 3], np.uint8)[codes_all]
    if transposed:
        mat = refcount.T  # [N, V] per-sample records
        rec = max(48, -(-len(inc_v) // 4))
        hdr_tag = "TGENO"
    else:
        mat = refcount  # [V, N]
        rec = max(48, -(-len(inc_s) // 4))
        hdr_tag = "GENO"
    path = cfg.out + ".geno"
    with open(path, "wb") as f:
        hdr = (f"{hdr_tag} {len(inc_s):7d} {len(inc_v):7d} "
               f"{s_hash:x} {v_hash:x}").encode()
        f.write(hdr + b"\0" * (rec - len(hdr)))
        R, C = mat.shape
        cpad = -(-C // 4) * 4
        pm = np.zeros((R, cpad), np.uint8)
        pm[:, :C] = mat
        packed = ((pm[:, 0::4] << 6) | (pm[:, 1::4] << 4)
                  | (pm[:, 2::4] << 2) | pm[:, 3::4]).astype(np.uint8)
        for r in range(R):
            row = packed[r].tobytes()
            f.write(row + b"\0" * (rec - len(row)))
    log.log(f"--export {'eigt' if transposed else 'eig'}: {path} written.")


def _export_haps(ds: Dataset, cfg, log: RunLogger, legend: bool) -> None:
    """--export haps / hapslegend (ExportOxHaps, 2.0/plink2_export.cc):
    requires a fully phased dataset; .haps rows are
    "CHR ID POS ALT REF h1 h2 ..." with 0 = first listed allele (ALT, like
    the .gen exporter); hapslegend moves the variant columns into
    .legend ("id position a0 a1") with a chromosome-uniform .haps."""
    from ..ops.pairwise import _unpack_np

    inc_s = np.flatnonzero(ds.sample_mask)
    inc_v = np.flatnonzero(ds.variant_mask)
    vi = ds.vi
    alt1 = vi.alt1()
    hap_rows = []
    for v in inc_v:
        codes = _unpack_np(ds.reader.read_packed(int(v), 1))[0][
            : ds.raw_sample_ct
        ][inc_s]
        pp, pi = ds.phase_row(int(v))
        pps, pis = pp[inc_s], pi[inc_s]
        if ((codes == 1) & ~pps).any() or (codes == 3).any():
            raise ValueError(
                f"'--export haps{'legend' if legend else ''}' must be used "
                "with a fully phased dataset."
            )
        # hap code 0 = FIRST listed allele (ALT), 1 = REF: hom-alt = "0 0",
        # hom-ref = "1 1"; unswapped het "0|1" (REF|ALT) = "1 0"
        h1 = np.where(codes == 2, 0, 1)
        h2 = h1.copy()
        het = codes == 1
        h1 = np.where(het & ~pis, 1, h1)
        h2 = np.where(het & ~pis, 0, h2)
        h1 = np.where(het & pis, 0, h1)
        h2 = np.where(het & pis, 1, h2)
        hap_rows.append((v, h1, h2))
    if legend:
        lg_path = cfg.out + ".legend"
        with open(lg_path, "w") as f:
            f.write("id position a0 a1\n")
            for v, _, _ in hap_rows:
                f.write(f"{vi.vid[v]} {vi.pos[v]} {alt1[v]} {vi.ref[v]}\n")
        path = cfg.out + ".haps"
        with open(path, "w") as f:
            for _, h1, h2 in hap_rows:
                f.write(" ".join(
                    f"{a} {b}" for a, b in zip(h1, h2)) + "\n")
        log.log(f"--export hapslegend: {path} + {lg_path} written.")
    else:
        path = cfg.out + ".haps"
        with open(path, "w") as f:
            for v, h1, h2 in hap_rows:
                f.write(
                    f"{vi.chr_info.name(vi.chrom[v])} {vi.vid[v]} {vi.pos[v]} "
                    f"{alt1[v]} {vi.ref[v]} "
                    + " ".join(f"{a} {b}" for a, b in zip(h1, h2))
                    + "\n"
                )
        log.log(f"--export haps: {path} written.")
    _export_oxford_sample(ds, cfg, log)
