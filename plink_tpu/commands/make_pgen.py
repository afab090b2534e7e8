"""--make-pgen / --make-bed / --make-bpgen (ref: MakePlink2NoVsort,
2.0/plink2_data.cc:8287): write the current filtered dataset to a new
fileset, applying sample/variant masks."""

from __future__ import annotations

import numpy as np

from ..dataset import Dataset
from ..io import PgenWriter, write_bed, write_bim, write_psam, write_pvar
from ..io.pack import pack2
from ..utils.logging import RunLogger


def _subset_codes(packed_block: np.ndarray, sample_idx: np.ndarray, sample_ct_raw: int) -> np.ndarray:
    from ..io.pack import unpack2

    codes = unpack2(packed_block, sample_ct_raw)
    return codes[:, sample_idx]


def make_pgen(ds: Dataset, out_prefix: str, log: RunLogger, fmt: str = "pgen") -> None:
    """fmt: 'pgen' (pgen+pvar+psam) or 'bed' (bed+bim+fam)."""
    sample_idx = getattr(ds, "sample_order", None)
    if sample_idx is None:
        sample_idx = np.flatnonzero(ds.sample_mask)
    variant_idx = np.flatnonzero(ds.variant_mask)
    N, V = sample_idx.size, variant_idx.size
    all_samples = N == ds.raw_sample_ct and bool(
        np.all(sample_idx == np.arange(ds.raw_sample_ct))
    )

    if fmt == "bed":
        rows = []
        for vstart, packed in ds.iter_packed_blocks():
            vsel = variant_idx[(variant_idx >= vstart) & (variant_idx < vstart + packed.shape[0])]
            if vsel.size == 0:
                continue
            block = packed[vsel - vstart]
            if not all_samples:
                block = pack2(_subset_codes(block, sample_idx, ds.raw_sample_ct))
            rows.append(block)
        write_bed(
            out_prefix + ".bed",
            np.concatenate(rows) if rows else np.zeros((0, (N + 3) // 4), np.uint8),
            sample_ct=N,
        )
        write_bim(out_prefix + ".bim", ds.vi, ds.variant_mask)
        _write_fam(out_prefix + ".fam", ds)
        log.log(f"--make-bed: {out_prefix}.bed + .bim + .fam written ({V} variants, {N} samples).")
        return

    hdr = ds.reader.header
    trusted = (not hdr.all_provisional) and hdr.provisional_ref is None and hdr.mode != 0x01
    # per-variant provisional-REF flags carry through (explicit nonref
    # track, fmt provref code 3), subsetted to the surviving variants
    nonref = (hdr.provisional_ref[variant_idx]
              if hdr.provisional_ref is not None else None)
    ma_any = bool(
        hdr.mode not in (0x01,)
        and (hdr.vrtypes[variant_idx] & 0x08).any()
    )
    if ma_any:
        # multiallelic variants present: rewrite dense rows + aux track 1
        # (+ hardcall phase when present) with sample-index remapping
        with_ph = ds.has_phase
        with PgenWriter(out_prefix + ".pgen", N, V, trusted_ref=trusted,
                    nonref_flags=nonref,
                        with_multiallelic=True, with_phase=with_ph) as w:
            from ..ops.pairwise import _unpack_np

            old_to_new = np.full(ds.raw_sample_ct, -1, np.int64)
            old_to_new[sample_idx] = np.arange(N)
            acs = ds.allele_cts()
            z = np.zeros(0, np.int64)
            for v in variant_idx:
                row = _unpack_np(ds.reader.read_packed(int(v), 1))[0][
                    : ds.raw_sample_ct
                ][sample_idx]
                ids01, a01, ids10, lo10, hi10 = ds.ma_patch(int(v))
                if ids01.size:
                    k = old_to_new[ids01] >= 0
                    a01 = a01[k]
                    ids01 = old_to_new[ids01[k]]
                if ids10.size:
                    k = old_to_new[ids10] >= 0
                    lo10, hi10 = lo10[k], hi10[k]
                    ids10 = old_to_new[ids10[k]]
                pp_ = pi_ = None
                if with_ph:
                    pp, pi = ds.phase_row(int(v))
                    pp_, pi_ = pp[sample_idx], pi[sample_idx]
                w.append_codes_multiallelic(
                    row, ids01, a01, ids10, lo10, hi10, int(acs[v]),
                    phasepresent=pp_, phaseinfo=pi_,
                )
        write_pvar(out_prefix + ".pvar", ds.vi, ds.variant_mask)
        write_psam(out_prefix + ".psam", ds.si, ds.sample_mask,
                   order=getattr(ds, "sample_order", None))
        log.log(f"--make-pgen: {out_prefix}.pgen + .pvar + .psam written ({V} variants, {N} samples).")
        return
    if ds.has_phase and not ds.has_dosage:
        with PgenWriter(out_prefix + ".pgen", N, V, trusted_ref=trusted,
                    nonref_flags=nonref,
                        with_phase=True) as w:
            from ..ops.pairwise import _unpack_np

            for v in variant_idx:
                row = _unpack_np(ds.reader.read_packed(int(v), 1))[0][
                    : ds.raw_sample_ct
                ][sample_idx]
                pp, pi = ds.phase_row(int(v))
                w.append_codes_with_phase(
                    row, pp[sample_idx], pi[sample_idx]
                )
        write_pvar(out_prefix + ".pvar", ds.vi, ds.variant_mask)
        write_psam(out_prefix + ".psam", ds.si, ds.sample_mask)
        log.log(f"--make-pgen: {out_prefix}.pgen + .pvar + .psam written ({V} variants, {N} samples).")
        return
    if ds.has_dosage:
        # preserve dosage tracks (bitarray representation per variant),
        # plus hardcall-phase and explicit-dphase tracks when present
        with_ph = ds.has_phase
        with PgenWriter(out_prefix + ".pgen", N, V, trusted_ref=trusted,
                    nonref_flags=nonref,
                        with_dosage=True, with_phase=with_ph) as w:
            from ..ops.pairwise import _unpack_np

            old_to_new = np.full(ds.raw_sample_ct, -1, np.int64)
            old_to_new[sample_idx] = np.arange(N)
            z16 = np.zeros(0, "<u2")
            zid = np.zeros(0, np.uint32)
            for v in variant_idx:
                row = _unpack_np(ds.reader.read_packed(int(v), 1))[0][
                    : ds.raw_sample_ct
                ][sample_idx]
                aux = ds.reader.read_dosage(int(v))
                if aux.dosage_ids is None or aux.dosage_ids.size == 0:
                    dids, dvals = zid, z16
                else:
                    keep = old_to_new[aux.dosage_ids] >= 0
                    dids = old_to_new[aux.dosage_ids[keep]].astype(np.uint32)
                    dvals = aux.dosage_vals[keep]
                if not with_ph:
                    w.append_codes_with_dosage(row, dids, dvals)
                    continue
                pp, pi = ds.phase_row(int(v))
                if aux.dphase_ids is not None and aux.dphase_ids.size:
                    keep = old_to_new[aux.dphase_ids] >= 0
                    dpids = old_to_new[
                        aux.dphase_ids[keep]].astype(np.uint32)
                    dpdeltas = aux.dphase_delta[keep]
                else:
                    dpids, dpdeltas = None, None
                w.append_codes_with_phase(
                    row, pp[sample_idx], pi[sample_idx],
                    dids, dvals, dpids, dpdeltas,
                )
        write_pvar(out_prefix + ".pvar", ds.vi, ds.variant_mask)
        write_psam(out_prefix + ".psam", ds.si, ds.sample_mask)
        log.log(f"--make-pgen: {out_prefix}.pgen + .pvar + .psam written ({V} variants, {N} samples).")
        return
    with PgenWriter(out_prefix + ".pgen", N, V, trusted_ref=trusted,
                    nonref_flags=nonref) as w:
        for vstart, packed in ds.iter_packed_blocks():
            vsel = variant_idx[(variant_idx >= vstart) & (variant_idx < vstart + packed.shape[0])]
            if vsel.size == 0:
                continue
            block = packed[vsel - vstart]
            if all_samples:
                w.append_packed(block)
            else:
                w.append_codes(_subset_codes(block, sample_idx, ds.raw_sample_ct))
    write_pvar(out_prefix + ".pvar", ds.vi, ds.variant_mask)
    write_psam(out_prefix + ".psam", ds.si, ds.sample_mask,
               order=getattr(ds, "sample_order", None))
    log.log(f"--make-pgen: {out_prefix}.pgen + .pvar + .psam written ({V} variants, {N} samples).")


def _write_fam(path: str, ds: Dataset) -> None:
    si = ds.si
    pheno = next(iter(si.phenos.values())) if si.phenos else None
    with open(path, "w") as f:
        for i in np.flatnonzero(ds.sample_mask):
            pat = si.pat[i] if si.pat is not None else "0"
            mat = si.mat[i] if si.mat is not None else "0"
            sex = int(si.sex[i])
            if pheno is None or not pheno.nonmiss[i]:
                ph = "-9"
            elif pheno.kind == "cc":
                ph = str(int(pheno.data[i]) + 1)
            else:
                ph = f"{pheno.data[i]:g}"
            f.write(f"{si.fid[i]}\t{si.iid[i]}\t{pat}\t{mat}\t{sex}\t{ph}\n")
