"""Public pgenlib-style Python API.

Implements the reference's Pgenlib Python API v0.94
(2.0/Python/python_api.txt, pgenlib.pyx) on top of plink_tpu's pure-Python
codecs (io/pgen_read.py, io/pgen_write.py): PvarReader, PgenReader,
PgenWriter with the same constructor/method signatures and value
conventions ({0,1,2,-9} genotypes, ALT-allele counting by default,
variant-major 2D reads, 2^-14-scale dosages).

Usage:
    from plink_tpu import pgenlib
    with pgenlib.PgenReader(b"data.pgen") as r:
        buf = np.empty(r.get_raw_sample_ct(), np.int8)
        r.read(0, buf)
"""

from __future__ import annotations

import numpy as np

__all__ = ["PvarReader", "PgenReader", "PgenWriter"]


def _fname(filename) -> str:
    if isinstance(filename, bytes):
        return filename.decode()
    return str(filename)


class PvarReader:
    """Loads .pvar/.bim variant metadata (python_api.txt:4-40).

    For .bim files the last column is REF and the second-to-last ALT,
    matching the reference's convention.
    """

    def __init__(self, filename, omit_chrom: bool = False,
                 omit_pos: bool = False):
        from .io.pvar import read_bim, read_pvar

        path = _fname(filename)
        if path.endswith(".bim") or path.endswith(".bim.zst"):
            vi = read_bim(path)
        else:
            vi = read_pvar(path)
        self._omit_chrom = omit_chrom
        self._omit_pos = omit_pos
        self._ct = vi.variant_ct
        self._chrom = None if omit_chrom else np.array(
            [vi.chr_info.name(int(c)) for c in vi.chrom], object
        )
        self._pos = None if omit_pos else vi.pos.copy()
        self._vid = vi.vid
        # allele code table: [ref, alt1, alt2, ...] per variant
        self._alleles = [
            [r] + (a.split(",") if a != "." else ["."])
            for r, a in zip(vi.ref, vi.alt)
        ]
        cts = np.array([max(2, len(al)) for al in self._alleles], np.uintp)
        self._offsets = np.zeros(self._ct + 1, np.uintp)
        np.cumsum(cts, out=self._offsets[1:])
        self._closed = False

    def get_variant_ct(self) -> int:
        return self._ct

    def get_variant_chrom(self, variant_idx: int):
        if self._chrom is None:
            raise RuntimeError("chromosome column was omitted")
        return self._chrom[variant_idx]

    def get_variant_pos(self, variant_idx: int) -> int:
        if self._pos is None:
            raise RuntimeError("position column was omitted")
        return int(self._pos[variant_idx])

    def get_variant_id(self, variant_idx: int) -> str:
        return str(self._vid[variant_idx])

    def get_allele_ct(self, variant_idx: int) -> int:
        return max(2, len(self._alleles[variant_idx]))

    def get_allele_code(self, variant_idx: int, allele_idx: int) -> str:
        return self._alleles[variant_idx][allele_idx]

    def get_allele_idx_offsets(self) -> np.ndarray:
        return self._offsets

    def get_max_allele_ct(self) -> int:
        if self._ct == 0:
            return 2
        return int(
            (self._offsets[1:] - self._offsets[:-1]).max()
        )

    def close(self) -> None:
        self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class PgenReader:
    """Random-access .pgen/.bed genotype reader (python_api.txt:44-230)."""

    def __init__(self, filename, raw_sample_ct=None, variant_ct=None,
                 sample_subset=None, allele_idx_offsets=None, pvar=None):
        from .io.pgen_read import PgenReader as _Core

        path = _fname(filename)
        if pvar is not None:
            if variant_ct is not None or allele_idx_offsets is not None:
                raise ValueError(
                    "provide either pvar or "
                    "variant_ct/allele_idx_offsets, not both"
                )
            variant_ct = pvar.get_variant_ct()
            allele_idx_offsets = pvar.get_allele_idx_offsets()
        self._core = _Core(path, sample_ct=raw_sample_ct)
        self._raw_n = self._core.sample_ct
        if raw_sample_ct is not None and raw_sample_ct != self._raw_n:
            self._core.close()
            raise ValueError(
                f"raw_sample_ct {raw_sample_ct} does not match file "
                f"({self._raw_n})"
            )
        if variant_ct is not None and variant_ct != self._core.variant_ct:
            self._core.close()
            raise ValueError(
                f"variant_ct {variant_ct} does not match file "
                f"({self._core.variant_ct})"
            )
        self._offsets = (
            np.asarray(allele_idx_offsets, np.uintp)
            if allele_idx_offsets is not None else None
        )
        self._subset = None
        self.change_sample_subset(sample_subset)

    # -- metadata ----------------------------------------------------------
    def get_raw_sample_ct(self) -> int:
        return self._raw_n

    def get_variant_ct(self) -> int:
        return self._core.variant_ct

    def hardcall_phase_present(self) -> bool:
        hdr = self._core.header
        if hdr.mode == 0x01:
            return False
        return bool((np.asarray(hdr.vrtypes) & 0x10).any())

    def change_sample_subset(self, sample_subset=None) -> None:
        if sample_subset is None:
            self._subset = None
            self._n = self._raw_n
            return
        ss = np.asarray(sample_subset, np.int64)
        if ss.size == 0:
            raise ValueError("empty sample subset")
        if (np.diff(ss) <= 0).any() or ss[0] < 0 or ss[-1] >= self._raw_n:
            raise ValueError(
                "sample_subset must be strictly increasing indexes in "
                f"[0, {self._raw_n})"
            )
        self._subset = ss
        self._n = int(ss.size)

    # -- helpers -----------------------------------------------------------
    def _allele_ct(self, variant_idx: int) -> int:
        if self._offsets is None:
            return 2
        return int(self._offsets[variant_idx + 1] - self._offsets[variant_idx])

    def _codes(self, variant_idx: int) -> np.ndarray:
        """uint8 {0,1,2,3} ALT1 counts, full-cohort order."""
        return self._core.read_codes(variant_idx, 1)[0]

    def _alt_counts(self, variant_idx: int, allele_idx: int) -> np.ndarray:
        """int8 {0,1,2,-9} counts of `allele_idx` per sample (full cohort)."""
        ac = self._allele_ct(variant_idx)
        if ac <= 2:
            codes = self._codes(variant_idx).astype(np.int8)
            if allele_idx == 1:
                out = codes
                out[codes == 3] = -9
            elif allele_idx == 0:
                out = np.where(codes == 3, np.int8(-9), 2 - codes)
            else:
                raise ValueError(
                    f"allele_idx {allele_idx} out of range for biallelic "
                    "variant"
                )
            return out.astype(np.int8)
        if allele_idx >= ac:
            raise ValueError("allele_idx out of range")
        pair = self._core.read_allele_codes(variant_idx, ac)
        out = (pair == allele_idx).sum(axis=1).astype(np.int8)
        out[pair[:, 0] < 0] = -9
        return out

    def _sub(self, arr: np.ndarray) -> np.ndarray:
        return arr if self._subset is None else arr[self._subset]

    # -- reads -------------------------------------------------------------
    def read(self, variant_idx: int, geno_int_out: np.ndarray,
             allele_idx: int = 1) -> None:
        vals = self._sub(self._alt_counts(variant_idx, allele_idx))
        geno_int_out[: self._n] = vals

    def read_dosages(self, variant_idx: int, floatarr_out: np.ndarray,
                     allele_idx: int = 1) -> None:
        codes = self._alt_counts(variant_idx, allele_idx).astype(np.float64)
        dos = np.where(codes < 0, -9.0, codes)
        aux = self._core.read_dosage(variant_idx)
        if aux.dosage_ids is not None:
            vals = aux.dosage_vals.astype(np.float64) / 16384.0
            vals[aux.dosage_vals == 65535] = -9.0
            if allele_idx == 0:
                ok = vals >= 0
                vals[ok] = 2.0 - vals[ok]
            dos[aux.dosage_ids] = vals
        floatarr_out[: self._n] = self._sub(dos)

    def read_alleles(self, variant_idx: int,
                     allele_int32_out: np.ndarray) -> None:
        pair, _pp = self._alleles_and_phase(variant_idx)
        allele_int32_out[: 2 * self._n] = self._sub(pair).reshape(-1)

    def read_alleles_and_phasepresent(
        self, variant_idx: int, allele_int32_out: np.ndarray,
        phasepresent_out: np.ndarray,
    ) -> None:
        pair, pp = self._alleles_and_phase(variant_idx)
        allele_int32_out[: 2 * self._n] = self._sub(pair).reshape(-1)
        phasepresent_out[: self._n] = self._sub(pp)

    def _alleles_and_phase(self, variant_idx: int):
        """([raw_n, 2] int32 allele pair, [raw_n] bool phasepresent)."""
        ac = self._allele_ct(variant_idx)
        codes = self._codes(variant_idx)
        if ac <= 2:
            pair = np.zeros((self._raw_n, 2), np.int32)
            pair[codes == 1] = (0, 1)
            pair[codes == 2] = (1, 1)
            pair[codes == 3] = (-9, -9)
        else:
            pair = self._core.read_allele_codes(variant_idx, ac).astype(
                np.int32
            )
            pair[pair < 0] = -9
        # homozygous (and only known-phased het) calls have known phase
        pp = (codes == 0) | (codes == 2)
        aux = self._core.read_dosage(variant_idx)
        if aux.phasepresent is not None:
            het_idx = np.flatnonzero(codes == 1)
            phased_het = het_idx[aux.phasepresent]
            pp[phased_het] = True
            swapped = phased_het[aux.phaseinfo]
            pair[swapped] = pair[swapped, ::-1]
        return pair, pp

    # -- multi-variant reads ----------------------------------------------
    def read_range(self, variant_idx_start: int, variant_idx_end: int,
                   geno_int_out: np.ndarray, allele_idx: int = 1,
                   sample_maj: bool = False) -> None:
        idxs = np.arange(variant_idx_start, variant_idx_end, dtype=np.uint32)
        self.read_list(idxs, geno_int_out, allele_idx, sample_maj)

    def read_list(self, variant_idxs: np.ndarray, geno_int_out: np.ndarray,
                  allele_idx: int = 1, sample_maj: bool = False) -> None:
        for k, v in enumerate(np.asarray(variant_idxs, np.int64)):
            row = self._sub(self._alt_counts(int(v), allele_idx))
            if sample_maj:
                geno_int_out[: self._n, k] = row
            else:
                geno_int_out[k, : self._n] = row

    def read_alleles_range(self, variant_idx_start: int,
                           variant_idx_end: int,
                           allele_int32_out: np.ndarray,
                           hap_maj: bool = False) -> None:
        idxs = np.arange(variant_idx_start, variant_idx_end, dtype=np.uint32)
        self.read_alleles_list(idxs, allele_int32_out, hap_maj)

    def read_alleles_list(self, variant_idxs: np.ndarray,
                          allele_int32_out: np.ndarray,
                          hap_maj: bool = False) -> None:
        for k, v in enumerate(np.asarray(variant_idxs, np.int64)):
            pair = self._sub(self._alleles_and_phase(int(v))[0]).reshape(-1)
            if hap_maj:
                allele_int32_out[: 2 * self._n, k] = pair
            else:
                allele_int32_out[k, : 2 * self._n] = pair

    def read_dosages_range(self, variant_idx_start: int,
                           variant_idx_end: int, floatarr_out: np.ndarray,
                           allele_idx: int = 1,
                           sample_maj: bool = False) -> None:
        for k, v in enumerate(range(variant_idx_start, variant_idx_end)):
            if sample_maj:
                # sample-major layout: out[sample, variant] (upstream
                # pgenlib read_dosages_range sample_maj semantics)
                tmp = np.empty(self._n, floatarr_out.dtype)
                self.read_dosages(v, tmp, allele_idx)
                floatarr_out[: self._n, k] = tmp
            else:
                self.read_dosages(v, floatarr_out[k], allele_idx)

    def read_dosages_list(self, variant_idxs: np.ndarray,
                          floatarr_out: np.ndarray, allele_idx: int = 1,
                          sample_maj: bool = False) -> None:
        for k, v in enumerate(np.asarray(variant_idxs, np.int64)):
            if sample_maj:
                tmp = np.empty(self._n, floatarr_out.dtype)
                self.read_dosages(int(v), tmp, allele_idx)
                floatarr_out[: self._n, k] = tmp
            else:
                self.read_dosages(int(v), floatarr_out[k], allele_idx)

    # -- counts ------------------------------------------------------------
    def count(self, variant_idx: int, genocount_uint32_out: np.ndarray,
              allele_idx=1) -> None:
        ac = self._allele_ct(variant_idx)
        if allele_idx is None and ac > 2:
            pair = self._sub(self._core.read_allele_codes(variant_idx, ac))
            n_ent = 1 + (ac * (ac + 1)) // 2
            out = np.zeros(n_ent, np.uint32)
            miss = pair[:, 0] < 0
            out[n_ent - 1 if False else 0] = 0  # placeholder, filled below
            lo = np.minimum(pair[:, 0], pair[:, 1])
            hi = np.maximum(pair[:, 0], pair[:, 1])
            # VCF GL order: cell(lo, hi) = hi*(hi+1)/2 + lo
            cells = (hi * (hi + 1)) // 2 + lo
            cnt = np.bincount(cells[~miss].astype(np.int64),
                              minlength=n_ent - 1)
            out[: n_ent - 1] = cnt
            out[n_ent - 1] = int(miss.sum())
            genocount_uint32_out[:n_ent] = out
            return
        vals = self._sub(
            self._alt_counts(variant_idx, 1 if allele_idx is None
                             else allele_idx)
        )
        genocount_uint32_out[0] = int((vals == 0).sum())
        genocount_uint32_out[1] = int((vals == 1).sum())
        genocount_uint32_out[2] = int((vals == 2).sum())
        genocount_uint32_out[3] = int((vals == -9).sum())

    # -- sparse ------------------------------------------------------------
    def has_sparse(self, variant_idx: int, allele_idx: int = 1) -> bool:
        if self._subset is not None or self._allele_ct(variant_idx) > 2:
            return False
        if allele_idx != 1:
            return False
        hdr = self._core.header
        if hdr.mode == 0x01:
            return False
        return (int(hdr.vrtypes[variant_idx]) & 0x07) == 1

    def has_sparse_dosages(self, variant_idx: int,
                           allele_idx: int = 1) -> bool:
        return False

    def _read_sparse(self, variant_idx: int, allele_idx: int, dtype):
        if not self.has_sparse(variant_idx, allele_idx):
            raise ValueError("record is not sparsely encoded")
        codes = self._codes(variant_idx)
        hdr = self._core.header
        # 1-bit representation: the common value is the majority code
        common = np.bincount(codes, minlength=4).argmax()
        ids = np.flatnonzero(codes != common).astype(np.uint32)
        vals = codes[ids].astype(dtype)
        vals[codes[ids] == 3] = -9
        return ids, vals

    def read_sparse8(self, variant_idx: int, allele_idx: int = 1):
        return self._read_sparse(variant_idx, allele_idx, np.int8)

    def read_sparse32(self, variant_idx: int, allele_idx: int = 1):
        return self._read_sparse(variant_idx, allele_idx, np.int32)

    def read_sparse64(self, variant_idx: int, allele_idx: int = 1):
        return self._read_sparse(variant_idx, allele_idx, np.int64)

    def close(self) -> None:
        self._core.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class PgenWriter:
    """Streaming .pgen writer (python_api.txt:244-303)."""

    def __init__(self, filename, sample_ct: int, variant_ct=None,
                 nonref_flags=True, allele_ct_limit: int = 2,
                 hardcall_phase_present: bool = False,
                 dosage_present: bool = False,
                 dosage_phase_present: bool = False,
                 variant_ct_limit=None):
        from .io.pgen_write import PgenWriter as _Core

        if sample_ct <= 0:
            raise ValueError("sample_ct must be positive")
        if variant_ct is None and variant_ct_limit is None:
            raise ValueError(
                "either variant_ct or variant_ct_limit is required"
            )
        self._path = _fname(filename)
        self._n = sample_ct
        self._declared_ct = variant_ct
        self._limit = variant_ct_limit
        self._phase = hardcall_phase_present or dosage_phase_present
        self._dosage = dosage_present
        self._multi = allele_ct_limit > 2
        self._nonref_flags = nonref_flags
        self._core = None
        self._buffered = None
        if variant_ct is not None:
            self._core = _Core(
                self._path, sample_ct, variant_ct,
                trusted_ref=(nonref_flags is False),
                with_dosage=self._dosage, with_phase=self._phase,
                with_multiallelic=self._multi,
            )
        else:
            self._buffered = []
        self._written = 0

    def _codes_from_genobytes(self, genobytes: np.ndarray) -> np.ndarray:
        g = np.asarray(genobytes).astype(np.int16)
        codes = np.where((g < 0) | (g == 3), 3, g).astype(np.uint8)
        if ((g > 3) | ((g < 0) & (g != -9))).any():
            raise ValueError("genotypes must be in {0, 1, 2, -9, 3}")
        return codes

    def _emit(self, fn_name: str, *args, **kwargs) -> None:
        if self._core is not None:
            getattr(self._core, fn_name)(*args, **kwargs)
        else:
            self._buffered.append((fn_name, args, kwargs))
        self._written += 1

    def append_biallelic(self, genobytes: np.ndarray) -> None:
        self._emit("append_codes", self._codes_from_genobytes(genobytes))

    def append_biallelic_batch(self, genobytes_batch: np.ndarray) -> None:
        for row in np.atleast_2d(genobytes_batch):
            self.append_biallelic(row)

    def _pair_from_allele_codes(self, allele_codes: np.ndarray):
        ac = np.asarray(allele_codes).reshape(-1, 2).astype(np.int64)
        if ac.shape[0] != self._n:
            raise ValueError("allele_codes must have 2*sample_ct entries")
        miss = (ac[:, 0] < 0) | (ac[:, 1] < 0)
        if ((ac[:, 0] < 0) != (ac[:, 1] < 0)).any():
            raise ValueError("-9s must occur in pairs")
        return ac, miss

    def append_alleles(self, allele_codes: np.ndarray,
                       all_phased: bool = False, allele_ct=None) -> None:
        ac, miss = self._pair_from_allele_codes(allele_codes)
        n_all = allele_ct or max(2, int(ac[~miss].max(initial=1)) + 1)
        if all_phased and not self._phase:
            raise ValueError(
                "writer not opened with hardcall_phase_present=True"
            )
        self._append_pair(ac, miss, n_all,
                          np.ones(self._n, bool) if all_phased else None)

    def append_alleles_batch(self, allele_codes_batch, all_phased=False,
                             allele_cts=None) -> None:
        for k, row in enumerate(np.atleast_2d(allele_codes_batch)):
            self.append_alleles(
                row, all_phased,
                None if allele_cts is None else int(allele_cts[k]),
            )

    def append_partially_phased(self, allele_codes, phasepresent,
                                allele_ct=None) -> None:
        ac, miss = self._pair_from_allele_codes(allele_codes)
        n_all = allele_ct or max(2, int(ac[~miss].max(initial=1)) + 1)
        self._append_pair(ac, miss, n_all,
                          np.asarray(phasepresent, bool))

    def append_partially_phased_batch(self, allele_codes_batch,
                                      phasepresent_batch,
                                      allele_cts=None) -> None:
        acb = np.atleast_2d(allele_codes_batch)
        ppb = np.atleast_2d(phasepresent_batch)
        for k in range(acb.shape[0]):
            self.append_partially_phased(
                acb[k], ppb[k],
                None if allele_cts is None else int(allele_cts[k]),
            )

    def _append_pair(self, ac, miss, n_all, phasepresent) -> None:
        # biallelic base codes: ALT1 counts (multiallelic pairs use aux
        # track #1 patches, matching PgrGetM's storage model)
        lo = np.minimum(ac[:, 0], ac[:, 1])
        hi = np.maximum(ac[:, 0], ac[:, 1])
        codes = np.zeros(self._n, np.uint8)
        codes[(lo == 0) & (hi >= 1)] = 1
        codes[lo >= 1] = 2
        codes[miss] = 3
        if n_all > 2:
            if not self._multi:
                raise ValueError(
                    "writer not opened with allele_ct_limit > 2"
                )
            het01 = (lo == 0) & (hi >= 1)
            ids01 = np.flatnonzero(het01 & (hi > 1)).astype(np.uint32)
            a01 = hi[ids01].astype(np.uint32)
            hom = lo >= 1
            ids10 = np.flatnonzero(
                hom & ((lo > 1) | (hi > 1))
            ).astype(np.uint32)
            lo10 = lo[ids10].astype(np.uint32)
            hi10 = hi[ids10].astype(np.uint32)
            self._emit("append_codes_multiallelic", codes, ids01, a01,
                       ids10, lo10, hi10, n_all)
            return
        if phasepresent is not None and self._phase:
            het = codes == 1
            pp = np.asarray(phasepresent, bool) & het
            # phaseinfo: stored pair is "hi|lo"? swapped bit = first allele
            # is the later one (1|0)
            swapped = het & (ac[:, 0] > ac[:, 1])
            self._emit("append_codes_with_phase", codes, pp, swapped)
            return
        self._emit("append_codes", codes)

    def append_dosages(self, floatarr: np.ndarray) -> None:
        if not self._dosage:
            raise ValueError("writer not opened with dosage_present=True")
        d = np.asarray(floatarr, np.float64)
        if d.shape[0] != self._n:
            raise ValueError("floatarr must have sample_ct entries")
        tol = 2.0 ** -16
        missing = (d < -tol) | (d > 2.0 + tol)
        dc = np.clip(d, 0.0, 2.0)
        vals = np.rint(dc * 16384.0).astype(np.uint16)
        vals = np.where(missing, np.uint16(65535), vals)
        codes = np.where(
            missing, 3, np.rint(dc).astype(np.int64)
        ).astype(np.uint8)
        ids = np.arange(self._n, dtype=np.uint32)
        self._emit("append_codes_with_dosage", codes, ids, vals)

    def append_dosages_batch(self, floatarr_batch: np.ndarray) -> None:
        for row in np.atleast_2d(floatarr_batch):
            self.append_dosages(row)

    def close(self) -> None:
        from .io.pgen_write import PgenWriter as _Core

        if self._core is None:
            core = _Core(
                self._path, self._n, self._written,
                trusted_ref=(self._nonref_flags is False),
                with_dosage=self._dosage, with_phase=self._phase,
                with_multiallelic=self._multi,
            )
            for fn_name, args, kwargs in self._buffered:
                getattr(core, fn_name)(*args, **kwargs)
            core.close()
            self._buffered = None
            return
        if self._declared_ct is not None and \
                self._written != self._declared_ct:
            raise ValueError(
                f"wrote {self._written} variants, declared "
                f"{self._declared_ct}"
            )
        self._core.close()
        self._core = None

    def __enter__(self):
        return self

    def __exit__(self, exc_type, *exc):
        if exc_type is None:
            self.close()
