// R glue for the plink_tpu pgen C API (pgen_capi_* in pgen_decode.cc).
//
// Mirrors the handle discipline of the upstream pgenlibr Rcpp layer
// (reference 2.0/pgenlibr/src/pgenlibr.cpp) using plain .Call + external
// pointers -- no Rcpp dependency.  Built by R CMD INSTALL after
// tools/build_r_pgenlibr.sh copies pgen_decode.cc next to this file.

#include <R.h>
#include <Rinternals.h>

#include <cstdint>

extern "C" {
void* pgen_capi_open(const char* path, uint32_t sample_ct_hint, int* err);
void pgen_capi_close(void* h);
uint32_t pgen_capi_variant_ct(void* h);
uint32_t pgen_capi_sample_ct(void* h);
int pgen_capi_read_codes(void* h, uint32_t v0, uint32_t vct, uint8_t* out,
                         int nthreads);
}

static void pgen_xptr_finalizer(SEXP xptr) {
  void* h = R_ExternalPtrAddr(xptr);
  if (h) {
    pgen_capi_close(h);
    R_ClearExternalPtr(xptr);
  }
}

extern "C" SEXP rpgen_open(SEXP path, SEXP sample_ct_hint) {
  int err = 0;
  void* h = pgen_capi_open(CHAR(STRING_ELT(path, 0)),
                           (uint32_t)asInteger(sample_ct_hint), &err);
  if (!h) {
    error("pgenlibr: failed to open '%s' (code %d)",
          CHAR(STRING_ELT(path, 0)), err);
  }
  SEXP xptr = PROTECT(R_MakeExternalPtr(h, R_NilValue, R_NilValue));
  R_RegisterCFinalizerEx(xptr, pgen_xptr_finalizer, TRUE);
  UNPROTECT(1);
  return xptr;
}

extern "C" SEXP rpgen_close(SEXP xptr) {
  pgen_xptr_finalizer(xptr);
  return R_NilValue;
}

static void* handle_of(SEXP xptr) {
  void* h = R_ExternalPtrAddr(xptr);
  if (!h) error("pgenlibr: pgen file already closed");
  return h;
}

extern "C" SEXP rpgen_variant_ct(SEXP xptr) {
  return ScalarInteger((int)pgen_capi_variant_ct(handle_of(xptr)));
}

extern "C" SEXP rpgen_sample_ct(SEXP xptr) {
  return ScalarInteger((int)pgen_capi_sample_ct(handle_of(xptr)));
}

// variant_nums: 1-based variant indices.  Returns an integer matrix
// [sample_ct x k] of ALT dosages with NA for missing genotypes.
extern "C" SEXP rpgen_read_int(SEXP xptr, SEXP variant_nums) {
  void* h = handle_of(xptr);
  const uint32_t N = pgen_capi_sample_ct(h);
  const uint32_t M = pgen_capi_variant_ct(h);
  const int k = LENGTH(variant_nums);
  SEXP out = PROTECT(allocMatrix(INTSXP, (int)N, k));
  int* op = INTEGER(out);
  uint8_t* row = (uint8_t*)R_alloc(N, 1);
  for (int j = 0; j < k; ++j) {
    const int v1 = INTEGER(variant_nums)[j];
    if (v1 < 1 || (uint32_t)v1 > M) {
      UNPROTECT(1);
      error("pgenlibr: variant_num %d out of range [1, %u]", v1, M);
    }
    const int rc = pgen_capi_read_codes(h, (uint32_t)(v1 - 1), 1, row, 1);
    if (rc) {
      UNPROTECT(1);
      error("pgenlibr: read failed (code %d)", rc);
    }
    for (uint32_t s = 0; s < N; ++s) {
      op[(size_t)j * N + s] = (row[s] == 3) ? NA_INTEGER : (int)row[s];
    }
  }
  UNPROTECT(1);
  return out;
}

// Same as rpgen_read_int but numeric output; meanimpute replaces missing
// with twice the observed ALT frequency (pgenlibr ReadList semantics).
extern "C" SEXP rpgen_read_num(SEXP xptr, SEXP variant_nums,
                               SEXP meanimpute) {
  void* h = handle_of(xptr);
  const uint32_t N = pgen_capi_sample_ct(h);
  const uint32_t M = pgen_capi_variant_ct(h);
  const int k = LENGTH(variant_nums);
  const int mi = asLogical(meanimpute) == TRUE;
  SEXP out = PROTECT(allocMatrix(REALSXP, (int)N, k));
  double* op = REAL(out);
  uint8_t* row = (uint8_t*)R_alloc(N, 1);
  for (int j = 0; j < k; ++j) {
    const int v1 = INTEGER(variant_nums)[j];
    if (v1 < 1 || (uint32_t)v1 > M) {
      UNPROTECT(1);
      error("pgenlibr: variant_num %d out of range [1, %u]", v1, M);
    }
    const int rc = pgen_capi_read_codes(h, (uint32_t)(v1 - 1), 1, row, 1);
    if (rc) {
      UNPROTECT(1);
      error("pgenlibr: read failed (code %d)", rc);
    }
    double alt = 0.0;
    uint32_t obs = 0;
    if (mi) {
      for (uint32_t s = 0; s < N; ++s) {
        if (row[s] != 3) {
          alt += row[s];
          ++obs;
        }
      }
    }
    const double fill = (mi && obs) ? alt / (double)obs : 0.0;
    for (uint32_t s = 0; s < N; ++s) {
      op[(size_t)j * N + s] =
          (row[s] == 3) ? (mi ? fill : NA_REAL) : (double)row[s];
    }
  }
  UNPROTECT(1);
  return out;
}
