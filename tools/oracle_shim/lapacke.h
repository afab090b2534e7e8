/* Minimal lapacke.h shim for building the plink2 LAPACK oracle on this image.
 *
 * The image ships /usr/lib/x86_64-linux-gnu/liblapack.so.3 (Fortran symbols)
 * but no LAPACKE headers.  plink2_matrix.{h,cc} only needs the LAPACK_<name>
 * raw-Fortran-symbol macros plus prototypes; it never calls LAPACKE_* wrappers
 * (reference: 2.0/plink2_matrix.cc:25-38, call sites pass no trailing strlen
 * args, i.e. the legacy pre-3.9.1 Fortran char ABI, which the system netlib
 * LAPACK tolerates because LSAME only inspects the first character).
 */
#ifndef PLINK_ORACLE_LAPACKE_SHIM_H
#define PLINK_ORACLE_LAPACKE_SHIM_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef int32_t lapack_shim_int;

void dgecon_(const char* norm, const lapack_shim_int* n, const double* a,
             const lapack_shim_int* lda, const double* anorm, double* rcond,
             double* work, lapack_shim_int* iwork, lapack_shim_int* info);
void dgesvd_(const char* jobu, const char* jobvt, const lapack_shim_int* m,
             const lapack_shim_int* n, double* a, const lapack_shim_int* lda,
             double* s, double* u, const lapack_shim_int* ldu, double* vt,
             const lapack_shim_int* ldvt, double* work,
             const lapack_shim_int* lwork, lapack_shim_int* info);
void dgetrf_(const lapack_shim_int* m, const lapack_shim_int* n, double* a,
             const lapack_shim_int* lda, lapack_shim_int* ipiv,
             lapack_shim_int* info);
void dgetri_(const lapack_shim_int* n, double* a, const lapack_shim_int* lda,
             const lapack_shim_int* ipiv, double* work,
             const lapack_shim_int* lwork, lapack_shim_int* info);
double dlange_(const char* norm, const lapack_shim_int* m,
               const lapack_shim_int* n, const double* a,
               const lapack_shim_int* lda, double* work);
double dlansy_(const char* norm, const char* uplo, const lapack_shim_int* n,
               const double* a, const lapack_shim_int* lda, double* work);
void dpocon_(const char* uplo, const lapack_shim_int* n, const double* a,
             const lapack_shim_int* lda, const double* anorm, double* rcond,
             double* work, lapack_shim_int* iwork, lapack_shim_int* info);
void dpotrf_(const char* uplo, const lapack_shim_int* n, double* a,
             const lapack_shim_int* lda, lapack_shim_int* info);
void dpotri_(const char* uplo, const lapack_shim_int* n, double* a,
             const lapack_shim_int* lda, lapack_shim_int* info);
void dpotrs_(const char* uplo, const lapack_shim_int* n,
             const lapack_shim_int* nrhs, const double* a,
             const lapack_shim_int* lda, double* b, const lapack_shim_int* ldb,
             lapack_shim_int* info);
void dsyevr_(const char* jobz, const char* range, const char* uplo,
             const lapack_shim_int* n, double* a, const lapack_shim_int* lda,
             const double* vl, const double* vu, const lapack_shim_int* il,
             const lapack_shim_int* iu, const double* abstol,
             lapack_shim_int* m, double* w, double* z,
             const lapack_shim_int* ldz, lapack_shim_int* isuppz, double* work,
             const lapack_shim_int* lwork, lapack_shim_int* iwork,
             const lapack_shim_int* liwork, lapack_shim_int* info);
void sgeqrf_(const lapack_shim_int* m, const lapack_shim_int* n, float* a,
             const lapack_shim_int* lda, float* tau, float* work,
             const lapack_shim_int* lwork, lapack_shim_int* info);
void sorgqr_(const lapack_shim_int* m, const lapack_shim_int* n,
             const lapack_shim_int* k, float* a, const lapack_shim_int* lda,
             const float* tau, float* work, const lapack_shim_int* lwork,
             lapack_shim_int* info);

#ifdef __cplusplus
}
#endif

#define LAPACK_dgecon dgecon_
#define LAPACK_dgesvd dgesvd_
#define LAPACK_dgetrf dgetrf_
#define LAPACK_dgetri dgetri_
#define LAPACK_dlange dlange_
#define LAPACK_dlansy dlansy_
#define LAPACK_dpocon dpocon_
#define LAPACK_dpotrf dpotrf_
#define LAPACK_dpotri dpotri_
#define LAPACK_dpotrs dpotrs_
#define LAPACK_dsyevr dsyevr_

#endif  /* PLINK_ORACLE_LAPACKE_SHIM_H */
