/* Minimal cblas.h shim for building the plink oracle binaries on this image.
 *
 * The image ships /usr/lib/x86_64-linux-gnu/libblas.so.3 which exports the
 * cblas_* symbols, but no cblas.h header.  This shim declares exactly the
 * CBLAS surface the plink 1.9 / plink 2.0 reference sources use
 * (reference: 1.9/plink_matrix.h, 2.0/plink2_matrix.h).  Enum values match
 * the canonical netlib/OpenBLAS ABI.
 */
#ifndef PLINK_ORACLE_CBLAS_SHIM_H
#define PLINK_ORACLE_CBLAS_SHIM_H

#ifdef __cplusplus
extern "C" {
#endif

typedef enum CBLAS_ORDER { CblasRowMajor = 101, CblasColMajor = 102 } CBLAS_ORDER;
typedef enum CBLAS_TRANSPOSE { CblasNoTrans = 111, CblasTrans = 112, CblasConjTrans = 113 } CBLAS_TRANSPOSE;
typedef enum CBLAS_UPLO { CblasUpper = 121, CblasLower = 122 } CBLAS_UPLO;
typedef enum CBLAS_DIAG { CblasNonUnit = 131, CblasUnit = 132 } CBLAS_DIAG;
typedef enum CBLAS_SIDE { CblasLeft = 141, CblasRight = 142 } CBLAS_SIDE;

double cblas_ddot(const int n, const double* x, const int incx,
                  const double* y, const int incy);
float cblas_sdot(const int n, const float* x, const int incx,
                 const float* y, const int incy);
double cblas_dsdot(const int n, const float* x, const int incx,
                   const float* y, const int incy);

void cblas_dgemm(const enum CBLAS_ORDER order, const enum CBLAS_TRANSPOSE transa,
                 const enum CBLAS_TRANSPOSE transb, const int m, const int n,
                 const int k, const double alpha, const double* a, const int lda,
                 const double* b, const int ldb, const double beta, double* c,
                 const int ldc);
void cblas_sgemm(const enum CBLAS_ORDER order, const enum CBLAS_TRANSPOSE transa,
                 const enum CBLAS_TRANSPOSE transb, const int m, const int n,
                 const int k, const float alpha, const float* a, const int lda,
                 const float* b, const int ldb, const float beta, float* c,
                 const int ldc);
void cblas_dgemv(const enum CBLAS_ORDER order, const enum CBLAS_TRANSPOSE trans,
                 const int m, const int n, const double alpha, const double* a,
                 const int lda, const double* x, const int incx,
                 const double beta, double* y, const int incy);
void cblas_sgemv(const enum CBLAS_ORDER order, const enum CBLAS_TRANSPOSE trans,
                 const int m, const int n, const float alpha, const float* a,
                 const int lda, const float* x, const int incx,
                 const float beta, float* y, const int incy);
void cblas_dsyrk(const enum CBLAS_ORDER order, const enum CBLAS_UPLO uplo,
                 const enum CBLAS_TRANSPOSE trans, const int n, const int k,
                 const double alpha, const double* a, const int lda,
                 const double beta, double* c, const int ldc);
void cblas_ssyrk(const enum CBLAS_ORDER order, const enum CBLAS_UPLO uplo,
                 const enum CBLAS_TRANSPOSE trans, const int n, const int k,
                 const float alpha, const float* a, const int lda,
                 const float beta, float* c, const int ldc);
void cblas_dger(const enum CBLAS_ORDER order, const int m, const int n,
                const double alpha, const double* x, const int incx,
                const double* y, const int incy, double* a, const int lda);
void cblas_dsymm(const enum CBLAS_ORDER order, const enum CBLAS_SIDE side,
                 const enum CBLAS_UPLO uplo, const int m, const int n,
                 const double alpha, const double* a, const int lda,
                 const double* b, const int ldb, const double beta, double* c,
                 const int ldc);
void cblas_dsymv(const enum CBLAS_ORDER order, const enum CBLAS_UPLO uplo,
                 const int n, const double alpha, const double* a, const int lda,
                 const double* x, const int incx, const double beta, double* y,
                 const int incy);

#ifdef __cplusplus
}
#endif

#endif  /* PLINK_ORACLE_CBLAS_SHIM_H */
