#pragma once
/* Minimal CBLAS declarations for the baseline build (no system cblas.h
 * in this image).  Only the two entry points the reference compute path
 * uses (cblas_sgemm / cblas_sgemv); linked against OpenBLAS at build
 * time by scripts/build_baseline.sh, which installs this file as
 * .baseline/src/cblas.h. */

#ifdef __cplusplus
extern "C" {
#endif

typedef enum CBLAS_ORDER { CblasRowMajor = 101, CblasColMajor = 102 } CBLAS_ORDER;
typedef enum CBLAS_TRANSPOSE {
    CblasNoTrans = 111,
    CblasTrans = 112,
    CblasConjTrans = 113
} CBLAS_TRANSPOSE;

void cblas_sgemm(const enum CBLAS_ORDER Order, const enum CBLAS_TRANSPOSE TransA,
                 const enum CBLAS_TRANSPOSE TransB, const int M, const int N,
                 const int K, const float alpha, const float *A, const int lda,
                 const float *B, const int ldb, const float beta, float *C,
                 const int ldc);

void cblas_sgemv(const enum CBLAS_ORDER order, const enum CBLAS_TRANSPOSE TransA,
                 const int M, const int N, const float alpha, const float *A,
                 const int lda, const float *X, const int incX, const float beta,
                 float *Y, const int incY);

#ifdef __cplusplus
}
#endif
