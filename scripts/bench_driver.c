/* Cross-implementation parity / CPU-baseline driver.
 *
 * Links against the reference scrappie compute path (sources copied into
 * .baseline/src by scripts/build_baseline.sh, weights exported from OUR
 * registry by scripts/export_c_headers.py) and exposes each decode stage
 * on text-file inputs so tests/test_reference_parity.py can compare the
 * reference C implementation with scrappie_tpu on identical data.
 *
 * This file is scrappie_tpu glue, committed in-repo; only the reference
 * sources it links against live in the gitignored .baseline/ area.
 *
 * Modes (all output TSV "key\tvalue" lines on stdout):
 *   bench_driver SIGNAL.txt
 *       rgrgr_r94 basecall of a pre-normalised signal (one float/line):
 *       sequence, score, nblock.   (ref src/scrappie_raw.c:265-313)
 *   bench_driver --mode decode POST.txt
 *       transducer Viterbi on a [T x 1025] log-posterior ("T ns" header
 *       then rows): path (nblock+1 ints), score.  (ref src/decode.c:123)
 *   bench_driver --mode crfdecode TRANS.txt
 *       CRF Viterbi on [T x 25] transitions: path, sequence, score.
 *       (ref src/decode.c:836-918)
 *   bench_driver --mode crf SIGNAL.txt
 *       rnnrf_r94 pipeline on a pre-normalised signal: sequence, score.
 *       (ref src/networks.c:567-615 + src/decode.c:836)
 *   bench_driver --mode dtw BASES.txt SIGNAL.txt
 *       squiggle_r94 prediction for BASES, DTW of SIGNAL against it with
 *       mappy defaults: path (nsample ints), score, forward.
 *       (ref src/scrappie_mappy.c:59-75, src/decode.c:1035-1401)
 *   bench_driver --mode seqmap BASES.txt POST.txt [BAND.txt]
 *       posterior-to-sequence map (5-mer states): dense -> path, score,
 *       forward; banded (BAND.txt rows "low high") -> score, forward.
 *       (ref src/decode.c:1420-1964)
 *   bench_driver --mode bench SIGNAL.txt [REPS]
 *       time the full rgrgr_r94 pipeline REPS times (default 10):
 *       nsample, reps, seconds, samples_per_sec.
 */
#define _POSIX_C_SOURCE 200809L /* clock_gettime under -std=c99 */

#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#include "decode.h"
#include "homopolymer.h"
#include "networks.h"
#include "scrappie_matrix.h"
#include "scrappie_seq_helpers.h"
#include "scrappie_structures.h"
#include "util.h"

static void die(const char *msg) {
    fprintf(stderr, "bench_driver: %s\n", msg);
    exit(1);
}

/* Signal file: one float per line. */
static float *read_signal(const char *fn, size_t *n_out) {
    FILE *fh = fopen(fn, "r");
    if (NULL == fh) die("cannot open signal file");
    size_t cap = 1 << 16, n = 0;
    float *sig = malloc(cap * sizeof(float));
    if (NULL == sig) die("oom");
    float v;
    while (1 == fscanf(fh, "%f", &v)) {
        if (n == cap) {
            cap *= 2;
            sig = realloc(sig, cap * sizeof(float));
            if (NULL == sig) die("oom");
        }
        sig[n++] = v;
    }
    fclose(fh);
    *n_out = n;
    return sig;
}

/* Matrix file: "T ns" header then T rows of ns floats.  Loaded into a
 * column-major scrappie_matrix with nr=ns, nc=T (column = block). */
static scrappie_matrix read_matrix(const char *fn) {
    FILE *fh = fopen(fn, "r");
    if (NULL == fh) die("cannot open matrix file");
    size_t T, ns;
    if (2 != fscanf(fh, "%zu %zu", &T, &ns)) die("bad matrix header");
    scrappie_matrix mat = make_scrappie_matrix(ns, T);
    if (NULL == mat) die("oom");
    for (size_t t = 0; t < T; t++) {
        for (size_t s = 0; s < ns; s++) {
            float v;
            if (1 != fscanf(fh, "%f", &v)) die("bad matrix body");
            mat->data.f[t * mat->stride + s] = v;
        }
    }
    fclose(fh);
    return mat;
}

/* Band file: T rows of "low high". */
static void read_band(const char *fn, size_t n, size_t *low, size_t *high) {
    FILE *fh = fopen(fn, "r");
    if (NULL == fh) die("cannot open band file");
    for (size_t i = 0; i < n; i++) {
        if (2 != fscanf(fh, "%zu %zu", &low[i], &high[i]))
            die("bad band body");
    }
    fclose(fh);
}

/* Bases file: one line of ACGT. */
static char *read_bases(const char *fn, size_t *n_out) {
    FILE *fh = fopen(fn, "r");
    if (NULL == fh) die("cannot open bases file");
    size_t cap = 1 << 12, n = 0;
    char *seq = malloc(cap);
    if (NULL == seq) die("oom");
    int c;
    while (EOF != (c = fgetc(fh))) {
        if ('\n' == c || '\r' == c || ' ' == c) continue;
        if (n + 1 == cap) {
            cap *= 2;
            seq = realloc(seq, cap);
            if (NULL == seq) die("oom");
        }
        seq[n++] = (char)c;
    }
    seq[n] = '\0';
    fclose(fh);
    *n_out = n;
    return seq;
}

static raw_table table_of(float *sig, size_t n) {
    raw_table rt = {NULL, n, 0, n, sig};
    return rt;
}

static void print_path(const char *key, const int *path, size_t n) {
    printf("%s\t", key);
    for (size_t i = 0; i < n; i++) {
        printf(i ? " %d" : "%d", path[i]);
    }
    printf("\n");
}

static double now_sec(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

/* Full rgrgr_r94 pipeline on a pre-normalised signal; mirrors
 * calculate_post in src/scrappie_raw.c:265-313 minus I/O and trimming
 * (the caller already normalised). */
static float basecall_rgrgr(raw_table rt, char **seq_out, size_t *nblock_out) {
    scrappie_matrix post =
        nanonet_rgrgr_r94_posterior(rt, 1e-5f, 1.0f, 1.0f, true);
    if (NULL == post) die("posterior failed");
    const size_t nblock = post->nc;
    const int nstate = (int)post->nr;
    int *path = calloc(nblock + 1, sizeof(int));
    int *pos = calloc(nblock + 1, sizeof(int));
    if (NULL == path || NULL == pos) die("oom");
    float score = decode_transducer(post, 0.0f, 0.0f, 2.0f, path, false);
    char *basecall = overlapper(path, nblock + 1, nstate - 1, pos);
    if (NULL == basecall) die("overlapper failed");
    free(pos);
    free(path);
    free_scrappie_matrix(post);
    *seq_out = basecall;
    *nblock_out = nblock;
    return score;
}

static int main_basecall(const char *sigfile) {
    size_t n;
    float *sig = read_signal(sigfile, &n);
    char *seq = NULL;
    size_t nblock;
    float score = basecall_rgrgr(table_of(sig, n), &seq, &nblock);
    printf("sequence\t%s\n", seq);
    printf("score\t%.8g\n", score);
    printf("nblock\t%zu\n", nblock);
    return 0;
}

static int main_bench(const char *sigfile, int reps) {
    size_t n;
    float *sig = read_signal(sigfile, &n);
    char *seq = NULL;
    size_t nblock;
    basecall_rgrgr(table_of(sig, n), &seq, &nblock); /* warm up */
    free(seq);
    double t0 = now_sec();
    for (int r = 0; r < reps; r++) {
        seq = NULL;
        basecall_rgrgr(table_of(sig, n), &seq, &nblock);
        free(seq);
    }
    double dt = now_sec() - t0;
    printf("nsample\t%zu\n", n);
    printf("reps\t%d\n", reps);
    printf("seconds\t%.6f\n", dt);
    printf("samples_per_sec\t%.1f\n", (double)n * reps / dt);
    return 0;
}

static int main_decode(const char *postfile) {
    scrappie_matrix post = read_matrix(postfile);
    const size_t nblock = post->nc;
    int *path = calloc(nblock + 1, sizeof(int));
    if (NULL == path) die("oom");
    float score = decode_transducer(post, 0.0f, 0.0f, 2.0f, path, false);
    print_path("path", path, nblock + 1);
    printf("score\t%.8g\n", score);
    free(path);
    free_scrappie_matrix(post);
    return 0;
}

static int main_crfdecode(const char *transfile) {
    scrappie_matrix trans = read_matrix(transfile);
    const size_t nblock = trans->nc;
    int *path = calloc(nblock + 1, sizeof(int));
    int *pos = calloc(nblock + 1, sizeof(int));
    if (NULL == path || NULL == pos) die("oom");
    float score = decode_crf(trans, path);
    char *seq = crfpath_to_basecall(path, nblock, pos);
    if (NULL == seq) die("crfpath_to_basecall failed");
    print_path("path", path, nblock + 1);
    printf("sequence\t%s\n", seq);
    printf("score\t%.8g\n", score);
    free(pos);
    free(path);
    free_scrappie_matrix(trans);
    return 0;
}

static int main_crf(const char *sigfile) {
    size_t n;
    float *sig = read_signal(sigfile, &n);
    scrappie_matrix trans =
        nanonet_rnnrf_r94_transitions(table_of(sig, n), 1e-5f, 1.0f, 1.0f, true);
    if (NULL == trans) die("rnnrf transitions failed");
    const size_t nblock = trans->nc;
    int *path = calloc(nblock + 1, sizeof(int));
    int *pos = calloc(nblock + 1, sizeof(int));
    if (NULL == path || NULL == pos) die("oom");
    float score = decode_crf(trans, path);
    char *seq = crfpath_to_basecall(path, nblock, pos);
    if (NULL == seq) die("crfpath_to_basecall failed");
    printf("sequence\t%s\n", seq);
    printf("score\t%.8g\n", score);
    printf("nblock\t%zu\n", nblock);
    free(pos);
    free(path);
    free_scrappie_matrix(trans);
    return 0;
}

static int main_dtw(const char *basesfile, const char *sigfile) {
    size_t nbases, nsample;
    char *bases = read_bases(basesfile, &nbases);
    float *sig = read_signal(sigfile, &nsample);
    int *iseq = encode_bases_to_integers(bases, nbases, 1);
    if (NULL == iseq) die("bad bases");
    scrappie_matrix params = squiggle_r94(iseq, nbases, false);
    if (NULL == params) die("squiggle failed");
    raw_table rt = table_of(sig, nsample);
    int32_t *path = calloc(nsample, sizeof(int32_t));
    if (NULL == path) die("oom");
    /* mappy defaults: rate 1, backprob 0, localpen 2, skippen 5000,
     * minscore 5 (ref src/scrappie_mappy.c:59-75) */
    float score = squiggle_match_viterbi(rt, 1.0f, params, 0.0f, 2.0f,
                                         5000.0f, 5.0f, path);
    float fwd = squiggle_match_forward(rt, 1.0f, params, 0.0f, 2.0f,
                                       5000.0f, 5.0f);
    printf("path\t");
    for (size_t i = 0; i < nsample; i++) {
        printf(i ? " %d" : "%d", (int)path[i]);
    }
    printf("\n");
    printf("score\t%.8g\n", score);
    printf("forward\t%.8g\n", fwd);
    free(path);
    free_scrappie_matrix(params);
    free(iseq);
    free(bases);
    return 0;
}

static int main_seqmap(const char *basesfile, const char *postfile,
                       const char *bandfile) {
    size_t nbases;
    char *bases = read_bases(basesfile, &nbases);
    scrappie_matrix post = read_matrix(postfile);
    const size_t nblock = post->nc;
    const size_t state_len = 5; /* ref src/scrappie_seqmappy.c:178-180 */
    int *iseq = encode_bases_to_integers(bases, nbases, state_len);
    if (NULL == iseq) die("bad bases");
    const size_t seqlen = nbases - state_len + 1;

    if (NULL != bandfile) {
        size_t *low = calloc(nblock, sizeof(size_t));
        size_t *high = calloc(nblock, sizeof(size_t));
        if (NULL == low || NULL == high) die("oom");
        read_band(bandfile, nblock, low, high);
        if (!are_bounds_sane(low, high, nblock, seqlen)) die("insane band");
        float score = map_to_sequence_viterbi_banded(post, 0.0f, 0.0f, 4.0f,
                                                     iseq, seqlen, low, high);
        float fwd = map_to_sequence_forward_banded(post, 0.0f, 0.0f, 4.0f,
                                                   iseq, seqlen, low, high);
        printf("score\t%.8g\n", score);
        printf("forward\t%.8g\n", fwd);
        free(high);
        free(low);
    } else {
        int *path = calloc(nblock, sizeof(int));
        if (NULL == path) die("oom");
        float score = map_to_sequence_viterbi(post, 0.0f, 0.0f, 4.0f, iseq,
                                              seqlen, path);
        float fwd = map_to_sequence_forward(post, 0.0f, 0.0f, 4.0f, iseq,
                                            seqlen);
        print_path("path", path, nblock);
        printf("score\t%.8g\n", score);
        printf("forward\t%.8g\n", fwd);
        free(path);
    }
    free_scrappie_matrix(post);
    free(iseq);
    free(bases);
    return 0;
}

int main(int argc, char **argv) {
    if (argc >= 3 && 0 == strcmp(argv[1], "--mode")) {
        const char *mode = argv[2];
        if (0 == strcmp(mode, "decode") && argc >= 4)
            return main_decode(argv[3]);
        if (0 == strcmp(mode, "crfdecode") && argc >= 4)
            return main_crfdecode(argv[3]);
        if (0 == strcmp(mode, "crf") && argc >= 4)
            return main_crf(argv[3]);
        if (0 == strcmp(mode, "dtw") && argc >= 5)
            return main_dtw(argv[3], argv[4]);
        if (0 == strcmp(mode, "seqmap") && argc >= 5)
            return main_seqmap(argv[3], argv[4], argc >= 6 ? argv[5] : NULL);
        if (0 == strcmp(mode, "bench") && argc >= 4)
            return main_bench(argv[3], argc >= 5 ? atoi(argv[4]) : 10);
        die("unknown mode or missing arguments");
    }
    if (argc >= 2) return main_basecall(argv[1]);
    die("usage: bench_driver [--mode decode|crfdecode|crf|dtw|seqmap|bench] FILES...");
    return 1;
}
