/* Demo / test driver for the C embed surface.
 *
 * Usage: embed_demo <signal.f32> [model]
 * Reads a raw little-endian float32 signal file, basecalls it through
 * stpu_basecall_raw, prints "<score> <sequence>" on stdout, and checks
 * stpu_calc_post returns a sane matrix.  Exercised by
 * tests/test_embed.py against the Python API's answer.
 */
#include <stdio.h>
#include <stdlib.h>

#include "scrappie_tpu_embed.h"

int main(int argc, char **argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s signal.f32 [model]\n", argv[0]);
        return 2;
    }
    const char *model = argc > 2 ? argv[2] : "rgrgr_r94";

    FILE *fh = fopen(argv[1], "rb");
    if (fh == NULL) {
        perror("fopen");
        return 2;
    }
    fseek(fh, 0, SEEK_END);
    long nbytes = ftell(fh);
    fseek(fh, 0, SEEK_SET);
    int n = (int)(nbytes / (long)sizeof(float));
    float *sig = malloc((size_t)nbytes);
    if (sig == NULL || fread(sig, sizeof(float), (size_t)n, fh) != (size_t)n) {
        fprintf(stderr, "short read\n");
        return 2;
    }
    fclose(fh);

    if (stpu_init() != 0) {
        fprintf(stderr, "stpu_init failed\n");
        return 1;
    }
    const char *ver = stpu_version();
    fprintf(stderr, "scrappie_tpu %s\n", ver ? ver : "?");

    float score = 0.0f;
    char *seq = stpu_basecall_raw(sig, n, model, &score);
    if (seq == NULL) {
        fprintf(stderr, "basecall failed\n");
        return 1;
    }

    int nblock = 0, nstate = 0;
    float *post = stpu_calc_post(sig, n, model, &nblock, &nstate);
    if (post == NULL || nblock <= 0 || nstate <= 0) {
        fprintf(stderr, "calc_post failed\n");
        return 1;
    }
    fprintf(stderr, "post %d x %d\n", nblock, nstate);
    stpu_free(post);

    printf("%.4f %s\n", score, seq);
    stpu_free(seq);
    stpu_finalize();
    free(sig);
    return 0;
}
