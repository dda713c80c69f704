/* Minimal C embed surface for scrappie_tpu.
 *
 * The TPU-native analogue of the reference's exported C API
 * (ref interface/scrappie.h:47-52: nanonet_posterior,
 * nanonet_raw_posterior, free_scrappie_matrix): a host application
 * links this shim (and libpython) and drives basecalling / posterior
 * computation over raw float32 signal buffers.  The shim embeds the
 * CPython interpreter and routes through scrappie_tpu/embed.py, so
 * the C side needs no numpy/JAX headers.
 *
 * Threading: all calls must come from the thread that called
 * stpu_init (the interpreter owns the GIL there).  Environment:
 * PYTHONPATH must reach the scrappie_tpu package (or have it
 * installed); SCRAPPIE_TPU_PLATFORM optionally pins the JAX backend.
 */
#ifndef SCRAPPIE_TPU_EMBED_H
#define SCRAPPIE_TPU_EMBED_H

#ifdef __cplusplus
extern "C" {
#endif

/* Start the interpreter and import scrappie_tpu. 0 on success. */
int stpu_init(void);

/* Package version string (static storage; do not free). NULL on error. */
const char *stpu_version(void);

/* Basecall a raw float32 signal (n samples) with the named model.
 * Returns a malloc'd NUL-terminated sequence (free with stpu_free);
 * NULL on error.  score_out may be NULL. */
char *stpu_basecall_raw(const float *signal, int n, const char *model,
                        float *score_out);

/* Posterior (log space) of a raw float32 signal: malloc'd row-major
 * [*nblock_out x *nstate_out] float32 (free with stpu_free); NULL on
 * error.  The analogue of the reference's exported posterior calls. */
float *stpu_calc_post(const float *signal, int n, const char *model,
                      int *nblock_out, int *nstate_out);

void stpu_free(void *p);

/* Shut the interpreter down (optional; idempotent). */
void stpu_finalize(void);

#ifdef __cplusplus
}
#endif

#endif /* SCRAPPIE_TPU_EMBED_H */
