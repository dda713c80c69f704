/* C embed shim: see scrappie_tpu_embed.h.
 *
 * Design: keep the C side free of numpy/JAX ABI coupling by passing
 * raw buffers as memoryviews into scrappie_tpu/embed.py and converting
 * plain Python results back.  (The reference's embed API instead links
 * the whole C pipeline, ref interface/scrappie.h; here the pipeline is
 * Python/JAX, so the interpreter IS the library.)
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <stdlib.h>
#include <string.h>

#include "scrappie_tpu_embed.h"

static PyObject *g_mod; /* scrappie_tpu.embed */

int stpu_init(void) {
    if (g_mod != NULL)
        return 0;
    if (!Py_IsInitialized())
        Py_Initialize();
    g_mod = PyImport_ImportModule("scrappie_tpu.embed");
    if (g_mod == NULL) {
        PyErr_Print();
        return -1;
    }
    return 0;
}

static PyObject *call_with_buffer(const char *fn, const float *signal,
                                  int n, const char *model) {
    PyObject *view = PyMemoryView_FromMemory(
        (char *)signal, (Py_ssize_t)n * (Py_ssize_t)sizeof(float),
        PyBUF_READ);
    if (view == NULL)
        return NULL;
    PyObject *res = PyObject_CallMethod(g_mod, fn, "Os", view, model);
    Py_DECREF(view);
    return res;
}

const char *stpu_version(void) {
    static char buf[64];
    if (stpu_init() != 0)
        return NULL;
    PyObject *res = PyObject_CallMethod(g_mod, "version", NULL);
    if (res == NULL) {
        PyErr_Print();
        return NULL;
    }
    const char *s = PyUnicode_AsUTF8(res);
    if (s == NULL) {
        Py_DECREF(res);
        return NULL;
    }
    strncpy(buf, s, sizeof(buf) - 1);
    buf[sizeof(buf) - 1] = '\0';
    Py_DECREF(res);
    return buf;
}

char *stpu_basecall_raw(const float *signal, int n, const char *model,
                        float *score_out) {
    if (stpu_init() != 0 || signal == NULL || n <= 0)
        return NULL;
    PyObject *res = call_with_buffer("basecall_raw", signal, n, model);
    if (res == NULL) {
        PyErr_Print();
        return NULL;
    }
    char *out = NULL;
    PyObject *seq_obj = PyTuple_GetItem(res, 0); /* borrowed */
    PyObject *score_obj = PyTuple_GetItem(res, 1);
    if (seq_obj != NULL && score_obj != NULL) {
        const char *seq = PyUnicode_AsUTF8(seq_obj);
        if (seq != NULL) {
            out = strdup(seq);
            if (score_out != NULL)
                *score_out = (float)PyFloat_AsDouble(score_obj);
        }
    }
    if (out == NULL)
        PyErr_Print();
    Py_DECREF(res);
    return out;
}

float *stpu_calc_post(const float *signal, int n, const char *model,
                      int *nblock_out, int *nstate_out) {
    if (stpu_init() != 0 || signal == NULL || n <= 0)
        return NULL;
    PyObject *res = call_with_buffer("calc_post", signal, n, model);
    if (res == NULL) {
        PyErr_Print();
        return NULL;
    }
    float *out = NULL;
    PyObject *bytes_obj = PyTuple_GetItem(res, 0); /* borrowed */
    PyObject *nb_obj = PyTuple_GetItem(res, 1);
    PyObject *ns_obj = PyTuple_GetItem(res, 2);
    if (bytes_obj != NULL && nb_obj != NULL && ns_obj != NULL) {
        char *data;
        Py_ssize_t len;
        if (PyBytes_AsStringAndSize(bytes_obj, &data, &len) == 0) {
            out = (float *)malloc((size_t)len);
            if (out != NULL) {
                memcpy(out, data, (size_t)len);
                if (nblock_out != NULL)
                    *nblock_out = (int)PyLong_AsLong(nb_obj);
                if (nstate_out != NULL)
                    *nstate_out = (int)PyLong_AsLong(ns_obj);
            }
        }
    }
    if (out == NULL)
        PyErr_Print();
    Py_DECREF(res);
    return out;
}

void stpu_free(void *p) { free(p); }

void stpu_finalize(void) {
    if (g_mod != NULL) {
        Py_DECREF(g_mod);
        g_mod = NULL;
    }
    if (Py_IsInitialized())
        Py_FinalizeEx();
}
