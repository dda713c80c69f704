#!/bin/bash
# Build the reference compute-path benchmark binary in .baseline/.
# Reference sources are copied (not committed) into .baseline/src; weight
# headers come from scripts/export_c_headers.py.
set -e
cd "$(dirname "$0")/../.baseline/src"

BLAS=/opt/venv/lib/python3.12/site-packages/opencv_python.libs/libopenblasp-r0-59ffcd50.3.15.so

gcc -O3 -march=native -std=c99 -DUSE_SSE2 -DNDEBUG -I. \
    bench_driver.c scrappie_matrix.c layers.c networks.c nnfeatures.c \
    util.c scrappie_common.c decode.c event_detection.c scrappie_seq_helpers.c \
    homopolymer.c \
    "$BLAS" -Wl,-rpath,"$(dirname "$BLAS")" -lm -o bench_driver

echo "built $(pwd)/bench_driver"
