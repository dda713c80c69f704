#!/bin/bash
# Build the reference compute-path baseline binary in .baseline/ (gitignored).
#
# Self-contained from a fresh checkout: copies the reference sources from
# $SCRAPPIE_REF (default /root/reference) into .baseline/src, exports OUR
# shipped weights as C headers in the reference's own generated-header
# format (scripts/export_c_headers.py), and compiles the committed
# scripts/bench_driver.c against them.  The resulting
# .baseline/src/bench_driver unlocks tests/test_reference_parity.py.
set -e
cd "$(dirname "$0")/.."

REF="${SCRAPPIE_REF:-/root/reference}"
if [ ! -d "$REF/src" ]; then
    echo "reference sources not found at $REF (set SCRAPPIE_REF)" >&2
    exit 1
fi

mkdir -p .baseline/src/models
cp -f "$REF"/src/*.c "$REF"/src/*.h .baseline/src/
# -a keeps the model-header symlinks (broken in the reference snapshot);
# export_c_headers.py writes their targets next to them.
cp -fa "$REF"/src/models/. .baseline/src/models/
cp -f scripts/bench_driver.c .baseline/src/
cp -f scripts/baseline_cblas.h .baseline/src/cblas.h
python scripts/export_c_headers.py .baseline/src/models

# Any OpenBLAS (or plain BLAS) shared object will do for sgemm/sgemv.
BLAS="$(python - <<'EOF'
import glob
for pat in ("/opt/venv/lib/python3*/site-packages/**/libopenblas*.so*",
            "/usr/lib/**/libopenblas*.so*",
            "/usr/lib/**/libblas.so*"):
    hits = sorted(glob.glob(pat, recursive=True))
    if hits:
        print(hits[0])
        break
EOF
)"
if [ -z "$BLAS" ]; then
    echo "no BLAS shared library found" >&2
    exit 1
fi

cd .baseline/src
gcc -O3 -march=native -std=c99 -DUSE_SSE2 -DNDEBUG -I. \
    bench_driver.c scrappie_matrix.c layers.c networks.c nnfeatures.c \
    util.c scrappie_common.c decode.c event_detection.c scrappie_seq_helpers.c \
    homopolymer.c \
    "$BLAS" -Wl,-rpath,"$(dirname "$BLAS")" -lm -o bench_driver

echo "built $(pwd)/bench_driver"
