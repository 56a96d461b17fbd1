#!/usr/bin/env bash
# Build and run the reference tracer (/root/reference, read-only) headlessly
# against the SDL2 stub in this directory, capturing its TRUE framebuffer as
# a golden image plus its exit-time performance report.
#
# The stub (SDL.h) implements just enough of the SDL2 API for the reference's
# main.cpp to run unmodified; on the first SDL_RenderPresent it dumps the
# surface to $REF_GOLDEN_OUT (default /tmp/ref_golden.ppm) and queues
# SDL_QUIT so the program tears down through its normal path — including the
# per-phase timing averages (reference main.cpp:384-392).
#
# Usage: tools/ref_harness/run.sh [output.ppm]
#
# The captured golden for the snapshot at /root/reference (640x640 — the
# ASPECT_RATIO=4/3 integer-division quirk — depth 10, demo scene of
# main.cpp:156-163) is committed at tests/golden/ref_demo_640x640_d10.png
# and compared structurally in tests/test_golden_reference.py.
set -euo pipefail

REF=${REF_DIR:-/root/reference}
HERE=$(cd "$(dirname "$0")" && pwd)
BUILD=$(mktemp -d /tmp/refharness.XXXXXX)
OUT=${1:-/tmp/ref_golden.ppm}

cp "$REF"/main.cpp "$REF"/scene.cpp "$REF"/scene.h "$REF"/vec.cpp "$REF"/vec.h "$BUILD/"
cp "$HERE/SDL.h" "$BUILD/"

# The reference includes <SDL2/SDL.h>; point that at the stub.
mkdir -p "$BUILD/SDL2"
cp "$HERE/SDL.h" "$BUILD/SDL2/SDL.h"

g++ -O3 -std=c++17 -I"$BUILD" -o "$BUILD/reftracer" \
    "$BUILD/main.cpp" "$BUILD/scene.cpp" "$BUILD/vec.cpp"

REF_GOLDEN_OUT="$OUT" "$BUILD/reftracer"
echo "golden framebuffer: $OUT"
