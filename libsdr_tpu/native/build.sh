#!/bin/sh
# Reproducible build of the native host runtime (_sdr_native.so) — the same
# command native/__init__.py uses for the on-first-import fallback build.
# Usage: sh libsdr_tpu/native/build.sh
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC src/sdr_native.cc \
    -o _sdr_native.so -lpthread
echo "built $(pwd)/_sdr_native.so"
