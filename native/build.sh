#!/bin/sh
# Build the native runtime library (called automatically by
# io/native_loader.py on first use; safe to re-run).
# The library is compiled to a temp path and atomically renamed into
# place so concurrent processes never observe a missing/partial .so.
set -e
cd "$(dirname "$0")"
mkdir -p lib
TMP="lib/.liboslam_native.$$.so"
trap 'rm -f "$TMP"' EXIT
g++ -O2 -fPIC -shared -std=c++17 -pthread \
    src/tum_loader.cpp src/cluster.cpp \
    -lpng -ljpeg -lz \
    -o "$TMP"
mv -f "$TMP" lib/liboslam_native.so
echo "built lib/liboslam_native.so"
