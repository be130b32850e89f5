#!/bin/sh
# Build the native runtime library (called automatically by
# io/native_loader.py on first use; safe to re-run).
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O2 -fPIC -shared -std=c++17 -pthread \
    src/tum_loader.cpp src/cluster.cpp \
    -lpng -ljpeg -lz \
    -o lib/liboslam_native.so
echo "built lib/liboslam_native.so"
