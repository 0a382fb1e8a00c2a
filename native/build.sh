#!/bin/sh
# Build the native host ops as a ctypes shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 skoots_native.cpp -o libskoots_native.so
echo "built $(pwd)/libskoots_native.so"
