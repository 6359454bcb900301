#!/bin/sh
# Build the native I/O library. Requires g++ and zlib (both baked in).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o liblongtr_native.so longtr_native.cc -lz
echo "built $(pwd)/liblongtr_native.so"
