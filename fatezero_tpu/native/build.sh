#!/bin/sh
# Build the native image loader: fatezero_tpu/native/libimage_loader.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    image_loader.cpp -o libimage_loader.so -ljpeg -lpng -lpthread
echo "built $(pwd)/libimage_loader.so"
