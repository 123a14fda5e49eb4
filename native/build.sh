#!/bin/sh
# Builds the native host helpers into yocto_tpu/native/.
set -e
cd "$(dirname "$0")"
mkdir -p ../yocto_tpu/native
g++ -O3 -std=c++17 -shared -fPIC bvh_builder.cpp -o ../yocto_tpu/native/libytpu.so
echo "built yocto_tpu/native/libytpu.so"
