#!/bin/sh
# Build the native data-loader library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    -o liblightctr_native.so libffm_parser.cpp shm_kv.cpp plan_server.cpp -lrt
echo "built csrc/liblightctr_native.so"
