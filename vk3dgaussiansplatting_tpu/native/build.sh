#!/bin/sh
# Build the native runtime library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    -o libgsnative.so gsnative.cpp
echo "built $(pwd)/libgsnative.so"
