#!/bin/sh
# Build the native oracle shared library.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -march=native -std=c++17 -fPIC -shared \
    -o lib/libicp_oracle.so src/icp_oracle.cpp
echo "built lib/libicp_oracle.so"
