#!/bin/sh
# Build the native oracle shared library.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -march=native -std=c++17 -fPIC -shared \
    -o lib/libicp_oracle.so src/icp_oracle.cpp
g++ -O3 -march=native -std=c++17 -fPIC -shared \
    -o lib/libscan_loader.so src/scan_loader.cpp
echo "built lib/libicp_oracle.so lib/libscan_loader.so"
