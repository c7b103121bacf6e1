#!/bin/sh
# Build the native runtime components into native/lib.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -shared -fPIC -pthread -std=c++17 raybatch.cpp -o lib/libraybatch.so
echo "built lib/libraybatch.so"
