#!/bin/sh
# Build the native preprocessing library (no deps beyond libstdc++).
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libpreprocess.so preprocess.cc
echo "built $(pwd)/libpreprocess.so"
