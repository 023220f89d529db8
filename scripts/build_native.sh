#!/usr/bin/env bash
# Build the native data-plane (native/dataplane.cpp) into
# native/libdataplane.so. Requires g++ and libjpeg-dev.
set -euo pipefail
cd "$(dirname "$0")/.."
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    native/dataplane.cpp -ljpeg -lpthread \
    -o native/libdataplane.so
echo "built native/libdataplane.so"
