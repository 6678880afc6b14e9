#!/bin/sh
# Build the native host library. Output lands next to this script so the ctypes
# loader (makeupdiffuse_tpu/utils/native.py) finds it.
set -e
cd "$(dirname "$0")"
${CXX:-g++} -O3 -fPIC -shared -std=c++17 -o libmdt_host.so mdt_host.cc
echo "built $(pwd)/libmdt_host.so"
