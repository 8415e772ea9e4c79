#!/bin/bash
# Build the reference metacache_mpi binary with the FIFO MPI stub so it can
# run multi-process on one host without a real MPI installation.
# usage: build_reference.sh [outdir]   (default /tmp/refbuild)
set -e
OUT=${1:-/tmp/refbuild}
REF=${REF_SRC:-/root/reference}
mkdir -p "$OUT"
HERE=$(dirname "$(readlink -f "$0")")
g++ -std=c++14 -O3 -DMC_TARGET_ID_TYPE=uint32_t \
    -I"$HERE/mpi_stub" \
    -I"$REF/third-party/hopscotch-map/include" \
    "$REF"/src/*.cpp -pthread -o "$OUT/metacache_mpi2"
cp "$HERE/run_stub.sh" "$OUT/run_stub.sh"
chmod +x "$OUT/run_stub.sh"
echo "built $OUT/metacache_mpi2"
