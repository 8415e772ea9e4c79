#!/bin/bash
# Run metacache_mpi under the FIFO MPI stub with N processes.
# usage: run_stub.sh N binary args...
N=$1; shift
BIN=$1; shift
DIR=$(mktemp -d /tmp/mpistub.XXXXXX)
pids=()
for ((r=0; r<N; r++)); do
    MC_STUB_RANK=$r MC_STUB_SIZE=$N MC_STUB_DIR=$DIR "$BIN" "$@" > "$DIR/out_$r.txt" 2>"$DIR/err_$r.txt" &
    pids+=($!)
done
rc=0
for p in "${pids[@]}"; do wait $p || rc=$?; done
cat "$DIR/out_0.txt"
cat "$DIR/err_0.txt" >&2
echo "STUB_DIR=$DIR" >&2
exit $rc
