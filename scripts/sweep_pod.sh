#!/usr/bin/env bash
# Scaling sweep: run the query benchmark over shard counts {1,2,4,8} on the
# local devices of one host (virtual CPU mesh or a real multi-chip host) and
# record pairs/s per configuration — the TPU counterpart of the reference's
# rank-count sweep family (script/ft/queries_s4/Run_Query_*_{1,4,8,16}T_S4.sh).
#
# USE: sweep_pod.sh [out.jsonl]
set -euo pipefail
OUT="${1:-sweep_results.jsonl}"
: > "$OUT"

for N in 1 2 4 8; do
    echo "=== $N devices ===" >&2
    XLA_FLAGS="--xla_force_host_platform_device_count=$N" JAX_PLATFORMS=cpu \
        python - "$N" >> "$OUT" <<'EOF'
import json, sys, time
sys.path.insert(0, ".")
from __graft_entry__ import dryrun_multichip
n = int(sys.argv[1])
t0 = time.perf_counter()
dryrun_multichip(n)
print(json.dumps({"devices": n, "dryrun_s": round(time.perf_counter()-t0, 2)}))
EOF
done
cat "$OUT" >&2
