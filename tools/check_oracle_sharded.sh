#!/bin/bash
# Parallel DuckDB replay of a graft.Verify dump: shards oracle_sql.json
# across N check_oracle.py processes (symlinked outputs, filtered oracle
# per shard). The heavyweight recursive replays (d11/d13/c9) land in
# separate shards so one long tail never serializes the rest.
# Usage: tools/check_oracle_sharded.sh <verify_out_dir> <sf_dir> [nshards]
# Dev tooling only — not part of the shipped library.
set -e
OUT="$1"; SF="$2"; N="${3:-8}"
WORK=$(mktemp -d /tmp/oracle_shards.XXXX)
python3 - "$OUT" "$WORK" "$N" <<'EOF'
import json, os, sys
out, work, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
oracle = json.load(open(f"{out}/oracle_sql.json"))
names = sorted(oracle)
# pin the known-heavy replays to their own shards first
heavy = [q for q in ("d11_cluster_representatives", "d13_containment_dedup",
                     "c9_dedup_weighted_sample", "d6_neardup_clusters",
                     "e2e_dedup_pipeline", "c1_curation_decision",
                     "c1b_curation_dupinject", "e2e_curation_pipeline")
         if q in oracle]
rest = [q for q in names if q not in heavy]
shards = [[] for _ in range(n)]
for i, q in enumerate(heavy):
    shards[i % n].append(q)
for i, q in enumerate(rest):
    shards[(len(heavy) + i) % n].append(q)
for i, qs in enumerate(shards):
    d = f"{work}/shard{i}"
    os.makedirs(d)
    json.dump({q: oracle[q] for q in qs}, open(f"{d}/oracle_sql.json", "w"))
    for q in qs:
        os.symlink(os.path.abspath(f"{out}/{q}"), f"{d}/{q}")
print(f"sharded {len(names)} queries into {n} shards at {work}")
EOF
pids=()
for i in $(seq 0 $((N-1))); do
  python3 tools/check_oracle.py "$WORK/shard$i" "$SF" \
    > "$WORK/shard$i.log" 2>&1 &
  pids+=($!)
done
fail=0
for p in "${pids[@]}"; do wait "$p" || fail=1; done
cat "$WORK"/shard*.log | grep -E "^(PASS|FAIL)" | sort > "$WORK/all.log"
echo "== $(grep -c '^PASS' "$WORK/all.log" || true) pass, $(grep -c '^FAIL' "$WORK/all.log" || true) fail =="
grep "^FAIL" "$WORK/all.log" || true
echo "logs: $WORK"
exit $fail
