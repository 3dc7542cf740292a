#!/bin/bash
# Interleaved A/B bench of two compiled class trees over a query subset:
#   tools/ab_bench.sh <queries,csv> [rounds]
# Runs B A B A ... in adjacent machine windows (halves drift vs separate
# runs) and prints per-variant per-query minima.
set -e
QUERIES="$1"; ROUNDS="${2:-2}"
CP_REST=$(cat /tmp/graft_cp.txt | cut -d: -f2-)
ADDOPENS=$(cat /tmp/graft_addopens.txt)
for i in $(seq 1 "$ROUNDS"); do
  for v in before after; do
    SPARK_GRAFT_BENCH_FILTER="$QUERIES" \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_OUT=/tmp/ab_${v}_$i.json \
    java $ADDOPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      -Xmx8g -cp "/tmp/classes_$v:$CP_REST" graft.Bench >/dev/null 2>&1
  done
done
python3 - "$ROUNDS" <<'EOF'
import json, sys
rounds = int(sys.argv[1])
def mins(var):
    qs = {}
    for i in range(1, rounds + 1):
        d = json.load(open(f'/tmp/ab_{var}_{i}.json'))['queries']
        for k, v in d.items():
            qs[k] = min(qs.get(k, 1e9), v)
    return qs
b, a = mins('before'), mins('after')
tb = ta = 0
for k in sorted(b, key=lambda k: -b[k]):
    print(f'{b[k]:7.2f} -> {a[k]:7.2f}  ({a[k]/b[k]:.2f}x)  {k}')
    tb += b[k]; ta += a[k]
print(f'{tb:7.2f} -> {ta:7.2f}  ({ta/tb:.2f}x)  TOTAL')
EOF
