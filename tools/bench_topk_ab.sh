#!/usr/bin/env bash
# A/B the TopKPerKey heap lowering against Spark's own Window plan on the
# SAME declarative queries: run the bench twice — once default (the
# WindowTopKRewrite lowers row_number()<=k to the heap operator) and once
# with the rule excluded (the plain Window sort machinery runs) — and
# record the min-of-REPS floors in BENCH_TOPK_AB.json. Three arms since
# round 12: the codegen'd heap (default — the partial pass fuses into the
# scan pipeline as a blocking build), the iterator heap
# (spark.graft.topk.codegen=false, the round-11 shape whose win was priced
# NET of its whole-stage-codegen break), and the excluded-rule Window plan.
#
# Usage: tools/bench_topk_ab.sh [sfDir] [reps]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.1}"
REPS="${2:-3}"
# only the DECLARATIVE spellings are a fair A/B (rel_topk_native constructs
# the heap node explicitly and would ignore the exclusion)
QS="win_topk_auto,win_topk_multikey,win_topk_nulls,w_latest_reading"

# A BENCH_ONLY run writes BENCH_PARTIAL.json (since round 13 it never
# clobbers the committed BENCH_FULL.json), so read THAT — reading
# BENCH_FULL.json here would silently return the stale committed floors
# for every arm and the A/B would compare the same numbers to themselves.
# The stale-artifact guard below makes that failure mode loud instead.
run_once() { # $1 = extra conf ("" for default)
  rm -f BENCH_PARTIAL.json
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  SPARK_GRAFT_BENCH_REPS="$REPS" SPARK_GRAFT_BENCH_ONLY="$QS" \
  SPARK_GRAFT_EXTRA_CONF="$1" \
    sbt -batch "runMain graft.Bench" >/dev/null 2>&1
  python3 - "$QS" <<'PYEOF'
import json, sys
d = json.load(open("BENCH_PARTIAL.json"))
want = set(sys.argv[1].split(","))
got = set(d["queries"])
assert got == want, f"BENCH_PARTIAL.json queries {sorted(got)} != requested {sorted(want)}"
print(json.dumps(d["queries"]))
PYEOF
}

HEAP=$(run_once "")
HEAP_ITER=$(run_once "spark.graft.topk.codegen=false")
WINDOW=$(run_once "spark.sql.optimizer.excludedRules=graft.WindowTopKRewrite")

python3 - "$HEAP" "$HEAP_ITER" "$WINDOW" "$REPS" "$SF" <<'PY'
import json, sys
heap = json.loads(sys.argv[1])
heap_iter = json.loads(sys.argv[2])
window = json.loads(sys.argv[3])
out = {"heap_min": heap, "heap_iter_min": heap_iter, "window_min": window,
       "reps": int(sys.argv[4]), "sf": sys.argv[5]}
with open("BENCH_TOPK_AB.json", "w") as f:
    json.dump(out, f, indent=1)
for q in sorted(heap):
    print(f"{q:<22} heap_cg={heap[q]:.3f}s heap_iter={heap_iter.get(q, float('nan')):.3f}s "
          f"window={window.get(q, float('nan')):.3f}s")
PY

echo "wrote BENCH_TOPK_AB.json"
