#!/usr/bin/env bash
# A/B BandJoinRewrite against the plan Spark would otherwise run on the
# SAME declarative band-join queries: run the bench twice — once default
# (the rewrite derives the bucket + neighbor-bucket equi join) and once
# with the rule excluded (BroadcastNestedLoopJoin, Spark's only native
# strategy for a bare band condition) — and record both min-of-REPS
# floors in BENCH_BAND_AB.json. This prices the rewrite honestly: the
# explode fan-out (3–5 candidate buckets per probe row) and the extra
# shuffle are real costs, so the win must be measured against the
# O(|L|·|R|) plan it replaces, not assumed from the complexity argument.
#
# Usage: tools/bench_band_ab.sh [sfDir] [reps]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.1}"
REPS="${2:-3}"
# only the NAIVE spellings are a fair A/B (j_band_bucketed buckets by
# hand and would ignore the exclusion)
QS="j_band_auto,j_band_double,j_band_decimal,j_band_date,j_band_timestamp"

# A BENCH_ONLY run writes BENCH_PARTIAL.json (since round 13 it never
# clobbers the committed BENCH_FULL.json), so read THAT — reading
# BENCH_FULL.json here would silently return the stale committed floors
# for every arm and the A/B would compare the same numbers to themselves.
# The stale-artifact guard below makes that failure mode loud instead —
# same contract as bench_topk_ab.sh.
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

REWRITE=$(run_once "")
NESTED=$(run_once "spark.sql.optimizer.excludedRules=graft.BandJoinRewrite")

python3 - "$REWRITE" "$NESTED" "$REPS" "$SF" <<'PY'
import json, sys
rewrite = json.loads(sys.argv[1])
nested = json.loads(sys.argv[2])
out = {"rewrite_min": rewrite, "nested_loop_min": nested,
       "reps": int(sys.argv[3]), "sf": sys.argv[4]}
with open("BENCH_BAND_AB.json", "w") as f:
    json.dump(out, f, indent=1)
for q in sorted(rewrite):
    n = nested.get(q, float("nan"))
    print(f"{q:<20} rewrite={rewrite[q]:.3f}s nested_loop={n:.3f}s "
          f"({n / rewrite[q]:.1f}x)")
PY

echo "wrote BENCH_BAND_AB.json"
