#!/usr/bin/env bash
# Produce the MATCHED-WINDOW Spark-vs-DuckDB bench pair: BENCH_PAIRED.json
# (graft.Bench floors, min-of-3) and BASELINE_DUCKDB.json (the same oracle
# SQLs in DuckDB, min-of-3), run back-to-back in ONE window and stamped
# with one shared pair_id. tools/update_readme_counts.sh refuses to publish
# a Spark-vs-DuckDB ratio whose two sides carry different pair_ids — so the
# end-of-round snapshot clobbering BENCH_FULL.json (a different, usually
# noisier window) can no longer silently change the published ratio.
#
# Usage: tools/make_bench_pair.sh [sfDir] [reps] [round-label]
# Commit BENCH_PAIRED.json + BASELINE_DUCKDB.json + README.md TOGETHER.
# If the window turns out noisy (pass_totals not converged), discard with
# `git checkout BENCH_PAIRED.json BASELINE_DUCKDB.json BENCH_FULL.json
# README.md` and retry — keep the calmest matched window, never mix two.
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.1}"
REPS="${2:-3}"
PAIR_ID="pair-$(date -u +%Y%m%dT%H%M%SZ)-$$"

# Calm-window guard: floors bounce 2-5x on loaded hosts (BASELINE.md).
# Refuse to stamp a pair from a visibly loaded window; override with
# GRAFT_PAIR_FORCE=1 if you know better.
LOAD=$(awk '{print $1}' /proc/loadavg)
if [ "${GRAFT_PAIR_FORCE:-0}" != 1 ] && awk -v l="$LOAD" 'BEGIN{exit !(l > 4.0)}'; then
  echo "host 1-min load is $LOAD (> 4.0) — not a calm window; set GRAFT_PAIR_FORCE=1 to override" >&2
  exit 2
fi
echo "pair_id=$PAIR_ID sf=$SF reps=$REPS load=$LOAD"

# 1. dump oracle_sql.json without re-running the registry (a targeted
#    Verify on one cheap query still writes the full SQL dump)
ORACLE_DIR=$(mktemp -d /tmp/graft_pair_oracle.XXXXXX)
sbt -batch "runMain graft.Verify $SF $ORACLE_DIR w_count_raw" >/dev/null

# 2. Spark floors (interleaved min-of-$REPS) — writes BENCH_FULL.json and,
#    because SPARK_GRAFT_PAIR_ID is set, BENCH_PAIRED.json with the stamp
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS="$REPS" \
  SPARK_GRAFT_PAIR_ID="$PAIR_ID" sbt -batch "runMain graft.Bench"

# 2b. n_failed gate (ADVICE r14): Bench records NaN for failed executions
#     and keeps going, so a query that failed some or all passes still
#     yields a stamped BENCH_PAIRED.json — with the common query set (or
#     the samples behind a floor) silently thinned. The protocol gate is
#     "n_failed must be 0"; enforce it here by refusing to proceed when
#     the artifact carries any failure field.
python3 - <<'PYEOF'
import json, sys
bp = json.load(open("BENCH_PAIRED.json"))
bad = bp.get("failed_pass_counts") or bp.get("failed_all_passes")
if bad:
    print(f"[pair] ABORT: bench run has failures ({bad}); a pair must be "
          f"n_failed=0 — fix the queries (or the window) and rerun",
          file=sys.stderr)
    sys.exit(3)
PYEOF

# 3. DuckDB baseline in the SAME window, same stamp
python3 tools/bench_oracle.py "$SF" "$ORACLE_DIR" "$REPS" "$PAIR_ID"

# 4. regenerate the README status block from the new pair (fails loudly on
#    any pair mismatch), then self-check
tools/update_readme_counts.sh "${3:-current}"
tools/update_readme_counts.sh --check

python3 - <<'PYEOF'
import json
bp = json.load(open("BENCH_PAIRED.json"))
dd = json.load(open("BASELINE_DUCKDB.json"))
common = sorted(set(bp["queries"]) & set(dd["min"]))
ss = sum(bp["queries"][q] for q in common)
ds = sum(dd["min"][q] for q in common)
print(f"pair {bp['pair_id']}: Spark {ss:.1f} s vs DuckDB {ds:.1f} s on "
      f"{len(common)} queries -> {ss/ds:.2f}x; pass_totals={bp.get('pass_totals')}")
PYEOF
echo "now: git add BENCH_PAIRED.json BASELINE_DUCKDB.json BENCH_FULL.json README.md && git commit (one commit = one window; BENCH_FULL.json is included because the README bench narrative derives from it)"
