#!/usr/bin/env python3
"""Time every DuckDB oracle SQL over the same parquet tables the engine
benches against — the only constructible single-node baseline (the
reference publishes no numbers; see BASELINE.md).

Usage: python3 tools/bench_oracle.py <sfDir> <verifyOutDir> [reps] [pair_id]

When pair_id is given it is stamped into BASELINE_DUCKDB.json; the README
generator only computes the Spark-vs-DuckDB ratio from a BENCH_PAIRED.json
carrying the SAME id (the matched-window protocol — see
tools/make_bench_pair.sh).

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), registers
the testdata tables as DuckDB views over <sfDir>, runs each oracle `reps`
times (default 3), and writes BASELINE_DUCKDB.json with single-shot and
min-of-reps seconds per query. Compare totals against BENCH_FULL.json:
same queries, same data, same host.
"""
import json, sys, time
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    pair_id = sys.argv[4] if len(sys.argv) > 4 else None
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    singles, mins, errs = {}, {}, {}
    for name in sorted(oracles):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            try:
                con.execute(oracles[name]).fetchall()
            except Exception as e:  # record, keep going
                errs[name] = str(e).splitlines()[0][:200]
                break
            times.append(time.perf_counter() - t0)
        # a query that errored on ANY rep is excluded from the timing
        # fields entirely — a partial min-of-fewer-reps would silently
        # skew the ratio the README generator derives from these totals
        if len(times) == reps:
            singles[name] = times[0]
            mins[name] = min(times)
    out = {
        "sf": sf_dir, "reps": reps, "n_queries": len(singles),
        "total_single": sum(singles.values()), "total_min": sum(mins.values()),
        "queries": singles, "min": mins, "errors": errs,
    }
    if pair_id:
        out["pair_id"] = pair_id
    with open("BASELINE_DUCKDB.json", "w") as f:
        json.dump(out, f)
    print(f"{len(singles)} queries: total single {out['total_single']:.1f} s, "
          f"min-of-{reps} {out['total_min']:.1f} s, {len(errs)} errors")

if __name__ == "__main__":
    main()
