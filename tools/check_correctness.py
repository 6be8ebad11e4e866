#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same testdata
parquet tables, and compares: row count, column names, and values (sorted by
all columns, column order normalized by name — the driver hashes after
sorting columns by name).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def compare(name, mine: pd.DataFrame, oracle: pd.DataFrame):
    if sorted(mine.columns) != sorted(oracle.columns):
        return f"FAIL cols: mine={sorted(mine.columns)} oracle={sorted(oracle.columns)}"
    if len(mine) != len(oracle):
        return f"FAIL rows: mine={len(mine)} oracle={len(oracle)}"
    a, b = norm(mine), norm(oracle)
    notes = []
    for c in a.columns:
        x, y = a[c], b[c]
        # The driver hashes raw values, so int64 0 vs float64 0.0 is a hash
        # FAIL even though allclose passes. DuckDB sum(BIGINT) -> HUGEINT ->
        # pandas float64 is the classic cause (round-4 graph_pagerank /
        # qa_column_profile regression): fail loudly on int-vs-float here.
        if (x.dtype.kind in "iu" and y.dtype.kind == "f") or (x.dtype.kind == "f" and y.dtype.kind in "iu"):
            return (f"FAIL col {c}: int-vs-float dtype mismatch ({x.dtype} vs {y.dtype}) — "
                    f"driver hash WILL fail; align dtypes: CAST whichever side "
                    f"widened (usually the DuckDB sum) to BIGINT, or emit a "
                    f"double on the engine side")
        # Same-kind width mismatches (int32 vs int64, float32 vs float64)
        # have never produced a driver hash failure (python ints/floats of
        # equal value hash identically regardless of storage width), but
        # surface them so a future width-sensitive driver change is
        # diagnosable from this log rather than invisible.
        if x.dtype.kind in "iuf" and y.dtype.kind in "iuf" and x.dtype != y.dtype:
            notes.append(f"{c}:{x.dtype}/{y.dtype}")
        if x.dtype.kind == "f" or y.dtype.kind == "f":
            ok = np.allclose(x.astype(float).fillna(-1e308), y.astype(float).fillna(-1e308),
                             rtol=0, atol=1e-9)
        else:
            xs = x.astype(str)
            ys = y.astype(str)
            ok = (xs == ys).all()
        if not ok:
            bad = (x.astype(str) != y.astype(str))
            i = bad[bad].index[0] if bad.any() else 0
            return f"FAIL col {c}: row {i} mine={x.iloc[i]!r} oracle={y.iloc[i]!r} (dtypes {x.dtype}/{y.dtype})"
    if notes:
        compare.last_notes = "; width differs " + ", ".join(notes)
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # no-oracle queries self-describe the ScalaTest suite that bounds them
    # (bounded_by.json, written by graft.Verify); absent for old dumps
    bb_path = os.path.join(out_dir, "bounded_by.json")
    bounded = json.load(open(bb_path)) if os.path.exists(bb_path) else {}
    results = {}
    names = sorted([os.path.basename(p) for p in glob.glob(os.path.join(out_dir, "*")) if os.path.isdir(p)])
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            results[name] = "FAIL: no output parquet"
            continue
        mine = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracles:
            suite = bounded.get(name)
            if suite:
                results[name] = f"SKIP (no oracle; bounded_by={suite}; rows={len(mine)})"
            else:
                # a no-oracle query with no declared bounding suite is
                # UNVERIFIED — that is a failure of the registry contract
                results[name] = "FAIL: no oracle AND no bounded_by suite declared"
            continue
        try:
            oracle = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"FAIL oracle error: {e}"
            continue
        compare.last_notes = ""
        err = compare(name, mine, oracle)
        results[name] = err or f"OK ({len(mine)} rows{compare.last_notes})"
    width = max(len(n) for n in results)
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    n_skip = sum(1 for v in results.values() if v.startswith("SKIP"))
    for n, v in sorted(results.items()):
        print(f"{n:<{width}}  {v}")
    print(f"\n{n_ok} OK, {n_skip} SKIP, {len(results) - n_ok - n_skip} FAIL of {len(results)}")
    sys.exit(0 if n_ok + n_skip == len(results) else 1)

if __name__ == "__main__":
    main()
