#!/usr/bin/env python3
"""Compare two graft.Verify dumps (same queries, different parallelism):
any value difference is a partitioning-dependent result — the merge-order
float hazard class."""
import sys, glob, os
import pandas as pd
import numpy as np

a_dir, b_dir = sys.argv[1], sys.argv[2]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

names = sorted(os.path.basename(p) for p in glob.glob(f"{a_dir}/*") if os.path.isdir(p))
bad, missing = [], []
for n in names:
    if not os.path.isdir(f"{b_dir}/{n}"):
        missing.append(n); continue
    try:
        a = norm(pd.read_parquet(f"{a_dir}/{n}"))
        b = norm(pd.read_parquet(f"{b_dir}/{n}"))
    except Exception as e:
        bad.append((n, f"read error: {e}")); continue
    if list(a.columns) != list(b.columns):
        bad.append((n, "column mismatch")); continue
    if len(a) != len(b):
        bad.append((n, f"row count {len(a)} vs {len(b)}")); continue
    for c in a.columns:
        x, y = a[c], b[c]
        if x.dtype.kind == "f" or y.dtype.kind == "f":
            ok = np.allclose(x.astype(float).fillna(-1e308),
                             y.astype(float).fillna(-1e308), rtol=0, atol=0)
        else:
            ok = (x.astype(str) == y.astype(str)).all()
        if not ok:
            i = (x.astype(str) != y.astype(str)).idxmax()
            bad.append((n, f"col {c} row {i}: {x.iloc[i]!r} vs {y.iloc[i]!r}"))
            break
for n, why in bad:
    print(f"DIVERGENT {n}: {why}")
for n in missing:
    print(f"MISSING {n}")
print(f"{len(names)-len(bad)-len(missing)} invariant, {len(bad)} divergent, {len(missing)} missing of {len(names)}")
