#!/usr/bin/env python3
"""Determinism comparator: two graft.Verify output dirs (e.g. produced
under local[4] and local[8]) compared query-by-query — schema + every
row, exact value equality after sorting rows by all columns. Usage:
tools/detcheck.py <outdirA> <outdirB>"""
import sys, os, glob
import pandas as pd
import numpy as np

a, b = sys.argv[1], sys.argv[2]

def canon(p):
    files = sorted(glob.glob(f"{p}/*.parquet"))
    if not files:
        return pd.DataFrame()
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(np.asarray(v).tolist())
                                if isinstance(v, (list, np.ndarray)) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)

qa = {n for n in os.listdir(a) if os.path.isdir(os.path.join(a, n))}
qb = {n for n in os.listdir(b) if os.path.isdir(os.path.join(b, n))}
bad = []
if qa != qb:
    bad.append(("<dirs>", f"query sets differ: {sorted(qa ^ qb)}"))
for q in sorted(qa & qb):
    da, db = canon(os.path.join(a, q)), canon(os.path.join(b, q))
    try:
        pd.testing.assert_frame_equal(da, db, check_exact=True)
    except AssertionError as e:
        bad.append((q, str(e).split("\n")[0]))
if bad:
    for q, msg in bad:
        print(f"MISMATCH {q}: {msg}")
    sys.exit(1)
print(f"DETERMINISTIC {len(qa & qb)}: all dumps value-identical")
