#!/usr/bin/env python3
"""Self-check: replicate the driver's DuckDB-oracle comparison.

Reads each <out>/<name> parquet dumped by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same SF dir, sorts
columns by name, and compares row-by-row (exact).

Usage: compare_oracle.py <verify_out_dir> <sf_dir> [query ...]
"""
import json, sys, glob, os
import duckdb, pandas as pd
import numpy as np

outdir, sfdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:]) if len(sys.argv) > 3 else None
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if isinstance(v, (list, tuple, np.ndarray)):
            return str(list(v))
        if pd.isna(v):
            return "NULL"
        if isinstance(v, bool) or isinstance(v, np.bool_):
            return str(bool(v))
        # STRICT (round 2): raw renderings, no numeric normalization — the
        # driver hashes raw value strings, so Decimal('10.000000') must NOT
        # be treated as equal to float64 10.0 here. Queries are expected to
        # emit the same physical type (float64/int64) on both engines.
        s = str(v)
        if s.endswith(" 00:00:00"):  # DATE rendered as midnight Timestamp
            s = s[:-9]
        return s
    return df.map(cell)

fails, passes = [], []
for name in sorted(oracle):
    if only and name not in only:
        continue
    pqdir = f"{outdir}/{name}"
    files = glob.glob(f"{pqdir}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    try:
        sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        ddf = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"exec error: {e}")); continue
    a, b = canon(sdf), canon(ddf)
    if list(a.columns) != list(b.columns):
        fails.append((name, f"cols spark={list(a.columns)} duck={list(b.columns)}")); continue
    if len(a) != len(b):
        fails.append((name, f"rows spark={len(a)} duck={len(b)}")); continue
    neq = (a.values != b.values)
    if neq.any():
        r, c = np.argwhere(neq)[0]
        fails.append((name, f"first diff row {r} col {a.columns[c]}: "
                            f"spark={a.iat[r, c]!r} duck={b.iat[r, c]!r} "
                            f"({int(neq.sum())} cells)"))
    else:
        passes.append(name)
print(f"PASS ({len(passes)}):", " ".join(passes))
print(f"FAIL ({len(fails)}):")
for n, m in fails:
    print(f"  {n}: {m}")
