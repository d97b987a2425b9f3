#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
from outDir/oracle_sql.json in DuckDB over the sfDir parquet tables and
compare to the Spark parquet dumps (exact, column-name-sorted).

Usage: compare.py <sfDir> <outDir> [query ...]
"""
import json, sys, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT"); fail += 1; continue
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fail += 1; continue
    sdf = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    # driver sorts columns by name before hashing
    odf = odf[sorted(odf.columns)]
    sdf = sdf[sorted(sdf.columns)]
    if list(odf.columns) != list(sdf.columns):
        print(f"{name}: SCHEMA MISMATCH spark={list(sdf.columns)} oracle={list(odf.columns)}"); fail += 1; continue
    if len(odf) != len(sdf):
        print(f"{name}: ROWS MISMATCH spark={len(sdf)} oracle={len(odf)}"); fail += 1; continue
    odf = odf.reset_index(drop=True); sdf = sdf.reset_index(drop=True)
    neq = []
    import numpy as np
    for c in odf.columns:
        a, b = odf[c], sdf[c]
        is_arr = any(isinstance(x, (list, tuple, np.ndarray))
                     for x in list(a.head(5)) + list(b.head(5)))
        if is_arr:
            # list/array cells: pandas == raises; compare stringified
            ok = [str(x) for x in a] == [str(x) for x in b]
        else:
            # scalar columns must compare exactly — any error here is a
            # real mismatch (e.g. incompatible dtypes), not a fallback case
            eq = (a == b) | (a.isna() & b.isna())
            ok = bool(eq.all())
        if not ok:
            neq.append(c)
    if neq:
        print(f"{name}: VALUE MISMATCH in cols {neq}")
        c = neq[0]
        bad = (~((odf[c] == sdf[c]) | (odf[c].isna() & sdf[c].isna()))).idxmax()
        print(f"  first diff row {bad}: oracle={odf.iloc[bad].to_dict()} spark={sdf.iloc[bad].to_dict()}")
        fail += 1
    else:
        print(f"{name}: OK ({len(sdf)} rows)")
sys.exit(1 if fail else 0)
