#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql vs Verify.scala output.

Mimics the driver's t2 gate: run `graft.Verify <sfdir> <outdir>` first
(via sbt), then this script loads each <outdir>/<name> parquet, runs the
matching oracle SQL in DuckDB over the same testdata tables, and
compares values exactly (cell-by-cell, NaN==NaN, doubles bitwise).

Dev-only tooling: duckdb/pandas/pyarrow are driver-side packages; the
engine itself never imports them.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.loads(Path(f"{outdir}/oracle_sql.json").read_text())
    failures = 0
    for name, sql in sorted(oracle.items()):
        pdir = Path(outdir) / name
        if not pdir.exists():
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = pd.read_parquet(pdir)
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        bad = 0
        for c in got.columns:
            gv, ev = got[c].values, exp[c].values
            for i in range(len(gv)):
                g, e = gv[i], ev[i]
                gn = g is None or (isinstance(g, float) and math.isnan(g))
                en = e is None or (isinstance(e, float) and math.isnan(e))
                if gn and en:
                    continue
                if gn != en or g != e:
                    if bad < 3:
                        print(f"  {name}[{i}].{c}: spark={g!r} duckdb={e!r}")
                    bad += 1
        if bad:
            print(f"FAIL {name}: {bad} mismatched cells / {len(got)*len(got.columns)}")
            failures += 1
        else:
            print(f"OK   {name}: {len(got)} rows x {len(got.columns)} cols exact")
    return failures


if __name__ == "__main__":
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    sys.exit(1 if main(sfdir, outdir) else 0)
