#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare: bit-exact value
equality after sorting columns by name and rows by all columns, PLUS an
arrow-type compare (the round-1 failure mode: DuckDB HUGEINT / DECIMAL
vs Spark BIGINT / DOUBLE hash differently even when values agree).

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)
    if len(df) and len(df.columns):
        # stable sort rows by all columns (stringify for mixed/NaN safety)
        order = df.astype(str).sort_values(by=list(df.columns), kind="stable").index
        df = df.loc[order].reset_index(drop=True)
    return df

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    declared = set()
    for d in sorted(glob.glob(f"{outdir}/*")):
        if os.path.isdir(d):
            declared.add(os.path.basename(d))
    for name in sorted(declared):
        if name not in oracle:
            print(f"[rows-only] {name}: no oracle (weaker check)")
            continue
        try:
            spark_tbl = pq.read_table(f"{outdir}/{name}")
            duck_tbl = con.execute(oracle[name]).arrow()
            spark_df = norm(spark_tbl.to_pandas())
            duck_df = norm(duck_tbl.to_pandas())
        except Exception as e:
            print(f"[FAIL] {name}: load/exec error: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        # Arrow-type compare first (sorted by column name) — a HUGEINT
        # or DECIMAL on one side is a failure even if values match.
        st = {f.name: str(f.type) for f in spark_tbl.schema}
        dt = {f.name: str(f.type) for f in duck_tbl.schema}
        for c in sorted(set(st) & set(dt)):
            a, b = st[c], dt[c]
            # large_string vs string is a representation detail
            norm_t = lambda t: t.replace("large_string", "string")
            if norm_t(a) != norm_t(b):
                ok = False
                msgs.append(f"col {c}: TYPE mismatch spark={a} duck={b}")
        if list(spark_df.columns) != list(duck_df.columns):
            ok = False
            msgs.append(f"columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        elif len(spark_df) != len(duck_df):
            ok = False
            msgs.append(f"rows spark={len(spark_df)} duck={len(duck_df)}")
        else:
            for c in spark_df.columns:
                a, b = spark_df[c], duck_df[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    af, bf = a.astype(float).values, b.astype(float).values
                    exact = np.array_equal(af, bf, equal_nan=True)
                    if not exact:
                        d = np.nanmax(np.abs(af - bf)) if len(af) else 0
                        ok = False
                        msgs.append(f"col {c}: float mismatch maxdiff={d:.3e}")
                else:
                    if not a.astype(str).equals(b.astype(str)):
                        ok = False
                        idx = (a.astype(str) != b.astype(str)).idxmax()
                        msgs.append(f"col {c}: mismatch at row {idx}: spark={a[idx]!r} duck={b[idx]!r}")
        if ok:
            print(f"[ok]   {name}: {len(spark_df)} rows")
            n_pass += 1
        else:
            print(f"[FAIL] {name}: " + "; ".join(msgs))
            n_fail += 1
    missing = set(oracle) - declared
    for name in sorted(missing):
        print(f"[FAIL] {name}: oracle declared but no spark output")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(declared - set(oracle))} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
