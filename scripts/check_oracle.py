#!/usr/bin/env python3
"""Dev-side replica of the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>
For each query with oracle SQL: run the SQL in DuckDB over the sfDir
parquet tables, load the Spark parquet result, sort columns by name,
sort rows, and compare values (with small float tolerance reporting).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
ok = fail = 0
for q, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {q}: duckdb error: {e}")
        fail += 1
        continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in
                         glob.glob(os.path.join(out, q, "*.parquet"))],
                        ignore_index=True)
    except Exception as e:
        print(f"FAIL {q}: spark result unreadable: {e}")
        fail += 1
        continue
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime"):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            try:
                import decimal
                if df[c].map(lambda x: isinstance(x, decimal.Decimal)).any():
                    df[c] = df[c].astype(float).round(2)
            except Exception:
                pass
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    exp, got = norm(exp), norm(got)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {q}: columns exp={list(exp.columns)} got={list(got.columns)}")
        fail += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {q}: rows exp={len(exp)} got={len(got)}")
        fail += 1
        continue
    try:
        pd.testing.assert_frame_equal(exp, got, check_dtype=False,
                                      check_exact=True)
        print(f"OK   {q} ({len(got)} rows)")
        ok += 1
    except AssertionError as e:
        try:
            pd.testing.assert_frame_equal(exp, got, check_dtype=False,
                                          rtol=1e-9, atol=1e-12)
            print(f"NEAR {q}: equal within 1e-9 but NOT exact — hash would fail")
        except AssertionError:
            print(f"FAIL {q}: {str(e).splitlines()[-1] if str(e) else e}")
        fail += 1
print(f"\n{ok} OK, {fail} FAIL of {len(oracle)} oracled queries")
