#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs oracleSql, mimicking the
driver's DuckDB compare: load each query's parquet dump, run the oracle SQL
in DuckDB over the same sf dir, sort columns by name, compare row-by-row.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # row order: already ORDER BY'd by both sides, but sort again like the
    # driver may: stable sort on all columns stringified
    return df.reset_index(drop=True)


def cmp_frames(name, spark_df, oracle_df):
    issues = []
    s, o = canon(spark_df), canon(oracle_df)
    if list(s.columns) != list(o.columns):
        return [f"SCHEMA: spark={list(s.columns)} oracle={list(o.columns)}"]
    if len(s) != len(o):
        issues.append(f"ROWS: spark={len(s)} oracle={len(o)}")
        return issues
    for c in s.columns:
        sv, ov = s[c], o[c]
        try:
            # float-vs-integer dtype cross = a type-contract breach even
            # when the values coerce equal: the driver's canonical hash
            # stringifies ("7.0" vs "7"). DuckDB SUM(int) is HUGEINT,
            # which pandas maps to float64 -- cast such sums to BIGINT
            # in the oracle SQL (the r15 subquery_incr_rate gate failure).
            if {sv.dtype.kind, ov.dtype.kind} == {"f", "i"}:
                issues.append(
                    f"COL {c}: dtype contract breach: spark={sv.dtype} "
                    f"oracle={ov.dtype} (HUGEINT output? cast to BIGINT)")
            if sv.dtype.kind == "f" or ov.dtype.kind == "f":
                sv = sv.astype(float)
                ov = ov.astype(float)
                neq = ~((sv == ov) | (sv.isna() & ov.isna()))
                if neq.any():
                    i = neq.idxmax()
                    diff = abs(sv[i] - ov[i])
                    issues.append(
                        f"COL {c}: {int(neq.sum())} mismatches, first at row {i}: "
                        f"spark={sv[i]!r} oracle={ov[i]!r} absdiff={diff:.3e}")
            else:
                sv2 = sv.astype(str)
                ov2 = ov.astype(str)
                neq = sv2 != ov2
                if neq.any():
                    i = neq.idxmax()
                    issues.append(
                        f"COL {c}: {int(neq.sum())} mismatches, first at row {i}: "
                        f"spark={sv[i]!r} oracle={ov[i]!r}")
        except Exception as e:
            issues.append(f"COL {c}: compare error {e}")
    return issues


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_bad += 1
            continue
        try:
            oracle_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        issues = cmp_frames(name, spark_df, oracle_df)
        if issues:
            n_bad += 1
            print(f"FAIL {name} ({len(spark_df)} spark rows, {len(oracle_df)} oracle rows)")
            for i in issues[:6]:
                print(f"   {i}")
        else:
            n_ok += 1
            print(f"OK   {name} ({len(spark_df)} rows)")
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
