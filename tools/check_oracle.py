"""Driver-mimicking correctness harness: run every registry query on Spark
and its oracle on DuckDB over the same parquet tables, compare row count,
schema (column names), and an order-insensitive value hash.

Usage: python tools/check_oracle.py [--json OUT] [sf_dir] [query ...]

With --json OUT, every query's result is also written to OUT in the
driver's CORRECTNESS_r{N}.json row format — the committed SWEEP_r{N}.json
artifacts are produced this way, giving full-registry evidence each round
even though the driver's own gate only samples the first 50 queries().
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(6).map(lambda v: f"{v:.6f}" if pd.notna(v) else "NULL")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.map(lambda v: str(bool(v)) if pd.notna(v) else "NULL")
        else:
            df[c] = s.map(lambda v: str(v) if pd.notna(v) else "NULL")
    return df


def value_hash(df: pd.DataFrame) -> str:
    df = canonicalize(df)
    rows = sorted("\x1f".join(r) for r in df.astype(str).itertuples(index=False))
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark import (
        get_spark,
    )
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.plans import (
        ORACLES,
        QUERIES,
    )
    from complex_data_pipeline_with_joins_and_multi_table_operations_spark.sources.io import (
        TPCH_TABLES,
    )

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    unknown = only - set(QUERIES)
    if unknown:
        # a typo (or a misplaced --json flag, which must PRECEDE the
        # positional sf_dir) must not silently match nothing and print
        # a vacuous "0 failures"
        raise SystemExit(f"unknown query name(s): {sorted(unknown)}")

    failures = []
    results: dict[str, dict] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            results[name] = dict(
                rows_match=None, schema_match=None, hash_match=None,
                spark_rows=None, oracle_rows=None, err=f"spark: {str(e)[:200]}",
            )
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            continue
        sql = ORACLES.get(name)
        if sql is None:
            results[name] = dict(
                rows_match=None, schema_match=None, hash_match=None,
                spark_rows=len(sdf), oracle_rows=None, err="no_oracle",
            )
            print(f"rows  {name}: {len(sdf)} rows (rows-only, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            failures.append(name)
            results[name] = dict(
                rows_match=None, schema_match=None, hash_match=None,
                spark_rows=len(sdf), oracle_rows=None, err=f"duckdb: {str(e)[:200]}",
            )
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif value_hash(sdf) != value_hash(odf):
            problems.append("value-hash mismatch")
            a, b = canonicalize(sdf), canonicalize(odf)
            sa = set("\x1f".join(r) for r in a.itertuples(index=False))
            sb = set("\x1f".join(r) for r in b.itertuples(index=False))
            for r in list(sa - sb)[:3]:
                print(f"      spark-only: {r[:220]}")
            for r in list(sb - sa)[:3]:
                print(f"      duck-only:  {r[:220]}")
        results[name] = dict(
            rows_match=len(sdf) == len(odf),
            schema_match=sorted(sdf.columns) == sorted(odf.columns),
            hash_match=not problems,
            spark_rows=len(sdf), oracle_rows=len(odf), err=None,
        )
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"ok    {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {json_out} ({len(results)} rows)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
