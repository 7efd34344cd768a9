"""Local replica of the driver's DuckDB correctness gate.

Runs every key in the relational registry (plus __spark_entry__ extras)
through BOTH Spark and DuckDB at a given sf dir and compares row count,
sorted column names, and order-insensitive values — the same contract
the driver applies at sf0.01 (__spark_entry__.py:3-6).

Usage: PYTHONPATH=. python scripts/check_oracle.py [sf_dir] [key ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, bytes):
        return v
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"parquet_scan('{sf_dir}/{t}.parquet')"
        )

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    oracle = entrymod.oracle_sql()

    n_ok = n_fail = n_rows_only = 0
    for key, fn in queries.items():
        if only and key not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {key}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sql = oracle.get(key)
        if sql is None:
            print(f"ROWS-ONLY {key}: {len(srows)} rows")
            n_rows_only += 1
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {key}: duckdb error {e}")
            n_fail += 1
            continue
        sc, sv = norm_rows(scols, [tuple(r) for r in srows])
        dc, dv = norm_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL {key}: columns {sc} vs {dc}")
            n_fail += 1
        elif len(sv) != len(dv):
            print(f"FAIL {key}: rowcount {len(sv)} vs {len(dv)}")
            n_fail += 1
        elif sv != dv:
            diffs = [(a, b) for a, b in zip(sv, dv) if a != b]
            print(f"FAIL {key}: {len(diffs)} differing rows; first: "
                  f"spark={diffs[0][0]} duck={diffs[0][1]}")
            n_fail += 1
        else:
            print(f"OK {key}: {len(sv)} rows")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
