"""Local replica of the driver's correctness gate: run every queries()
entry at a given sf and compare against its oracle_sql() in DuckDB —
row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]

    def cell(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "<null>"
        if isinstance(v, float):
            return f"{v:.10g}"
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return repr(v)

    rows = [tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from parquet2csv_spark.session import get_spark

    spark = get_spark(cpus=8, app="check-oracles")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ok~  {name:38s} rows={len(got):6d} (rows-only) {el:5.1f}s")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        if sorted(got.columns) != sorted(want.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {sorted(got.columns)} != {sorted(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append(name)
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            continue
        a, b = norm(got), norm(want)
        if a != b:
            failures.append(name)
            bad = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
            print(f"FAIL {name}: values differ; first diffs:")
            for i in bad:
                print(f"   spark: {a[i]}")
                print(f"   duck : {b[i]}")
            continue
        print(f"OK   {name:38s} rows={len(got):6d} {el:5.1f}s")
    print("\n" + ("ALL OK" if not failures else f"FAILURES: {failures}"))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
