"""Local replica of the driver's correctness gate: run every
queries() entry and its DuckDB oracle_sql() twin side-by-side,
compare row count + column names + order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from sparksimjoin.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(cores=8, shuffle_partitions=8, driver_memory="8g")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = sdf.collect()
            spark_cols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spark_rows)} rows)")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = [c.lower() for c in rel.columns]
            duck_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures += 1
            continue
        sc = [c.lower() for c in spark_cols]
        if sorted(sc) != sorted(duck_cols):
            print(f"FAIL {name}: columns spark={sc} duck={duck_cols}")
            failures += 1
            continue
        # order-insensitive compare on column-name-sorted tuples
        s_idx = [sc.index(c) for c in sorted(sc)]
        d_idx = [duck_cols.index(c) for c in sorted(duck_cols)]
        s_set = sorted(tuple(norm(r[i]) for i in s_idx) for r in spark_rows)
        d_set = sorted(tuple(norm(r[i]) for i in d_idx) for r in duck_rows)
        if len(s_set) != len(d_set):
            print(f"FAIL {name}: rows spark={len(s_set)} duck={len(d_set)}")
            sd = set(s_set) - set(d_set)
            ds = set(d_set) - set(s_set)
            print(f"     spark-only sample: {list(sd)[:3]}")
            print(f"     duck-only sample:  {list(ds)[:3]}")
            failures += 1
        elif s_set != d_set:
            diff = [i for i, (a, b) in enumerate(zip(s_set, d_set)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at {diff}")
            for i in diff:
                print(f"     spark={s_set[i]} duck={d_set[i]}")
            failures += 1
        else:
            print(f"ok   {name}: {len(s_set)} rows match")
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
