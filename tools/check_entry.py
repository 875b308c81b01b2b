"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and the matching
oracle_sql() on DuckDB over the same parquet tables, compares row count,
schema width, and an order-insensitive multiset of stringified rows.

Usage: python tools/check_entry.py [sf_dir] [only_query_prefix]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from bzzz_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}".rstrip("0").rstrip(".")
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark("check-entry", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    n_ran = 0
    for name, fn in qs.items():
        if only and not name.startswith(only):
            continue
        n_ran += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"WARN {name}: no oracle (rows-only) — {len(srows)} rows "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            failed.append(name)
            continue
        s, o = rowset(scols, srows), rowset(ocols, orows)
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(ocols)}")
            failed.append(name)
        elif s != o:
            diff_s = [r for r in s if r not in o][:3]
            diff_o = [r for r in o if r not in s][:3]
            print(
                f"FAIL {name}: rows spark={len(s)} duck={len(o)}\n"
                f"  spark-only: {diff_s}\n  duck-only:  {diff_o}"
            )
            failed.append(name)
        else:
            print(f"OK   {name}: {len(s)} rows [{time.time()-t0:.1f}s]")
    skipped = len(qs) - n_ran
    print(
        f"\n{n_ran - len(failed)}/{n_ran} passed"
        + (f" ({skipped} skipped by filter {only!r})" if skipped else "")
    )
    if failed:
        print("failed:", failed)
        sys.exit(1)


if __name__ == "__main__":
    main()
