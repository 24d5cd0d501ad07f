"""Driver-mimic correctness check: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` mirror on DuckDB at sf0.01, compare
row count + column names + order-insensitive values.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        return f"{v:.12g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def row_key(row, cols_sorted, colidx):
    return tuple(norm(row[colidx[c]]) for c in cols_sorted)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from hepcrawl_spark.session import get_spark

    spark = get_spark("correctness-check")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok-   {name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        try:
            ores = con.sql(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns {sorted(scols)} != {sorted(ocols)}")
            failures.append(name)
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name}: rows {len(srows)} != {len(orows)}")
            failures.append(name)
            continue
        cols_sorted = sorted(scols)
        sidx = {c: scols.index(c) for c in cols_sorted}
        oidx = {c: ocols.index(c) for c in cols_sorted}
        sset = sorted(row_key(r, cols_sorted, sidx) for r in srows)
        oset = sorted(row_key(r, cols_sorted, oidx) for r in orows)
        if sset != oset:
            ndiff = sum(1 for a, b in zip(sset, oset) if a != b)
            print(f"FAIL  {name}: values differ ({ndiff}/{len(sset)} rows)")
            for a, b in list(zip(sset, oset))[:200]:
                if a != b:
                    print(f"      spark={a}\n      duck ={b}")
                    break
            failures.append(name)
            continue
        print(f"OK    {name}: {len(srows)} rows match")

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("\nall queries match")


if __name__ == "__main__":
    main()
