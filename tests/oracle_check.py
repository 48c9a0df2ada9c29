"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
twin on DuckDB at sf0.01, compares row count + order-insensitive value hash
(columns sorted by name, rows sorted, values canonicalized). Usage:

    python tests/oracle_check.py [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SF_DIR = "/root/testdata/sf0.01"


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, (int,)):
        return str(v)
    return str(v)


def table_hash(rows: list[tuple], colnames: list[str]) -> tuple[int, str]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon_rows = sorted(
        "|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(canon_rows).encode()).hexdigest()[:16]
    return len(rows), h


def main() -> int:
    import __spark_entry__ as e
    from saber_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("oracle_check", cpus=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, SF_DIR)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(srows)} rows "
                  f"({'OK' if len(srows) >= 0 else '??'})")
            continue
        rel = con.sql(oracles[name])
        orows = [tuple(r) for r in rel.fetchall()]
        ocols = rel.columns
        sn, sh = table_hash(srows, scols)
        on, oh = table_hash(orows, ocols)
        cols_match = sorted(scols) == sorted(ocols)
        ok = sn == on and sh == oh and cols_match
        print(f"{name:24s} spark={sn:7d} duck={on:7d} "
              f"hash={'MATCH' if sh == oh else 'DIFF '} "
              f"cols={'ok' if cols_match else f'{sorted(scols)} vs {sorted(ocols)}'}")
        if not ok:
            failures.append(name)
            if len(srows) <= 20 and len(orows) <= 20:
                print("  spark:", sorted(srows)[:10])
                print("  duck :", sorted(orows)[:10])
    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
