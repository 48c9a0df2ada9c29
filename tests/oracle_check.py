"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
twin on DuckDB at sf0.01 and compares row count + an order-insensitive
value hash.  Both result sets go through *pandas* — Spark `toPandas()`,
DuckDB `fetchdf()` — exactly like the grading driver, so dtype artifacts
of that path are visible locally:

  * DuckDB sum(BIGINT) -> HUGEINT materializes as float64 in pandas while
    Spark emits int64; a dtype-faithful canon renders 10 vs 10.0 -> DIFF.
    (The pre-round-3 canon collapsed int-valued floats to ints and masked
    exactly this class twice: doc_fingerprint in r1, hypertable_rollup in
    r2.)
  * a nullable int column degrades to float64 on BOTH sides (same pandas
    rule), so nulls stay comparable.

Usage:

    python tests/oracle_check.py [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SF_DIR = "/root/testdata/sf0.01"


def canon(v) -> str:
    """Dtype-faithful canonical string: int 10 -> '10', float 10.0 -> '10.0'."""
    if v is None:
        return "NULL"
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        if math.isnan(f):
            return "NULL"  # pandas NaN == missing value in both engines
        return repr(round(f, 9))
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if v is pd.NaT:
        return "NULL"
    return str(v)


def frame_hash(df: pd.DataFrame) -> tuple[int, str]:
    cols = sorted(df.columns)
    df = df[cols]
    canon_rows = sorted(
        "|".join(canon(v) for v in row) for row in df.itertuples(index=False))
    h = hashlib.sha256("\n".join(canon_rows).encode()).hexdigest()[:16]
    return len(canon_rows), h


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
        sdf_pd = fn(spark, SF_DIR).toPandas()
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(sdf_pd)} rows OK")
            continue
        odf_pd = con.sql(oracles[name]).fetchdf()
        sn, sh = frame_hash(sdf_pd)
        on, oh = frame_hash(odf_pd)
        cols_match = sorted(sdf_pd.columns) == sorted(odf_pd.columns)
        ok = sn == on and sh == oh and cols_match
        print(f"{name:24s} spark={sn:7d} duck={on:7d} "
              f"hash={'MATCH' if sh == oh else 'DIFF '} "
              f"cols={'ok' if cols_match else f'{sorted(sdf_pd.columns)} vs {sorted(odf_pd.columns)}'}")
        if not ok:
            failures.append(name)
            if sn <= 40 and on <= 40:
                print("  spark dtypes:", dict(sdf_pd.dtypes.astype(str)))
                print("  duck  dtypes:", dict(odf_pd.dtypes.astype(str)))
            else:
                s_dt = dict(sdf_pd.dtypes.astype(str))
                o_dt = dict(odf_pd.dtypes.astype(str))
                diff = {c: (s_dt.get(c), o_dt.get(c))
                        for c in sorted(set(s_dt) | set(o_dt))
                        if s_dt.get(c) != o_dt.get(c)}
                if diff:
                    print("  dtype mismatches:", diff)
    if failures:
        print("FAILURES:", failures)
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
