"""Local twin of the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() twin at sf0.01,
compare row count + schema (column names) + order-insensitive values.

Usage: python tools/oracle_check.py [--only name1,name2] [--sf DIR]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402
from wos_crawler_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare: everything to string cells
    out = df.copy()
    for c in out.columns:
        col = out[c]
        if col.dtype == object:
            out[c] = col.map(repr)
        else:
            out[c] = col.map(lambda v: repr(v))
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only  {name}: {len(spdf)} rows  ({dt:.1f}s)")
            if len(spdf) == 0:
                print(f"  WARN {name}: 0 rows")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(spdf) != len(odf):
            problems.append(f"rowcount spark={len(spdf)} duck={len(odf)}")
        if sorted(spdf.columns) != sorted(odf.columns):
            problems.append(
                f"columns spark={sorted(spdf.columns)} duck={sorted(odf.columns)}"
            )
        if not problems:
            a, b = canon_frame(spdf), canon_frame(odf)
            if not a.equals(b):
                neq = (a != b).any(axis=1)
                idx = list(a.index[neq])[:3]
                detail = [
                    f"row{j}: spark={a.loc[j].to_dict()} duck={b.loc[j].to_dict()}"
                    for j in idx
                ]
                problems.append("values differ: " + " | ".join(detail))
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"ok    {name}: {len(spdf)} rows  ({dt:.1f}s)")

    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
