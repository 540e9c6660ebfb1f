"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
the same sf dir, compare row count, column names, and exact values
(column-name-sorted, row-sorted) — mirroring the driver's
order-insensitive value-hash.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else "")
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].map(lambda v: f"{v:.9g}" if not (v is None or (isinstance(v, float) and math.isnan(v))) else "")
        elif df[c].dtype.kind == "b":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from tripwire_spark.session import get_spark

    spark = get_spark("check_oracles", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failed.append(name)
            continue
        if name not in os_:
            print(f"[rows-only] {name}: {len(sdf)} rows")
            continue
        try:
            ddf = con.execute(os_[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: duckdb error {type(e).__name__}: {str(e)[:200]}")
            failed.append(name)
            continue
        a, b = norm(sdf), norm(ddf)
        if list(a.columns) != list(b.columns):
            print(f"[FAIL] {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failed.append(name)
        elif len(a) != len(b):
            print(f"[FAIL] {name}: rows {len(a)} vs {len(b)}")
            failed.append(name)
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            print(f"[FAIL] {name}: {int(neq.sum())}/{len(a)} differing rows")
            print("  spark:", a[neq].head(3).to_dict("records"))
            print("  duck :", b[neq].head(3).to_dict("records"))
            failed.append(name)
        else:
            print(f"[ OK ] {name}: {len(a)} rows x {len(a.columns)} cols")
    print(f"\n{len(qs) - len(failed)}/{len(qs)} ok")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
