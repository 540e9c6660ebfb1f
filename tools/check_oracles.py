"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
the same sf dir, compare row count, column names, and exact values
(column-name-sorted, row-sorted) — mirroring the driver's
order-insensitive value-hash.

Usage: python tools/check_oracles.py [sf_dir] [name ...] [--json FILE]

With NO names this runs the FULL query set — the all-rows correctness
artifact the judge asked for (a delta run can hide a regression behind
a stale green row).  ``--json FILE`` additionally writes driver-format
rows ({rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err} per query) so the full-set evidence can be committed.
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
    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        json_path = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod
    from tripwire_spark.session import get_spark

    spark = get_spark("check_oracles", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    report: dict[str, dict] = {}

    def rec(name, **kw):
        row = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        row.update(kw)
        report[name] = row
    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failed.append(name)
            rec(name, err=f"spark:{type(e).__name__}")
            continue
        if name not in os_:
            print(f"[rows-only] {name}: {len(sdf)} rows")
            rec(name, spark_rows=len(sdf), err="no_oracle")
            continue
        try:
            ddf = con.execute(os_[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: duckdb error {type(e).__name__}: {str(e)[:200]}")
            failed.append(name)
            rec(name, spark_rows=len(sdf), err=f"duckdb:{type(e).__name__}")
            continue
        a, b = norm(sdf), norm(ddf)
        rows_match, schema_match = len(a) == len(b), list(a.columns) == list(b.columns)
        hash_match = rows_match and schema_match and a.equals(b)
        rec(name, rows_match=rows_match, schema_match=schema_match,
            hash_match=hash_match, spark_rows=len(a), oracle_rows=len(b))
        if not schema_match:
            print(f"[FAIL] {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failed.append(name)
        elif not rows_match:
            print(f"[FAIL] {name}: rows {len(a)} vs {len(b)}")
            failed.append(name)
        elif not hash_match:
            neq = (a != b).any(axis=1)
            print(f"[FAIL] {name}: {int(neq.sum())}/{len(a)} differing rows")
            print("  spark:", a[neq].head(3).to_dict("records"))
            print("  duck :", b[neq].head(3).to_dict("records"))
            failed.append(name)
        else:
            print(f"[ OK ] {name}: {len(a)} rows x {len(a.columns)} cols")
    print(f"\n{ran - len(failed)}/{ran} ok")
    if json_path:
        import json
        import subprocess
        import time as _time

        # provenance: a refreshed artifact can be byte-identical to the
        # previous round's (all-green both times), which hides WHEN it
        # was generated — stamp the commit + time so "evidence is at
        # HEAD" is checkable from the file itself
        try:
            commit = subprocess.run(
                ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
                cwd="/root/repo", timeout=10,
            ).stdout.strip()
        except Exception:  # noqa: BLE001
            commit = None
        report["_meta"] = {
            "generated_at": _time.strftime("%Y-%m-%dT%H:%M:%SZ", _time.gmtime()),
            "git_head": commit,
            "sf_dir": sf,
            "queries_run": ran,
        }
        with open(json_path, "w") as fh:
            json.dump(report, fh, indent=2)
        print(f"wrote {json_path} ({len(report)} rows)")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
