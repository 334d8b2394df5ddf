"""Snapshot storage: batch-versioned parquet tables.

Reference semantics (etl/utils/base_table.py:198-220 + bronze/orders.py
121-182): every write is a full snapshot partitioned by the batch
timestamp ``etl_inserted``; a read discovers the latest batch and filters
to it, projecting explicit columns.

Differences by design:
- The reference discovers the latest partition with a full-scan
  ``selectExpr("max(etl_inserted)").collect()`` per read (SURVEY.md §2.1
  A4/S3). Here the partition value is discovered from the filesystem
  listing — O(#partitions), no data scan — and the filter on the
  partition column prunes to one directory.
- Delta isn't in this environment; plain parquet + partition dirs carry
  the same snapshot semantics (mergeSchema on read covers evolution).
  The write path is format-pluggable for a Delta/Iceberg deployment.

At 100 TB: one snapshot dir per batch means readers never see partial
writes (writes go to a new partition value); old snapshots are dropped by
deleting directories. Partition pruning guarantees a read touches only
the latest batch's files.
"""

from __future__ import annotations

import datetime as _dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "etl_inserted"


def _fmt_ts(ts: _dt.datetime) -> str:
    # filesystem-safe (no spaces/colons — those get URL-encoded in
    # partition dir names); lexicographic order == chronological order
    return ts.strftime("%Y%m%dT%H%M%S.%f")


class SnapshotStore:
    def __init__(self, root: str) -> None:
        self.root = root

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write(
        self,
        name: str,
        df: DataFrame,
        batch_ts: _dt.datetime,
        partition_keys: tuple[str, ...] = (),
    ) -> None:
        """Write a full snapshot stamped with the run's single batch
        timestamp (reference stamps per-node ``datetime.now()`` — quirk
        Q5; one injected timestamp makes runs deterministic)."""
        stamped = df.withColumn(PARTITION_COL, F.lit(_fmt_ts(batch_ts)))
        keys = [PARTITION_COL, *[k for k in partition_keys if k != PARTITION_COL]]
        (
            stamped.write.mode("append")
            .partitionBy(*keys)
            .parquet(self.path(name))
        )

    def latest_batch(self, name: str) -> str | None:
        """Latest batch id from the directory listing — no data scan."""
        base = self.path(name)
        if not os.path.isdir(base):
            return None
        parts = [
            d.split("=", 1)[1]
            for d in os.listdir(base)
            if d.startswith(f"{PARTITION_COL}=")
        ]
        if not parts:
            return None
        # lexicographic max == chronological max for the fixed format
        return max(parts)

    def read_latest(
        self, spark: SparkSession, name: str, columns: list[str] | None = None
    ) -> DataFrame:
        latest = self.latest_batch(name)
        if latest is None:
            raise FileNotFoundError(f"no snapshots for table {name!r} under {self.root}")
        df = (
            spark.read.option("mergeSchema", "true")
            .parquet(self.path(name))
            .filter(F.col(PARTITION_COL) == latest)  # partition-pruned
        )
        return df.select(*columns) if columns else df

    def read_batch(self, spark: SparkSession, name: str, batch: str) -> DataFrame:
        """Time travel to a specific snapshot (reference: explicit
        partition_values dict, bronze/orders.py:143-146)."""
        return (
            spark.read.option("mergeSchema", "true")
            .parquet(self.path(name))
            .filter(F.col(PARTITION_COL) == batch)
        )

    def batches(self, name: str) -> list[str]:
        base = self.path(name)
        if not os.path.isdir(base):
            return []
        return sorted(
            d.split("=", 1)[1] for d in os.listdir(base) if d.startswith(f"{PARTITION_COL}=")
        )
