"""Backend migration: SnapshotStore → TxnTable, lineage preserved.

A user running the partition-dir snapshot layout (the reference's
storage model) switches to the transaction-log format without losing
history: every snapshot batch replays, oldest first, as one atomic
``overwrite`` commit, so txn version k corresponds to snapshot batch k
and time travel keeps working across the cut-over. Readers of the old
store are never disturbed — the migration only reads it.

Scale: one scan + one write per batch, each a plain Spark job; batches
migrate independently, so a 100 TB store migrates table-by-table,
batch-by-batch, restartable (re-running skips tables whose txn version
already matches the batch count)."""

from __future__ import annotations

from pyspark.sql import SparkSession

from spark_data_engineering_spark.sources.snapshot import SnapshotStore
from spark_data_engineering_spark.sources.txn import TxnTable


def migrate_snapshot_store(
    spark: SparkSession,
    snap: SnapshotStore,
    txn_root: str,
    tables: list[str] | None = None,
) -> dict[str, int]:
    """Replay every batch of every table (or ``tables``) into TxnTables
    under ``txn_root``. Returns table -> final txn version. Idempotent:
    a table already at version == #batches is skipped."""
    import os

    names = tables if tables is not None else sorted(
        d for d in os.listdir(snap.root) if os.path.isdir(os.path.join(snap.root, d))
    )
    out: dict[str, int] = {}
    for name in names:
        batches = snap.batches(name)
        table = TxnTable(txn_root, name)
        if table.version() >= len(batches):
            out[name] = table.version()
            continue
        for batch in batches[table.version():]:
            table.overwrite(snap.read_batch(spark, name, batch))
        out[name] = table.version()
    return out
