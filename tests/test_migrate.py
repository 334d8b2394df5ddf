"""SnapshotStore -> TxnTable migration: latest matches, history maps to
versions, re-running is a no-op."""

import datetime as dt

from spark_data_engineering_spark.sources.migrate import migrate_snapshot_store
from spark_data_engineering_spark.sources.snapshot import SnapshotStore
from spark_data_engineering_spark.sources.txn import TxnTable


def test_migration_preserves_lineage(spark, tmp_path):
    snap = SnapshotStore(str(tmp_path / "snap"))
    snap.write("t", spark.range(3), dt.datetime(2024, 1, 1, 12))
    snap.write("t", spark.range(10, 15), dt.datetime(2024, 1, 2, 12))

    out = migrate_snapshot_store(spark, snap, str(tmp_path / "txn"))
    assert out == {"t": 2}
    table = TxnTable(str(tmp_path / "txn"), "t")
    latest = {r.id for r in table.read(spark).select("id").collect()}
    assert latest == set(range(10, 15))
    # batch 1 is time-travelable at txn version 1
    v1 = {r.id for r in table.read(spark, at_version=1).select("id").collect()}
    assert v1 == {0, 1, 2}
    # idempotent re-run migrates nothing new
    assert migrate_snapshot_store(spark, snap, str(tmp_path / "txn")) == {"t": 2}
    assert table.version() == 2
