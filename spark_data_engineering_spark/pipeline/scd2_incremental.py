"""Incrementally-maintained SCD2 dimension over a TxnTable change feed.

``IncrementalAggregate`` (pipeline/incremental.py) covers
self-maintainable aggregates (SUM/COUNT fold under insert/delete); an
SCD2 dimension is NOT self-maintainable — a late-arriving or deleted
order rewrites a customer's whole era history (every cumulative sum and
change point after it moves). The production pattern for that class of
view is PER-KEY PARTIAL RECOMPUTE: the change feed tells you WHICH
customers were touched; rebuild exactly those customers' eras from
their base rows, and leave every other key's rows untouched. SCD2 is
key-local by construction (a customer's eras are a pure function of
that customer's orders — see queries/scd2.py), so the partial rebuild
is exactly equal to a full rebuild, and the refresh cost is
O(touched keys' rows + |dim|), never a full base rescan of untouched
history at the aggregation layer.

Exactly-once: the new dimension commits in ONE atomic overwrite that
stamps the consumed base version as an ``(app, epoch)`` watermark —
identical contract to ``IncrementalAggregate``; a replayed refresh of
the same base version is a no-op. For dimensions too large to rewrite,
the same per-key frame feeds ``TxnTable.merge`` on the customer key
(copy-on-write) — the tradeoff documented in incremental.py applies
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable


class IncrementalSCD2:
    """A persisted SCD2 dimension over a base orders TxnTable,
    refreshed per-key from the change feed.

    ``build`` is the key-local dimension builder
    (``orders DataFrame -> dimension DataFrame``); ``key`` names the
    dimension's key column in BOTH the base table and the built output
    (pass base/dim column names via ``base_key`` when they differ)."""

    def __init__(
        self,
        base: TxnTable,
        dim: TxnTable,
        build,
        key: str,
        base_key: str | None = None,
        app_id: str | None = None,
    ) -> None:
        self.base = base
        self.dim = dim
        self.build = build
        self.key = key
        self.base_key = base_key or key
        self.app_id = app_id or f"scd2:{dim.table_dir}"

    def last_refreshed_version(self) -> int:
        return self.dim.last_epoch(self.app_id)

    def refresh(self, spark: SparkSession) -> int | None:
        """Fold base changes since the last refresh into the dimension.
        Returns the base version now reflected, or None if already
        current."""
        head = self.base.version()
        last = self.last_refreshed_version()
        if head <= last or head == 0:
            return None
        # commit numbering starts at 1; the CDF range is (from, to]
        changes = self.base.read_changes(spark, max(last, 0), head)
        touched_base = changes.select(self.base_key).distinct()
        if touched_base.isEmpty():
            # compact/vacuum-only range: a rewrite would be a logical
            # no-op at O(|dim|) cost. Skip without advancing the
            # watermark — the next refresh re-reads this (cheap, CDF
            # metadata only) empty range plus whatever follows.
            return None
        touched_dim = touched_base.withColumnRenamed(self.base_key, self.key)
        if self.base.live_files():
            touched_rows = self.base.read(spark).join(
                touched_base, self.base_key, "left_semi"
            )
            rebuilt = self.build(touched_rows)
        else:
            rebuilt = None  # full purge: every touched key's history is gone
        if last < 0 or not self.dim.live_files():
            # first refresh, or the dimension was itself emptied earlier
            if rebuilt is None:
                return None  # nothing ever reflected, nothing to write
            new_dim = rebuilt
        else:
            kept = self.dim.read(spark).join(touched_dim, self.key, "left_anti")
            new_dim = kept if rebuilt is None else kept.unionByName(rebuilt)
        self.dim.overwrite(new_dim, txn=(self.app_id, head))
        return head

    def read(self, spark: SparkSession) -> DataFrame:
        return self.dim.read(spark)
