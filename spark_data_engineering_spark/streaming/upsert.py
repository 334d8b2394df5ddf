"""Streaming MERGE upsert sink: the Delta `foreachBatch + MERGE`
pattern — maintain a keyed state table from a stream of upserts with
exactly-once epochs.

`stream_to_txn_table` (events.py) is the APPEND-ONLY ingest shape;
this is its keyed sibling: each micro-batch MERGEs into the target
(matched keys update, new keys insert), the `(app_id, epoch_id)`
watermark rides IN the merge commit, and a crash-redelivered epoch is
detected BEFORE any work (``last_epoch`` probe, the same pre-stage
guard ``write_audit_publish`` uses — ``merge`` itself stamps the
watermark but deliberately does not dedupe, so the sink owns the
check). Empty epochs still merge: ``merge(txn=...)`` commits
metadata-only, advancing the watermark — skipping them re-opens the
double-commit window the txn stream sink closed in round 7.

Scale contract: per-epoch cost is the MERGE's — touched-file discovery
is one broadcast semi-join of the batch's keys, the rewrite is bounded
by files containing matches (copy-on-write), and the state table's
size never enters the per-epoch cost. This is how a 100 TB keyed state
table (latest order status, user profile, SCD0 dimension) is
maintained from a CDC stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def stream_upsert_to_txn(
    updates: DataFrame,
    table,
    app_id: str,
    on: list[str],
    latest_by: str | None = None,
    cdf: bool = False,
):
    """Start an availableNow upsert of ``updates`` into ``table``.

    ``latest_by``: optional ordering column for IN-BATCH dedupe — a
    micro-batch carrying several updates for one key keeps only the
    row with the greatest ``latest_by`` value (ties broken arbitrarily
    but deterministically within the batch via a row_number window).
    Required whenever the stream can deliver two updates for one key
    inside one trigger: MERGE refuses duplicate source keys (ANSI —
    one target row must not match two source rows). Across batches the
    usual last-writer-wins of any upsert stream applies.

    Returns the StreamingQuery."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id <= table.last_epoch(app_id):
            return  # crash-redelivered epoch: already merged
        src = batch_df
        if latest_by is not None:
            w = Window.partitionBy(*on).orderBy(
                F.col(latest_by).desc(), *[F.col(c) for c in src.columns]
            )
            src = (
                src.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        # empty batches flow through too: merge(txn=...) lands a
        # metadata-only commit so the epoch watermark always advances
        table.merge(
            batch_df.sparkSession,
            src,
            on=on,
            txn=(app_id, epoch_id),
            cdf=cdf,
            # CDC streams routinely grow columns upstream; this sink
            # opts into evolution by design (Delta users pair the same
            # foreachBatch-merge with schema.autoMerge) — extra batch
            # columns evolve the state table, missing ones keep the
            # target's values on updated rows
            schema_evolution=True,
        )

    return (
        updates.writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
