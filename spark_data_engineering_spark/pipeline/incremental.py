"""Incrementally-maintained aggregates over a TxnTable change feed.

The reference recomputes every gold table from a full silver scan each
run (etl/utils/base_table.py full-reload ``write``; run_etl.py re-runs
the whole graph). At 100 TB that full rescan is the dominant cost, and
the standard fix is incremental view maintenance: consume only the rows
that CHANGED since the last refresh and fold their per-group deltas into
a persisted aggregate state (Delta CDF + MERGE pattern; classically
"maintenance of materialized views" — Gupta & Mumick, IEEE DE Bull. 1995).

``IncrementalAggregate`` maintains ``state = SELECT group_exprs,
SUM(measures), COUNT(*) FROM base GROUP BY group_exprs`` where ``base``
is a :class:`~spark_data_engineering_spark.sources.txn.TxnTable`:

  - ``refresh`` reads ``base.read_changes`` over ``(last_seen, head]``
    only — inserts contribute ``+x``, deletes ``-x`` (a MERGE update is
    a delete+insert pair, so updates need no special case). The base
    table is never rescanned; the refresh cost is O(changed files),
    which copy-on-write already bounds to the files containing touched
    keys.
  - the new state is committed in ONE atomic overwrite that also stamps
    the consumed base version as an ``(app, epoch)`` watermark — the
    exactly-once primitive streaming appends use (txn.py
    ``append_idempotent``). A replayed/raced refresh of the same base
    version is a no-op, and the decision travels IN the commit, so
    "state updated" and "version consumed" cannot diverge on a crash.
  - measures should be summed in DECIMAL: decimal addition is exact and
    associative, so ``initial + delta₁ + delta₂`` is bit-identical to a
    full recompute (double sums would drift with accumulation order).

SUM/COUNT are self-maintainable under insert *and* delete; AVG derives
as sum/count at read time. MIN/MAX are not (a deleted minimum forces a
group rescan) and are intentionally out of scope — the classic
restriction from the view-maintenance literature.

Scale: the delta aggregation is one partial-agg shuffle over the changed
rows. The state rewrite is O(|state|) = O(#groups) — tiny next to the
base for reporting-shaped group-bys; for state tables too large to
rewrite, the same delta frame feeds ``TxnTable.merge`` (copy-on-write on
group keys) instead of ``overwrite``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_data_engineering_spark.sources.txn import TxnTable

_COUNT_COL = "n_rows"


class IncrementalAggregate:
    """A persisted ``GROUP BY`` view over ``base``, refreshed from its
    change feed.

    ``group_by`` and ``sums`` map output alias -> SQL expression over the
    base table's columns (strings, evaluated with ``F.expr``). The state
    schema is ``[*group_by, *sums, n_rows]``; groups whose live row count
    reaches zero are dropped from the state.
    """

    def __init__(
        self,
        base: TxnTable,
        state: TxnTable,
        group_by: dict[str, str],
        sums: dict[str, str],
        app_id: str | None = None,
        transform=None,
    ) -> None:
        """``transform`` (optional ``DataFrame -> DataFrame``) runs on the
        change feed BEFORE delta folding — for row-local enrichment:
        filters, derives, joins against STATIC dimensions (the medallion
        silver/gold derivations). It must be delta-preserving: one input
        row maps to ≤1 output row independent of other rows, and the
        ``_change_type`` / ``_commit_version`` columns must survive. A
        changing dimension would invalidate folded history — that case
        needs the dim itself to be a txn table with its own change feed
        (out of scope; the reference's dims are full-reload snapshots).
        """
        overlap = set(group_by) & set(sums) | {_COUNT_COL} & (set(group_by) | set(sums))
        if overlap:
            raise ValueError(f"alias collision: {sorted(overlap)}")
        self.base = base
        self.state = state
        self.group_by = dict(group_by)
        self.sums = dict(sums)
        self.app_id = app_id or f"incr:{state.table_dir}"
        self.transform = transform

    def last_refreshed_version(self) -> int:
        """Base version the state currently reflects (-1 = never)."""
        return self.state.last_epoch(self.app_id)

    def _delta(self, changes: DataFrame) -> DataFrame:
        """Per-group signed deltas from a CDF frame: +measure for an
        insert, -measure for a delete; same for the row count."""
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
        keys = [F.expr(e).alias(a) for a, e in self.group_by.items()]
        aggs = [F.sum(F.expr(e) * sign).alias(a) for a, e in self.sums.items()]
        aggs.append(F.sum(sign).cast("long").alias(_COUNT_COL))
        return changes.groupBy(*keys).agg(*aggs)

    def refresh(self, spark: SparkSession, strategy: str = "overwrite") -> int | None:
        """Fold all base changes since the last refresh into the state.
        Returns the new state version, or None if already current (also
        the replay/race outcome — the watermark check under the commit's
        optimistic retry makes a duplicate refresh commit impossible to
        win twice for the same base version).

        ``strategy="overwrite"`` rewrites the whole state (fine while
        state ≈ #groups is report-sized). ``strategy="merge"`` is the
        giant-state path: only the TOUCHED groups' new rows are computed
        and MERGEd copy-on-write — files containing no touched group
        survive byte-identical, so refresh cost is O(changed groups),
        not O(state). Emptied groups ride as n_rows=0 delete markers
        through the conditional-delete clause. Merge joins on the group
        columns, so this strategy requires NON-NULL group keys (the
        overwrite path has no such restriction — its groupBy is
        null-safe)."""
        if strategy not in ("overwrite", "merge"):
            raise ValueError(f"strategy={strategy!r}")
        head = self.base.version()
        last = self.last_refreshed_version()
        if head <= last or head == 0:
            return None
        changes = self.base.read_changes(spark, from_version=max(last, 0), to_version=head)
        if self.transform is not None:
            changes = self.transform(changes)
        delta = self._delta(changes)
        cols = [*self.group_by, *self.sums, _COUNT_COL]
        keys = list(self.group_by)
        if last < 0:
            return self.state.overwrite(
                delta.filter(F.col(_COUNT_COL) > 0), txn=(self.app_id, head)
            )
        # a legitimately-empty state (every group emptied earlier) reads
        # as an empty frame, not an error
        old = (
            self.state.read(spark).select(*cols)
            if self.state.live_files()
            else delta.select(*cols).limit(0)
        )
        if strategy == "overwrite":
            merged = (
                old
                .unionByName(delta.select(*cols))
                .groupBy(*keys)
                .agg(
                    *[F.sum(a).alias(a) for a in self.sums],
                    F.sum(_COUNT_COL).cast("long").alias(_COUNT_COL),
                )
            )
            return self.state.overwrite(
                merged.filter(F.col(_COUNT_COL) > 0), txn=(self.app_id, head)
            )
        # merge: new full rows for touched groups only
        touched = delta.select(*keys).distinct()
        old_touched = old.join(touched, keys, "left_semi")
        merged = (
            old_touched.unionByName(delta.select(*cols))
            .groupBy(*keys)
            .agg(
                *[F.sum(a).alias(a) for a in self.sums],
                F.sum(_COUNT_COL).cast("long").alias(_COUNT_COL),
            )
        )
        return self.state.merge(
            spark,
            merged,
            on=keys,
            when_matched="update",
            when_not_matched="insert",
            matched_delete_condition=F.col(_COUNT_COL) <= 0,
            txn=(self.app_id, head),
        )

    def read(self, spark: SparkSession) -> DataFrame:
        return self.state.read(spark)

    def recompute(self, spark: SparkSession) -> DataFrame:
        """The state a from-scratch backfill would produce at the base
        version last folded: the full base snapshot (time-traveled to the
        watermark, so concurrent base commits don't skew the audit) run
        through the same transform/group/sum definitions."""
        last = self.last_refreshed_version()
        if last < 0:
            raise ValueError("view has never been refreshed")
        full = self.base.read(spark, at_version=last)
        if self.transform is not None:
            # transforms see CDF-shaped frames; a backfill is all-inserts
            full = self.transform(
                full.withColumn("_change_type", F.lit("insert")).withColumn(
                    "_commit_version", F.lit(last)
                )
            )
        keys = [F.expr(e).alias(a) for a, e in self.group_by.items()]
        return full.groupBy(*keys).agg(
            *[F.sum(F.expr(e)).alias(a) for a, e in self.sums.items()],
            F.count("*").alias(_COUNT_COL),
        )

    def audit(self, spark: SparkSession) -> bool:
        """Production backfill check: does the folded state equal a full
        recompute? Decimal sums make the comparison exact, so any drift
        (a non-delta-preserving transform, a manual state edit) surfaces
        as a hard mismatch, not a tolerance judgement. Cost is one full
        base scan — run it on the cadence you'd run a backfill."""
        cols = sorted([*self.group_by, *self.sums, _COUNT_COL])
        state = self.read(spark).select(*cols)
        full = self.recompute(spark).select(*cols)
        return (
            state.exceptAll(full).limit(1).count() == 0
            and full.exceptAll(state).limit(1).count() == 0
        )
