"""Declarative data-quality EXPECTATIONS (Delta Live Tables semantics):
each expectation is a named SQL predicate with a policy —

    warn  — violations are counted, rows flow through
    drop  — violating rows are diverted to a quarantine frame
    fail  — any violation refuses the whole batch

A row PASSES an expectation iff its predicate evaluates TRUE; NULL is a
VIOLATION (DLT's rule — the opposite of SQL CHECK constraints'
NULL-passes, which `sources/txn.py::constraints` implements; both live
here deliberately: constraints are the storage layer's contract,
expectations are the pipeline's).

Scale shape (the reason this is not a row-loop validator):

- ``metrics`` is ONE aggregate job over the batch — every expectation's
  violation count folds into the same map-side-partial aggregation, so
  the cost is one scan of the batch regardless of how many expectations
  are declared (the `checks.py::run_checks` design, applied to
  row-policy instead of batch-policy).
- ``split`` is two map-side filters over the source — no shuffle, no
  driver collect; the quarantine frame carries a
  ``failed_expectations array<string>`` column computed with
  ``filter(array(...))`` inside codegen, so a dead-letter sink
  (`TxnTable.append`, a parquet dir) can record WHY each row was
  diverted. Callers that materialize both halves should persist the
  source (or write through ``foreachBatch``) to avoid a double scan —
  the same contract DLT's own drop path has.
- ``enforce`` = metrics + the fail policy: one job, then an
  ``ExpectationError`` naming every violated fail-expectation with its
  count (nothing about the batch is mutated — refusal is the caller's
  signal to abort its write, mirroring `checks.py`'s gate).

No reference analog (SURVEY.md §2 has no row-policy validation); the
sibling of the reference's batch-level validation gate (V1-V4,
etl/utils/base_table.py checks) re-expressed as row policy.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ACTIONS = ("warn", "drop", "fail")


class ExpectationError(Exception):
    """A fail-policy expectation had violations; the batch was refused."""


@dataclass(frozen=True)
class Expectation:
    name: str
    predicate: str  # SQL boolean over one row; TRUE = pass, NULL = violation
    action: str = "warn"

    def __post_init__(self) -> None:
        if self.action not in _ACTIONS:
            raise ValueError(
                f"expectation {self.name!r}: action must be one of "
                f"{_ACTIONS}, got {self.action!r}"
            )
        import re

        # the name is interpolated into metrics()'s stack() SQL as a
        # quoted literal — restrict it to identifier-ish characters so a
        # quote can neither break the parse nor inject SQL (reserve the
        # __-prefix for the summary row)
        if not re.fullmatch(r"[A-Za-z][A-Za-z0-9_.\-]*", self.name):
            raise ValueError(
                f"expectation name {self.name!r} must match "
                "[A-Za-z][A-Za-z0-9_.-]* (it is embedded in SQL "
                "metric literals)"
            )

    def passes(self) -> Column:
        """TRUE iff the row passes — NULL-as-violation folded in here,
        the single place the DLT null rule is encoded."""
        return F.coalesce(F.expr(self.predicate), F.lit(False))


def _unique(exps: tuple[Expectation, ...]) -> None:
    names = [e.name for e in exps]
    dup = {n for n in names if names.count(n) > 1}
    if dup:
        raise ValueError(f"duplicate expectation names: {sorted(dup)}")


def metrics(df: DataFrame, exps: tuple[Expectation, ...]) -> DataFrame:
    """One aggregate job -> one row per expectation:
    (expectation, action, violations, passed), plus a final
    ``('__kept__', 'summary', dropped, kept)`` row where kept counts
    rows passing every drop/fail expectation (what ``split`` would keep).
    Lazily built: stack() over a single agg, fully inside codegen."""
    _unique(exps)
    gate = [e for e in exps if e.action in ("drop", "fail")]
    keep_all = F.lit(True)
    for e in gate:
        keep_all = keep_all & e.passes()
    agg = df.agg(
        F.count(F.lit(1)).alias("__total"),
        F.sum(F.when(keep_all, 1).otherwise(0)).alias("__kept"),
        *[
            F.sum(F.when(e.passes(), 0).otherwise(1)).alias(f"__v_{i}")
            for i, e in enumerate(exps)
        ],
    )
    parts = []
    for i, e in enumerate(exps):
        parts.append(
            f"'{e.name}', '{e.action}', __v_{i}, __total - __v_{i}"
        )
    parts.append("'__kept__', 'summary', __total - __kept, __kept")
    stacked = ", ".join(parts)
    return agg.select(
        F.expr(
            f"stack({len(exps) + 1}, {stacked}) AS "
            "(expectation, action, violations, passed)"
        )
    ).select(
        "expectation",
        "action",
        F.coalesce(F.col("violations"), F.lit(0)).cast("bigint").alias("violations"),
        F.coalesce(F.col("passed"), F.lit(0)).cast("bigint").alias("passed"),
    )


def split(
    df: DataFrame, exps: tuple[Expectation, ...]
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined): good rows pass EVERY drop/fail expectation
    (warn never filters — DLT); quarantined rows carry
    ``failed_expectations array<string>`` naming each drop/fail
    expectation they violated (sorted, deterministic). Both halves are
    lazy map-side filters of ``df`` — persist the source before
    materializing both at scale."""
    _unique(exps)
    gate = [e for e in exps if e.action in ("drop", "fail")]
    if not gate:
        return df, df.limit(0).withColumn(
            "failed_expectations", F.array().cast("array<string>")
        )
    keep_all = F.lit(True)
    for e in gate:
        keep_all = keep_all & e.passes()
    good = df.filter(keep_all)
    failed = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(e.passes(), F.lit(None)).otherwise(F.lit(e.name))
                    for e in gate
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    bad = df.filter(~keep_all).withColumn("failed_expectations", failed)
    return good, bad


def enforce(df: DataFrame, exps: tuple[Expectation, ...]) -> dict[str, int]:
    """Run ``metrics`` (one job) and apply the fail policy: raises
    ``ExpectationError`` naming every fail-action expectation with
    violations; otherwise returns {expectation: violations} for
    observability (warn counts included). The batch itself is untouched
    — pair with ``split`` (or refuse the write) based on the result."""
    by_name = {e.name: e for e in exps}
    counts = {
        r.expectation: r.violations
        for r in metrics(df, exps).collect()
        if r.expectation != "__kept__"
    }
    fatal = {
        n: c
        for n, c in counts.items()
        if c > 0 and by_name[n].action == "fail"
    }
    if fatal:
        raise ExpectationError(
            f"fail-policy expectation(s) violated: "
            f"{ {n: f'{c} rows fail {by_name[n].predicate!r}' for n, c in fatal.items()} }"
        )
    return counts


def stream_with_expectations(
    stream: DataFrame,
    exps: tuple[Expectation, ...],
    main,
    quarantine,
    app_id: str,
):
    """The DLT composition: a stream flows through the expectation
    policy per micro-batch — rows passing every drop/fail expectation
    append to ``main``, diverted rows land in ``quarantine`` with their
    ``failed_expectations`` reasons serialized to JSON (a plain string
    column any reader groups on). Both tables advance their own
    ``(app_id, epoch)`` watermark via ``append_idempotent``, so a
    crash-redelivered epoch re-commits NEITHER half — and a crash
    BETWEEN the two appends replays into one skip + one commit, never
    a duplicate (each table's watermark is independent).

    Per-epoch cost: one persist of the micro-batch + two map-side
    filters of it — policy evaluation rides the batch, table sizes
    never enter. Returns the StreamingQuery (availableNow)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        done_main = epoch_id <= main.last_epoch(app_id)
        done_dead = epoch_id <= quarantine.last_epoch(app_id)
        if done_main and done_dead:
            return  # fully committed in a previous run
        batch_df.persist()
        try:
            good, bad = split(batch_df, exps)
            if not done_main:
                main.append_idempotent(good, app_id, epoch_id)
            if not done_dead:
                quarantine.append_idempotent(
                    bad.withColumn(
                        "failed_expectations",
                        F.to_json("failed_expectations"),
                    ),
                    app_id,
                    epoch_id,
                )
        finally:
            batch_df.unpersist()

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
