"""Greedy no-split sequence packing: assign each document WHOLE to a
fixed-budget context window, opening a new window when the next document
does not fit (first-fit in arrival order).

Complements ``pack_sequences`` (queries/curation.py), which is the
concat-and-chunk layout where documents straddle window boundaries.
No-split packing is what SFT / instruction-tuning pipelines use when an
example must never be cut — the assignment is inherently sequential
*within a shard* (each decision depends on the running fill), so it
cannot be a window cumsum; Spark's shape for bounded sequential state is
``applyInPandas`` over the shard key:

- the groupBy shuffles only (id, shard, size) — project BEFORE grouping,
  so a task holds ~16 bytes/doc regardless of document size;
- shards are the unit of parallelism exactly like a production packing
  job's output files: at 100 TB you raise the shard count with the
  cluster and nothing else changes;
- inside a task it is one numpy pass, O(shard size), no Python-per-row.

Oracle: the same greedy recurrence is linear, so DuckDB replays it
bit-for-bit with a recursive CTE joining row N to row N-1 (see
queries/curation.py::pack_documents_greedy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def greedy_pack(
    df: DataFrame,
    budget: int,
    shard_col: str = "shard",
    order_col: str = "doc_id",
    size_col: str = "n_tokens",
) -> DataFrame:
    """Per shard, in ``order_col`` order: keep a running fill; a document
    joins the current pack if ``fill + size <= budget``, else opens pack
    ``pack_no + 1``. A document larger than the budget gets a pack of its
    own (and the next document always opens a new pack).

    Returns ONLY ``(order_col, shard_col, size_col, pack_no)`` — payload
    columns are deliberately projected away before the shuffle (the
    whole point of the 16-bytes/doc scale story); join ``pack_no`` back
    to the source on ``(shard_col, order_col)`` when packing payloads."""
    slim = df.select(order_col, shard_col, size_col)

    def assign(pdf):
        import numpy as np

        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        sizes = pdf[size_col].to_numpy()
        packs = np.zeros(len(sizes), dtype="int64")
        fill, pack = 0, 0
        for i, s in enumerate(sizes):
            s = int(s)
            if i > 0 and fill + s > budget:
                pack += 1
                fill = 0
            fill += s
            packs[i] = pack
        pdf["pack_no"] = packs
        return pdf

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in slim.schema.fields
    ) + ", pack_no bigint"
    return slim.groupBy(shard_col).applyInPandas(assign, schema=out_schema)
