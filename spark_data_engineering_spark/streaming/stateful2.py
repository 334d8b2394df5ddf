"""Arbitrary stateful streaming on the Spark 4 StatefulProcessor API
(``transformWithStateInPandas``) — the successor to
``applyInPandasWithState`` (which streaming/events.py uses for the spend
tracker): typed state handles (ValueState here; List/MapState for bigger
shapes), explicit timers, and the RocksDB state store, which is the
production backend for state larger than executor heap — state spills to
local disk and checkpoints incrementally instead of full HDFS snapshots.

ENVIRONMENT NOTE: this container has no installed ``protobuf``
distribution (the new API's wire format), but ``protobuf_compat.py``
borrows the pure-Python runtime bundled with the host's google-cloud-sdk
(driver ``sys.path`` + a worker ``sitecustomize`` shim), so the
equivalence test runs here; on hosts with neither, it degrades to a
skip and ``streaming/events.py``'s applyInPandasWithState spend tracker
covers arbitrary-state correctness.

Operator: per-user running totals over the event stream — the simplest
correctness-checkable shape (end-of-stream state must equal the batch
groupBy), while exercising the full new-API surface: init handle, state
get/update across micro-batches, per-key emission.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("total_value", DoubleType()),
        StructField("n_events", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("total", DoubleType()), StructField("n", LongType())]
)


class RunningTotalProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("running", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        total, n = (self._state.get() or (0.0, 0))
        for pdf in rows:
            total += float(pdf["value"].sum())
            n += len(pdf)
        self._state.update((total, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "total_value": [total], "n_events": [n]}
        )

    def close(self) -> None:
        pass


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user cumulative (value sum, event count), updated every
    micro-batch. Requires the RocksDB state store provider (set by the
    caller's session conf); output mode Update emits the refreshed keys
    per batch — the LAST emission per key is the end-of-stream state."""
    from spark_data_engineering_spark.streaming.protobuf_compat import (
        ensure_executor_protobuf,
    )

    # runtime-ship the protobuf runtime to workers: covers sessions that
    # were created before ensure_protobuf() exported the PYTHONPATH shim
    ensure_executor_protobuf(events.sparkSession)
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotalProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
