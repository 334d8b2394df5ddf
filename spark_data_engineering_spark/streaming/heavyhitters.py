"""Streaming heavy hitters: a Misra-Gries summary maintained across
micro-batches, exactly-once.

The mergeable-summaries result (Agarwal et al. 2012) is what makes this
sound: folding each micro-batch's MG(k) summary into the running state
preserves the n/(k+1) presence/undercount bound over the TOTAL stream
length n — the guarantee for the accumulated state is as strong as one
batch pass over everything seen so far. Per batch the work is one
distributed Arrow sketch pass (operators/sketches.py); the state itself
is at most k counters plus the stream length, kilobytes forever,
persisted as an atomically-renamed JSON snapshot.

Exactly-once: ``foreachBatch`` may re-deliver an epoch after a crash;
the state records the (query-id, epoch) high-water mark and re-applies
nothing at or below it — same contract as pipeline/incremental.py. The
snapshot write is single-file atomic (tmp + rename), so a crash between
sketching and committing leaves the previous state intact and the
re-delivered epoch folds cleanly.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame

from spark_data_engineering_spark.operators.sketches import (
    MGSummary,
    _mg_fold,
    misra_gries_summary,
)


class StreamingHeavyHitters:
    """Accumulate a Misra-Gries(k) summary over a stream of values in
    ``col``, one micro-batch at a time. Use as
    ``stream.writeStream.foreachBatch(hh.process_batch)``."""

    def __init__(
        self, state_dir: str, col: str, k: int = 200, app_id: str | None = None
    ) -> None:
        self.state_dir = state_dir
        self.col = col
        self.k = k
        # one logical stream per state dir by default — the epoch
        # watermark is scoped to this id, like incremental.py's app_id
        self.app_id = app_id or f"mg:{state_dir}"
        os.makedirs(state_dir, exist_ok=True)
        self.state_path = os.path.join(state_dir, "mg_state.json")

    # -- state snapshot ------------------------------------------------
    # counters persist as [item, cnt] pairs, not a JSON object: object
    # keys are always strings, which would corrupt a NULL item into the
    # string "null" on round-trip
    def _load(self) -> dict:
        if not os.path.exists(self.state_path):
            return {"counters": {}, "n": 0, "applied": {}, "k": self.k}
        with open(self.state_path) as f:
            raw = json.load(f)
        if raw.get("k", self.k) != self.k:
            # the accumulated error bound is n/(state_k+1); reopening
            # with a different k would let threshold() understate it and
            # make the downstream exactness proof unsound
            raise ValueError(
                f"MG state at {self.state_path} was built with k={raw['k']}; "
                f"this accumulator was constructed with k={self.k}. Use the "
                "original k or start a fresh state dir."
            )
        raw["counters"] = {
            (None if item is None else item): cnt for item, cnt in raw["counters"]
        }
        return raw

    def _store(self, state: dict) -> None:
        payload = dict(state)
        payload["k"] = self.k
        payload["counters"] = [[i, c] for i, c in state["counters"].items()]
        tmp = f"{self.state_path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self.state_path)

    # -- streaming hook ------------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        app = self.app_id
        state = self._load()
        if epoch_id <= state["applied"].get(app, -1):
            return  # crash-redelivered epoch: already folded
        mg = misra_gries_summary(batch_df, self.col, self.k)
        counters = state["counters"]
        _mg_fold(
            counters, list(mg.counters), list(mg.counters.values()), self.k
        )
        state["n"] += mg.n
        state["applied"][app] = epoch_id
        self._store(state)

    def summary(self) -> MGSummary:
        state = self._load()
        return MGSummary(counters=dict(state["counters"]), n=state["n"], _k=self.k)
