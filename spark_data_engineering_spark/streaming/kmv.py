"""Streaming distinct counting: a per-group KMV(k) sketch maintained
across micro-batches, exactly-once.

KMV merge is lossless truncation: the k smallest distinct hashes of a
union are the k smallest of the per-part k-smallest sets, so folding
each micro-batch's sketch (operators/sketches.py::kmv_group_sketch —
one distributed Arrow prune per batch, <= k x groups rows collected)
into the running state preserves the full-stream sketch EXACTLY — the
accumulated state is bit-identical to one batch pass over everything
seen, which is what lets the end-of-stream query hash-match the batch
oracle. Below k distinct values the sketch is the distinct set itself
(exact count); at saturation the caller recounts exactly and labels
the row, the same proof-or-fallback contract as streaming heavy
hitters.

Delivery semantics: KMV union-truncate is IDEMPOTENT — folding the
same micro-batch twice yields bit-identical state — so this accumulator
deliberately carries NO applied-epoch watermark (unlike the MG/heavy-
hitters accumulator, whose counted fold is not idempotent and needs
one). An epoch high-water mark keyed by app_id would add silent-skip
risk with zero dedup benefit: a rerun against a fresh checkpoint dir
restarts epoch numbering at 0 and a stale watermark would wrongly drop
those batches as "already folded" (ADVICE r6). Crash-redelivered
batches simply fold again, harmlessly. State snapshots stay
single-file atomic; state size: at most k x #groups 48-bit ints as
JSON, kilobytes forever.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame

from spark_data_engineering_spark.operators.sketches import kmv_group_sketch


class StreamingKMV:
    """Accumulate per-group KMV(k) sketches over a stream. Use as
    ``stream.writeStream.foreachBatch(kmv.process_batch)``."""

    def __init__(
        self,
        state_dir: str,
        group_col: str,
        col: str,
        k: int = 1024,
        app_id: str | None = None,
    ) -> None:
        self.state_dir = state_dir
        self.group_col = group_col
        self.col = col
        self.k = k
        self.app_id = app_id or f"kmv:{state_dir}"
        os.makedirs(state_dir, exist_ok=True)
        self.state_path = os.path.join(state_dir, "kmv_state.json")

    # -- state snapshot ------------------------------------------------

    def _load(self) -> dict:
        if not os.path.exists(self.state_path):
            return {"hashes": {}, "k": self.k}
        with open(self.state_path) as f:
            raw = json.load(f)
        if raw.get("k", self.k) != self.k:
            # a truncated state has already discarded hashes beyond the
            # old k; reopening with a larger k would claim a fuller
            # sketch than was kept (and a smaller one a different
            # exactness domain) — same guard as the MG accumulator
            raise ValueError(
                f"KMV state at {self.state_path} was built with k={raw['k']}; "
                f"this accumulator was constructed with k={self.k}. Use the "
                "original k or start a fresh state dir."
            )
        return raw

    def _store(self, state: dict) -> None:
        payload = dict(state)
        payload["k"] = self.k
        tmp = f"{self.state_path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self.state_path)

    # -- streaming hook ------------------------------------------------

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        # No epoch watermark: the KMV fold is idempotent, so redelivered
        # batches merge to identical state, while a watermark could
        # silently SKIP real batches after a rerun resets epoch ids to 0
        # (ADVICE r6). epoch_id stays in the signature for foreachBatch.
        state = self._load()
        rows = kmv_group_sketch(
            batch_df, self.group_col, self.col, self.k
        ).collect()  # bounded: <= k hashes per group
        hashes = state["hashes"]
        incoming: dict[str, set] = {}
        for r in rows:
            incoming.setdefault(r["grp"], set()).add(int(r["hv"]))
        for grp, hs in incoming.items():
            merged = sorted(set(hashes.get(grp, [])) | hs)[: self.k]
            hashes[grp] = merged
        self._store(state)

    def sketches(self) -> dict[str, list[int]]:
        """group -> sorted k-minimum hash values accumulated so far."""
        return {g: list(v) for g, v in self._load()["hashes"].items()}
