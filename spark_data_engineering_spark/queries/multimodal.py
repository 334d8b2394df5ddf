"""Multimodal queries over deterministic payloads built from documents."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_data_engineering_spark.operators import multimodal as M
from spark_data_engineering_spark.registry import query
from spark_data_engineering_spark.sources import load_table


@query(
    "media_format_profile",
    oracle="""
    SELECT CASE WHEN lang = 'en' THEN 'png'
                WHEN lang = 'de' THEN 'jpeg'
                WHEN lang = 'fr' THEN 'webp'
                ELSE 'bin' END AS format,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(OCTET_LENGTH(ENCODE(text))) AS BIGINT) AS total_bytes,
           CAST(MAX(OCTET_LENGTH(ENCODE(text))) AS BIGINT) AS max_bytes
    FROM documents
    GROUP BY 1
    """,
)
def media_format_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage profile of the media table (binary column + metadata):
    the dataset-card query a media lake needs before partition planning."""
    media = M.attach_payloads(load_table(spark, "documents", sf_dir))
    return media.groupBy("format").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.max("n_bytes").cast("bigint").alias("max_bytes"),
    )


@query(
    "media_decode_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN lang = 'en' THEN 'png'
                WHEN lang = 'de' THEN 'jpeg'
                WHEN lang = 'fr' THEN 'webp'
                ELSE 'bin' END AS format,
           CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
           CAST(64 + OCTET_LENGTH(ENCODE(text)) % 193 AS INT) AS width,
           CAST(64 + COALESCE(LIST_SUM(LIST_TRANSFORM(
                    RANGE(1, LEAST(32, LENGTH(text)) + 1),
                    i -> ASCII(SUBSTR(text, i, 1)))), 0) % 157 AS INT) AS height
    FROM documents
    """,
)
def media_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode. The codec is a STUBBED
    deterministic fake (width = 64 + n_bytes % 193, height = 64 +
    sum(first 32 bytes) % 157), which IS plain byte arithmetic — so the
    oracle replays it in SQL (the corpus is ASCII, so per-char ASCII()
    equals the payload bytes). A real deployment swaps the fake for
    PIL and drops the oracle; the Spark plumbing is unchanged."""
    media = M.attach_payloads(load_table(spark, "documents", sf_dir))
    media = M.repartition_by_bytes(media, "n_bytes", target_bytes=256 * 1024)
    return M.decode_metadata(media)


@query(
    "media_feature_knn",
    # Full SQL replay of the float32 feature pipeline: payload bytes are
    # utf-8 text (attach_payloads), the feature bucket is byte % 16 —
    # exactly each byte's LOW HEX NIBBLE, so hex(encode(text)) with the
    # high nibbles regex-stripped is the bucket sequence. Counts and the
    # L1 normalization are cast through FLOAT to reproduce numpy's
    # float32 arithmetic bit-for-bit (integer counts < 2^24 are exact in
    # float32; FLOAT/FLOAT is the same correctly-rounded IEEE division),
    # then cosine in DOUBLE mirrors the Spark operator's upcast.
    oracle="""
    WITH raw AS (
      SELECT doc_id AS media_id,
             regexp_replace(hex(encode(text)), '.(.)', '\\1', 'g') AS nibs,
             octet_length(encode(text)) AS n
      FROM documents
    ), feat AS (
      SELECT media_id,
             LIST_TRANSFORM(range(0, 16), b -> CASE WHEN n = 0 THEN CAST(0 AS FLOAT)
               ELSE CAST(CAST(length(nibs) - length(replace(nibs,
                          substr('0123456789ABCDEF', CAST(b AS INT) + 1, 1), '')) AS FLOAT)
                    / CAST(n AS FLOAT) AS FLOAT) END) AS feature
      FROM raw
    )
    SELECT q.media_id AS query_id,
           c.media_id AS neighbor_id,
           FLOOR(LIST_COSINE_SIMILARITY(CAST(q.feature AS DOUBLE[]),
                                        CAST(c.feature AS DOUBLE[])) * 10000 + 0.5) / 10000 AS cos_sim,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY q.media_id
               ORDER BY FLOOR(LIST_COSINE_SIMILARITY(CAST(q.feature AS DOUBLE[]),
                                                     CAST(c.feature AS DOUBLE[])) * 10000 + 0.5) / 10000 DESC,
                        c.media_id ASC) AS BIGINT) AS rank
    FROM feat q, feat c
    WHERE q.media_id < 3 AND c.media_id != q.media_id
    QUALIFY rank <= 5
    """,
)
def media_feature_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end media pipeline: payloads -> byte-histogram features
    (mapInPandas) -> cosine top-5 via the similarity operator. The
    float32 feature arithmetic is deterministic (stub decode), so the
    whole pipeline replays exactly in SQL — hash-matched, not rows-only."""
    from spark_data_engineering_spark.operators.similarity import brute_force_knn

    media = M.attach_payloads(load_table(spark, "documents", sf_dir))
    feats = M.extract_features(media)
    queries = feats.filter(F.col("media_id") < 3)
    return brute_force_knn(feats, queries, k=5, id_col="media_id", vec_col="feature")


@query(
    "media_resize_profile",
    oracle="""
    WITH m AS (
      SELECT CASE WHEN lang = 'en' THEN 'png'
                  WHEN lang = 'de' THEN 'jpeg'
                  WHEN lang = 'fr' THEN 'webp'
                  ELSE 'bin' END AS format,
             OCTET_LENGTH(ENCODE(text)) AS n_bytes,
             64 + OCTET_LENGTH(ENCODE(text)) % 193 AS width,
             64 + COALESCE(LIST_SUM(LIST_TRANSFORM(
                      RANGE(1, LEAST(32, LENGTH(text)) + 1),
                      i -> ASCII(SUBSTR(text, i, 1)))), 0) % 157 AS height
      FROM documents
    ), scaled AS (
      SELECT format, n_bytes, width, height,
             LEAST(1.0, 64.0 / GREATEST(width, height)) AS scale
      FROM m
    ), dims AS (
      SELECT format, n_bytes, width, height, scale,
             GREATEST(1, CAST(FLOOR(width * scale) AS INT)) AS nw,
             GREATEST(1, CAST(FLOOR(height * scale) AS INT)) AS nh
      FROM scaled
    ), strided AS (
      SELECT format, n_bytes, nw, nh,
             CASE WHEN scale >= 1.0 THEN n_bytes
                  ELSE CAST(FLOOR((n_bytes
                           + GREATEST(1, CAST(FLOOR((width * height) / (nw * nh) + 0.5) AS INT))
                           - 1)
                         / GREATEST(1, CAST(FLOOR((width * height) / (nw * nh) + 0.5) AS INT)))
                       AS BIGINT) END AS out_bytes
      FROM dims
    )
    SELECT format,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(n_bytes) AS BIGINT) AS bytes_in,
           CAST(SUM(out_bytes) AS BIGINT) AS bytes_out,
           CAST(MAX(GREATEST(nw, nh)) AS INT) AS max_dim
    FROM strided
    GROUP BY 1
    """,
)
def media_resize_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-at-ingest pipeline: decode dims (stub) -> cap longer side
    at 64px -> per-format size audit (how many bytes the resize saved —
    the number that justifies doing it before any shuffle at 100 TB).
    The stub resample keeps every k-th byte with half-up-rounded
    k = area ratio — deterministic arithmetic the oracle replays in SQL
    (out_len = ceil(n_bytes / k)); a real deployment swaps in
    PIL.Image.resize and drops the oracle."""
    media = M.attach_payloads(load_table(spark, "documents", sf_dir))
    media = M.repartition_by_bytes(media, "n_bytes", target_bytes=256 * 1024)
    resized = M.resize_media(media, max_dim=64)
    return (
        resized.withColumn("out_bytes", F.length("payload"))
        .join(media.select("media_id", "format", "n_bytes"), "media_id")
        .groupBy("format")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").cast("bigint").alias("bytes_in"),
            F.sum("out_bytes").cast("bigint").alias("bytes_out"),
            F.max(F.greatest("width", "height")).alias("max_dim"),
        )
    )


@query(
    "media_exact_dedup",
    oracle="""
    SELECT md5(text) AS payload_fp,
           CAST(MIN(doc_id) AS BIGINT) AS keep_media_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(SUM(OCTET_LENGTH(ENCODE(text))) AS BIGINT) AS bytes_reclaimable
    FROM documents
    GROUP BY md5(text)
    """,
)
def media_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup on the BINARY payload: md5 over the blob bytes
    groups identical media, keeping the lowest id as canonical — the
    same one-shuffle fingerprint plan as text dedup_exact, proving the
    dedup path is type-agnostic (the hash runs on the binary column
    itself; the oracle hashes the identical utf-8 bytes as text since
    the synthetic payload IS the encoded text). bytes_reclaimable is
    what a dedup pass saves in object storage."""
    media = M.attach_payloads(load_table(spark, "documents", sf_dir))
    return (
        media.select(F.md5(F.col("payload")).alias("payload_fp"), "media_id", "n_bytes")
        .groupBy("payload_fp")
        .agg(
            F.min("media_id").cast("bigint").alias("keep_media_id"),
            F.count("*").alias("n_copies"),
            F.sum("n_bytes").cast("bigint").alias("bytes_reclaimable"),
        )
    )


@query(
    "media_frame_samples",
    oracle="""
    WITH t AS (
        SELECT doc_id AS media_id,
               OCTET_LENGTH(ENCODE(text)) AS nb
        FROM documents
    )
    SELECT media_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(frame_idx * 64 AS BIGINT) AS byte_offset
    FROM (
        SELECT media_id,
               UNNEST(RANGE(0, LEAST(8, GREATEST(1, nb // 64)))) AS frame_idx
        FROM t
    )
    """,
)
def media_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video-like payloads (operators/multimodal.py::
    sample_frames): one row per sampled frame at a fixed byte stride —
    the explode-shaped Arrow pass a real video pipeline runs with the
    codec swapped for offsets (container has no codecs; the Spark-side
    plumbing — batch shape, schema, per-payload fan-out — is real). The
    oracle replays the stride arithmetic from the payload lengths, so
    the whole mapInPandas fan-out is hash-checked."""
    media = M.attach_payloads(load_table(spark, "documents", sf_dir))
    return M.sample_frames(media, every_n_bytes=64, max_frames=8)


_VAD_FRAME = 16
_VAD_THRESHOLD = 1500


@query(
    "media_audio_segments",
    oracle=f"""
    WITH f AS (
      SELECT doc_id AS media_id, text,
             UNNEST(RANGE(0, CAST(CEIL(LENGTH(text) / {_VAD_FRAME}.0) AS BIGINT)))
                 AS frame_idx
      FROM documents
    ),
    e AS (
      SELECT media_id, frame_idx,
             COALESCE(LIST_SUM(LIST_TRANSFORM(
                 RANGE(1, LEAST(LENGTH(text) - frame_idx * {_VAD_FRAME}, {_VAD_FRAME}) + 1),
                 i -> ASCII(SUBSTR(text, CAST(frame_idx * {_VAD_FRAME} + i AS INT), 1)))), 0)
                 AS energy
      FROM f
    ),
    v AS (SELECT media_id, frame_idx, (energy >= {_VAD_THRESHOLD}) AS voiced FROM e),
    g AS (
      SELECT media_id, frame_idx,
             frame_idx - ROW_NUMBER() OVER (PARTITION BY media_id ORDER BY frame_idx)
                 AS grp
      FROM v WHERE voiced
    ),
    seg AS (SELECT media_id, grp, COUNT(*) AS run FROM g GROUP BY media_id, grp),
    s2 AS (
      SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
             CAST(MAX(run) AS BIGINT) AS longest_run
      FROM seg GROUP BY media_id
    ),
    base AS (
      SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
             CAST(SUM(CASE WHEN voiced THEN 1 ELSE 0 END) AS BIGINT) AS n_voiced
      FROM v GROUP BY media_id
    )
    SELECT base.media_id, n_frames, n_voiced,
           CAST(COALESCE(n_segments, 0) AS BIGINT) AS n_segments,
           CAST(COALESCE(longest_run, 0) AS BIGINT) AS longest_run
    FROM base LEFT JOIN s2 USING (media_id)
    """,
)
def media_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-shaped VAD segmentation (round 6): payloads are framed into
    {F}-byte frames by an Arrow mapInPandas pass
    (operators/multimodal.py::frame_energies — a real VAD swaps byte
    sums for RMS over PCM inside the same batch loop), then voiced
    runs become segments via gaps-and-islands (frame_idx minus
    per-media voiced row_number — pure JVM windows). Per media: frame
    and voiced counts, segment count, longest voiced run — the
    speech-span inventory an audio curation pipeline computes before
    clipping. The stub energy is plain byte arithmetic, so the whole
    pipeline replays in SQL and the gate hashes framing, energy,
    thresholding, and the island construction end-to-end.

    Scale: framing is one linear Arrow pass partitioned by byte budget;
    the windows shuffle once on media_id; per-media frame counts are
    bounded by payload size."""
    from pyspark.sql import Window as W

    media = M.attach_payloads(load_table(spark, "documents", sf_dir))
    media = M.repartition_by_bytes(media, "n_bytes", target_bytes=256 * 1024)
    frames = M.frame_energies(media, _VAD_FRAME).withColumn(
        "voiced", F.col("energy") >= _VAD_THRESHOLD
    )
    g = (
        frames.filter("voiced")
        .withColumn(
            "grp",
            F.col("frame_idx")
            - F.row_number().over(W.partitionBy("media_id").orderBy("frame_idx")),
        )
    )
    seg = g.groupBy("media_id", "grp").agg(F.count(F.lit(1)).alias("run"))
    s2 = seg.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.max("run").cast("bigint").alias("longest_run"),
    )
    base = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.sum(F.when(F.col("voiced"), 1).otherwise(0)).cast("bigint").alias("n_voiced"),
    )
    return base.join(s2, "media_id", "left").select(
        "media_id",
        "n_frames",
        "n_voiced",
        F.coalesce(F.col("n_segments"), F.lit(0)).cast("bigint").alias("n_segments"),
        F.coalesce(F.col("longest_run"), F.lit(0)).cast("bigint").alias("longest_run"),
    )
