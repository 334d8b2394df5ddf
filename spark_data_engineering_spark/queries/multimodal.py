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


@query("media_decode_metadata")
def media_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode (stubbed codec — deterministic
    fake dims; rows-only check since the fake has no SQL equivalent)."""
    media = M.attach_payloads(load_table(spark, "documents", sf_dir))
    media = M.repartition_by_bytes(media, "n_bytes", target_bytes=256 * 1024)
    return M.decode_metadata(media)


@query("media_feature_knn")
def media_feature_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end media pipeline: payloads -> byte-histogram features
    (mapInPandas) -> cosine top-5 via the similarity operator (rows-only:
    float32 pipeline, approximate by construction)."""
    from spark_data_engineering_spark.operators.similarity import brute_force_knn

    media = M.attach_payloads(load_table(spark, "documents", sf_dir))
    feats = M.extract_features(media)
    queries = feats.filter(F.col("media_id") < 3)
    return brute_force_knn(feats, queries, k=5, id_col="media_id", vec_col="feature")


@query("media_resize_profile")
def media_resize_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-at-ingest pipeline: decode dims (stub) -> cap longer side
    at 64px -> per-format size audit (how many bytes the resize saved —
    the number that justifies doing it before any shuffle at 100 TB).
    Rows-only: the stub resample has no SQL equivalent."""
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
