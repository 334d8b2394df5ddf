"""The materialization knob (VERDICT r6 task 4): `local` (default,
localCheckpoint), `reliable` (real checkpoint dir — survives executor
loss on a cluster), and `none` (pass-through) must all produce
result-identical frames through the operators that lean on lineage
cuts (MinHash-LSH pairs: self-joined banded frame; connected
components: iterative loop)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_data_engineering_spark import materialize as M


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again!"),
        (3, "a completely different document about spark and parquet files"),
        (4, "a completely different document about spark and parquet files"),
        (5, "nothing like the others at all in any way shape or form here"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _lsh_pairs(docs):
    from spark_data_engineering_spark.operators.dedup import minhash_lsh_dedup

    return sorted(
        map(tuple, minhash_lsh_dedup(docs, "text", "doc_id", threshold=0.7)
        .select("id_a", "id_b").collect())
    )


def test_modes_result_identical(spark, docs, tmp_path):
    base = M.get_mode()
    try:
        M.set_mode("local")
        want = _lsh_pairs(docs)
        assert want  # the near-identical pairs must surface
        M.set_mode("none")
        assert _lsh_pairs(docs) == want
        spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
        M.set_mode("reliable")
        assert _lsh_pairs(docs) == want
    finally:
        M.set_mode(base)


def test_reliable_mode_writes_checkpoint_files(spark, tmp_path):
    base = M.get_mode()
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt2"))
    try:
        M.set_mode("reliable")
        df = M.materialize(spark.range(100).withColumn("v", F.col("id") * 3))
        assert df.count() == 100
        ckpts = list((tmp_path / "ckpt2").rglob("*"))
        assert ckpts, "reliable mode must persist blocks under the checkpoint dir"
    finally:
        M.set_mode(base)


def test_invalid_mode_rejected():
    with pytest.raises(ValueError, match="expected one of"):
        M.set_mode("bogus")
