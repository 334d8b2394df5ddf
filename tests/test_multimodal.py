"""Multimodal plumbing tests: binary columns, Arrow batch shapes,
byte-budget partitioning, stubbed decode contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_data_engineering_spark.operators import multimodal as M
from spark_data_engineering_spark.sources import load_table


def _media(spark, sf_dir):
    return M.attach_payloads(load_table(spark, "documents", sf_dir))


def test_payload_is_binary_with_metadata(spark, sf_dir):
    media = _media(spark, sf_dir)
    dtypes = dict(media.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["n_bytes"] in ("int", "bigint")
    row = media.first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert len(row.payload) == row.n_bytes


def test_decode_metadata_schema_and_determinism(spark, sf_dir):
    out = M.decode_metadata(_media(spark, sf_dir))
    assert [f.name for f in out.schema.fields] == [
        "media_id",
        "format",
        "n_bytes",
        "width",
        "height",
    ]
    a = {r.media_id: (r.width, r.height) for r in out.collect()}
    b = {r.media_id: (r.width, r.height) for r in M.decode_metadata(_media(spark, sf_dir)).collect()}
    assert a == b  # deterministic fake decode
    assert all(w >= 64 and h >= 64 for w, h in a.values())


def test_extract_features_dim_and_norm(spark, sf_dir):
    feats = M.extract_features(_media(spark, sf_dir)).collect()
    assert all(len(r.feature) == M.FEATURE_DIM for r in feats)
    s = sum(feats[0].feature)
    assert abs(s - 1.0) < 1e-5  # L1-normalized


def test_repartition_by_bytes(spark, sf_dir):
    media = _media(spark, sf_dir)
    total = media.agg(F.sum("n_bytes")).collect()[0][0]
    small = M.repartition_by_bytes(media, "n_bytes", target_bytes=total // 7 + 1)
    assert small.rdd.getNumPartitions() in (7, 8)
    assert small.count() == media.count()


def test_sample_frames_stride(spark, sf_dir):
    frames = M.sample_frames(_media(spark, sf_dir), every_n_bytes=64, max_frames=4)
    rows = frames.collect()
    assert rows
    by_media: dict[int, list] = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for mid, rs in by_media.items():
        assert 1 <= len(rs) <= 4
        assert sorted(r.frame_idx for r in rs) == list(range(len(rs)))
        assert all(r.byte_offset == r.frame_idx * 64 for r in rs)


def test_resize_media_caps_dims_and_shrinks_payload(spark, sf_dir):
    media = _media(spark, sf_dir)
    orig = {r.media_id: r.n_bytes for r in media.select("media_id", "n_bytes").collect()}
    out = M.resize_media(media, max_dim=64).collect()
    assert len(out) == len(orig)
    for r in out:
        assert 1 <= max(r.width, r.height) <= 64
        assert len(r.payload) <= orig[r.media_id]
    # deterministic: same input -> same output
    again = {r.media_id: (r.width, r.height, bytes(r.payload)) for r in
             M.resize_media(media, max_dim=64).collect()}
    for r in out:
        assert again[r.media_id] == (r.width, r.height, bytes(r.payload))


def test_frame_energies_and_segments_hand_case(spark):
    """frame_energies + the gaps-and-islands segmentation on a payload
    engineered frame-by-frame: 16 'z's (energy 1952, voiced), 16 spaces
    (512, unvoiced), 16 'z's, 8 'z's (tail frame, 976 < threshold)."""
    from spark_data_engineering_spark.operators.multimodal import frame_energies
    from pyspark.sql import functions as F

    payload = ("z" * 16 + " " * 16 + "z" * 16 + "z" * 8).encode()
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id bigint, payload binary"
    )
    rows = {r.frame_idx: r.energy for r in frame_energies(media, 16).collect()}
    assert rows == {0: 122 * 16, 1: 32 * 16, 2: 122 * 16, 3: 122 * 8}
    # the registered query's island construction over the same logic
    import __spark_entry__ as entrymod  # noqa: F401  (registration side-effect)
    from spark_data_engineering_spark.queries.multimodal import (
        _VAD_THRESHOLD,
    )

    voiced = [i for i, e in rows.items() if e >= _VAD_THRESHOLD]
    assert voiced == [0, 2]  # two singleton segments
