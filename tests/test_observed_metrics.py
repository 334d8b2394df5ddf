"""observe()-based quality metrics: collected during the main action,
no second scan."""

from pyspark.sql import functions as F

from spark_data_engineering_spark import checks as C


def test_observed_metrics_ride_the_write(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], "id int, v string"
    )
    observed_df, obs = C.observed(df, "quality", "v", "id")
    # the WRITE is the only action; metrics come from the same pass
    observed_df.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got["n_rows"] == 4
    assert got["nulls_v"] == 2
    assert got["nulls_id"] == 0
