from spark_data_engineering_spark.pipeline.medallion import build_registry, run_reports

__all__ = ["build_registry", "run_reports"]
