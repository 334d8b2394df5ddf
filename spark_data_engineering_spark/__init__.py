"""spark_data_engineering_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference repo
GregoryTomy/Spark-Data-Engineering (a medallion-architecture lakehouse ETL:
bronze -> silver -> gold -> interface, see /root/reference/README.md:62-76)
as an idiomatic PySpark library:

- ``session``   — SparkSession factory tuned for local[N] and cluster scale.
- ``sources``   — parquet table loaders + snapshot (etl_inserted) storage.
- ``plans``     — declarative node registry + topological runner (replaces
                  the reference's recursive per-class ``run()`` tree,
                  reference etl/utils/base_table.py:222-240).
- ``pipeline``  — the medallion pipeline instantiated over the driver's
                  TPC-H-ish testdata tables.
- ``operators`` — dedup (exact / MinHash-LSH / SimHash), similarity search,
                  conflict-rename, top-k (extension surface, SURVEY.md §2.6).
- ``functions`` — text analysis, vector math (JVM-side built-ins first).
- ``streaming`` — Structured Streaming variants of the metric queries.
- ``checks``    — data-quality assertions (replaces Great Expectations,
                  reference etl/utils/base_table.py:140-196).
- ``registry``  — the query/oracle registry backing ``__spark_entry__.py``.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
