"""Persisted IVF index: build once, search many — the production ANN
lifecycle (cf. FAISS IVF on a single node; here the inverted file IS a
transactional table, so the index inherits atomic rebuilds, time travel,
and exactly-once ingest from ``sources/txn.py``).

``ivf_knn`` (operators/similarity.py) trains k-means per call — right
for one-shot queries, wrong for a serving corpus: at 1B vectors you
train once, materialize ``(cell, id, vector)`` clustered by cell, and
every search scans only its probed cells. Build writes the assignment
``repartitionByRange(cell)`` so each parquet file covers a narrow cell
range; search filters ``cell IN (probes)``, which Spark pushes to the
scan and resolves against footer min/max — file-level skipping turns
"probe 4 of 64 cells" into reading ~4/64ths of the bytes, no custom
reader needed. Centroids (a few KB) live in a JSON sidecar written
atomically next to the table log.

No reference analog (the reference has no vector surface); public
pattern per the IVF/ADC literature (Jegou et al., PAMI 2011) and the
Spark data-skipping model.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from spark_data_engineering_spark.functions.vectors import cosine
from spark_data_engineering_spark.functions import numeric as NR
from spark_data_engineering_spark.operators.similarity import train_ivf_centroids
from spark_data_engineering_spark.sources.txn import TxnTable


class IVFIndex:
    """Inverted-file ANN index persisted as a ``TxnTable`` of
    ``(cell int, vec_id bigint, embedding array<float>)`` plus a
    centroid sidecar."""

    def __init__(self, root: str, name: str = "ann_ivf") -> None:
        self.table = TxnTable(root, name)
        self.meta_path = os.path.join(self.table.table_dir, "ivf_meta.json")

    # ---- build ----------------------------------------------------------

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        corpus: DataFrame,
        root: str,
        name: str = "ann_ivf",
        n_centroids: int | None = 16,
        kmeans_iters: int = 5,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IVFIndex":
        import numpy as np

        idx = cls(root, name)
        cents = train_ivf_centroids(
            corpus, n_centroids, kmeans_iters, id_col, vec_col
        )
        b_cents = spark.sparkContext.broadcast(cents)

        def assign_cells(batches):
            import pandas as pd

            cts = b_cents.value
            for pdf in batches:
                block = np.array(list(pdf[vec_col]), dtype=np.float64)
                block = block / np.maximum(
                    np.linalg.norm(block, axis=1, keepdims=True), 1e-12
                )
                cell = np.argmax(block @ cts.T, axis=1)
                yield pd.DataFrame(
                    {"cell": cell, "vec_id": pdf[id_col], "embedding": pdf[vec_col]}
                )

        assigned = (
            corpus.select(id_col, vec_col)
            .mapInPandas(
                assign_cells, schema="cell int, vec_id bigint, embedding array<float>"
            )
            # cluster the inverted file: each output file covers a narrow
            # cell range, so a cell-IN filter skips whole files via
            # footer stats at search time
            .repartitionByRange(max(2, len(cents) // 4), "cell")
            .sortWithinPartitions("cell")
        )
        idx.table.overwrite(assigned)
        # atomic sidecar: the table commit is the source of truth for
        # data; centroids swap in afterwards via rename
        tmp = f"{idx.meta_path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"centroids": cents.tolist(), "id_col": id_col, "vec_col": vec_col},
                f,
            )
        os.replace(tmp, idx.meta_path)
        return idx

    # ---- incremental ingest ---------------------------------------------

    def ingest(
        self,
        spark: SparkSession,
        new_vectors: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        app_id: str | None = None,
        epoch_id: int | None = None,
    ) -> int | None:
        """Append vectors to the live index WITHOUT retraining: cells are
        assigned against the frozen centroids (standard serving-index
        behavior — retraining is a rebuild, not an ingest), clustered by
        cell, and committed atomically. With ``(app_id, epoch_id)`` the
        append is exactly-once (``TxnTable.append_idempotent``), so a
        streaming ``foreachBatch`` can feed the index: a replayed
        micro-batch commits nothing. Searches concurrent with ingest see
        the pre- or post-commit snapshot, never a partial one."""
        import numpy as np

        cents = self.centroids()
        b_cents = spark.sparkContext.broadcast(cents)

        def assign_cells(batches):
            import pandas as pd

            cts = b_cents.value
            for pdf in batches:
                block = np.array(list(pdf[vec_col]), dtype=np.float64)
                block = block / np.maximum(
                    np.linalg.norm(block, axis=1, keepdims=True), 1e-12
                )
                cell = np.argmax(block @ cts.T, axis=1)
                yield pd.DataFrame(
                    {"cell": cell, "vec_id": pdf[id_col], "embedding": pdf[vec_col]}
                )

        assigned = (
            new_vectors.select(id_col, vec_col)
            .mapInPandas(
                assign_cells, schema="cell int, vec_id bigint, embedding array<float>"
            )
            .repartitionByRange(max(2, len(cents) // 4), "cell")
            .sortWithinPartitions("cell")
        )
        if app_id is not None and epoch_id is not None:
            return self.table.append_idempotent(assigned, app_id, epoch_id)
        return self.table.append(assigned)

    # ---- search ---------------------------------------------------------

    def centroids(self):
        import numpy as np

        with open(self.meta_path) as f:
            return np.array(json.load(f)["centroids"], dtype=np.float64)

    def search(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 10,
        n_probe: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Top-k cosine against the persisted inverted file, scanning
        only probed cells. No training, no full-corpus pass: the query
        set (small by contract, same as every kNN entry point) maps to
        ``n_probe`` cells each; the distinct probe set drives a pushed
        ``cell IN (...)`` scan filter."""
        import numpy as np

        cents = self.centroids()
        b_cents = spark.sparkContext.broadcast(cents)
        n_probe = min(n_probe, len(cents))

        def assign_probes(batches):
            import pandas as pd

            cts = b_cents.value
            for pdf in batches:
                block = np.array(list(pdf[vec_col]), dtype=np.float64)
                block = block / np.maximum(
                    np.linalg.norm(block, axis=1, keepdims=True), 1e-12
                )
                order = np.argsort(-(block @ cts.T), axis=1)[:, :n_probe]
                out_q, out_v, out_c = [], [], []
                for i in range(len(block)):
                    for cell in order[i]:
                        out_q.append(pdf[id_col].iloc[i])
                        out_v.append(pdf[vec_col].iloc[i])
                        out_c.append(int(cell))
                yield pd.DataFrame(
                    {"query_id": out_q, "_qvec": out_v, "cell": out_c}
                )

        probes = queries.select(id_col, vec_col).mapInPandas(
            assign_probes, schema="query_id bigint, _qvec array<float>, cell int"
        )
        # driver-side probe-cell set: at most #queries x n_probe ints
        probe_cells = sorted(
            r.cell for r in probes.select("cell").distinct().collect()
        )
        inv = self.table.read(spark).filter(F.col("cell").isin(probe_cells))
        scored = (
            inv.join(F.broadcast(probes), "cell")
            .filter(F.col("vec_id") != F.col("query_id"))
            .withColumn("cos_sim", NR.round4(cosine(F.col("_qvec"), F.col("embedding"))))
        )
        w = W.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("vec_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                "cos_sim",
                F.col("rank").cast("bigint").alias("rank"),
            )
        )
