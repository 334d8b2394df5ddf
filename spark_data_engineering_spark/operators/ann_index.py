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
from spark_data_engineering_spark.materialize import materialize


class IVFIndex:
    """Inverted-file ANN index persisted as a ``TxnTable`` of
    ``(cell int, vec_id bigint, embedding array<float>)`` plus a
    centroid sidecar."""

    def __init__(self, root: str, name: str = "ann_ivf") -> None:
        self.table = TxnTable(root, name)
        self.meta_path = os.path.join(self.table.table_dir, "ivf_meta.json")

    # ---- internals ------------------------------------------------------

    @staticmethod
    def _assign(
        spark: SparkSession,
        vectors: DataFrame,
        cents,
        id_col: str,
        vec_col: str,
    ) -> DataFrame:
        """Cell-assign vectors against given centroids, clustered by cell
        (shared by build and ingest — same invariants, one code path)."""
        import numpy as np

        b_cents = spark.sparkContext.broadcast(cents)

        def assign_cells(batches):
            import pandas as pd

            cts = b_cents.value
            for pdf in batches:
                if not len(pdf):
                    continue
                block = np.array(list(pdf[vec_col]), dtype=np.float64)
                block = block / np.maximum(
                    np.linalg.norm(block, axis=1, keepdims=True), 1e-12
                )
                cell = np.argmax(block @ cts.T, axis=1)
                yield pd.DataFrame(
                    {"cell": cell, "vec_id": pdf[id_col], "embedding": pdf[vec_col]}
                )

        return (
            vectors.select(id_col, vec_col)
            .mapInPandas(
                assign_cells, schema="cell int, vec_id bigint, embedding array<float>"
            )
            # cluster the inverted file: each output file covers a narrow
            # cell range, so a cell-IN filter skips whole files via
            # footer stats at search time
            .repartitionByRange(max(2, len(cents) // 4), "cell")
            .sortWithinPartitions("cell")
        )

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
        idx = cls(root, name)
        cents = train_ivf_centroids(
            corpus, n_centroids, kmeans_iters, id_col, vec_col
        )
        assigned = cls._assign(spark, corpus, cents, id_col, vec_col)
        idx.table.overwrite(assigned)
        # build-time per-cell occupancy, read back from the COMMITTED
        # table (not the plan — what was written is what drift is
        # measured against): the baseline drift_report compares appends
        # to. One tiny agg, ≤ n_centroids rows.
        build_counts = {
            str(r["cell"]): r["n"]
            for r in idx.table.read(spark)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # atomic sidecar: the table commit is the source of truth for
        # data; centroids swap in afterwards via rename
        tmp = f"{idx.meta_path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "centroids": cents.tolist(),
                    "id_col": id_col,
                    "vec_col": vec_col,
                    "build_cell_counts": build_counts,
                },
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
        assigned = self._assign(spark, new_vectors, self.centroids(), id_col, vec_col)
        if app_id is not None and epoch_id is not None:
            return self.table.append_idempotent(assigned, app_id, epoch_id)
        return self.table.append(assigned)

    def delete_ids(self, spark: SparkSession, ids, mode: str = "cow") -> int:
        """Remove vectors from the live index by id — the upsert/forget
        path a serving index needs (dedup'd corpus re-ingest, GDPR
        erasure). Copy-on-write: victim discovery is one filtered scan
        of the index, and only the files that actually CONTAIN victims
        are rewritten — the rewrite set, not the read, is what the
        copy-on-write bounds. The commit is atomic and time travel
        still sees the pre-delete snapshot. Centroids are untouched —
        deletion never changes cell geometry, so every prior and future
        probe stays valid. Returns the new index version.

        ``mode="dv"`` deletes via a deletion vector instead
        (sources/txn.py:delete_where_dv): kilobytes of position sidecar,
        zero postings files rewritten — the erasure shape for a
        billion-vector index where a victim's cell file is GBs. Every
        search reads through ``table.read``, which applies DVs, so both
        modes are invisible to probes; the next compact materializes."""
        id_list = list(ids)
        if mode == "dv":
            return self.table.delete_where_dv(spark, F.col("vec_id").isin(id_list))
        return self.table.delete_where(spark, F.col("vec_id").isin(id_list))

    # ---- maintenance ----------------------------------------------------

    def drift_report(
        self, spark: SparkSession, rebuild_growth: float = 2.0
    ) -> DataFrame:
        """Per-cell occupancy now vs at build time — the signal that
        tells the operator WHEN to rebuild (retrain centroids). Frozen
        centroids keep every probe valid as the corpus grows, but cells
        that balloon relative to their build-time share make probes scan
        ever more vectors (recall cost stays fine; latency doesn't), and
        a skewed ingest distribution means the k-means partition no
        longer fits the data.

        Columns: ``cell``, ``built_rows`` (build-time count),
        ``live_rows`` (current count, deletes included), ``growth``
        (live/built, NULL when built 0 rows), ``rebuild`` (this cell
        grew past ``rebuild_growth``x, or is populated but was EMPTY at
        build — new-region drift no growth ratio can express).

        Scale: one partial-aggregated count over the postings (the same
        shape as any cell histogram) joined to ≤ n_centroids literal
        rows; the report is n_centroids rows."""
        meta_counts = json.load(open(self.meta_path)).get("build_cell_counts", {})
        built = spark.createDataFrame(
            [(int(c), int(n)) for c, n in meta_counts.items()] or [(-1, 0)],
            "cell int, built_rows bigint",
        )
        live = (
            self.table.read(spark)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("live_rows"))
        )
        joined = (
            live.join(F.broadcast(built), "cell", "full_outer")
            .filter(F.col("cell") >= 0)
            .select(
                "cell",
                F.coalesce(F.col("built_rows"), F.lit(0)).alias("built_rows"),
                F.coalesce(F.col("live_rows"), F.lit(0)).alias("live_rows"),
            )
        )
        growth = F.when(
            F.col("built_rows") > 0, F.col("live_rows") / F.col("built_rows")
        )
        return joined.select(
            "cell",
            "built_rows",
            "live_rows",
            F.round(growth, 4).alias("growth"),
            (
                ((F.col("built_rows") == 0) & (F.col("live_rows") > 0))
                | (growth > F.lit(rebuild_growth))
            ).alias("rebuild"),
        )

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
        at_version: int | None = None,
    ) -> DataFrame:
        """Top-k cosine against the persisted inverted file, scanning
        only probed cells. No training, no full-corpus pass: the query
        set (small by contract, same as every kNN entry point) maps to
        ``n_probe`` cells each; the distinct probe set drives a pushed
        ``cell IN (...)`` scan filter. ``at_version`` time-travels the
        search to an older index snapshot. Centroids are frozen across
        ingests (appends), so probes stay valid at every version SINCE
        the last rebuild; a ``build()`` rewrites both table and centroid
        sidecar, so time-traveling to a pre-rebuild version would probe
        old-centroid cells with new centroids — silent recall collapse.
        Approximate (n_probe < n_cells) searches against such versions
        are refused explicitly; a probe-ALL search is exact regardless
        of cell layout, so it proceeds by scanning the snapshot with no
        cell filter (brute force over the old snapshot — correct, just
        not index-accelerated)."""
        import numpy as np

        cents = self.centroids()
        probe_all = n_probe >= len(cents)
        pre_rebuild = False
        if at_version is not None:
            rebuild_floor = max(
                (
                    c["version"]
                    for c in self.table.history()
                    if c.get("action") == "overwrite"
                ),
                default=0,
            )
            pre_rebuild = at_version < rebuild_floor
            if pre_rebuild and not probe_all:
                raise ValueError(
                    f"at_version={at_version} predates the last index rebuild "
                    f"(overwrite commit v{rebuild_floor}); the current centroid "
                    "sidecar does not describe that snapshot's cell assignment. "
                    "Use n_probe >= n_cells (exact, unaccelerated) or search "
                    "a version since the rebuild."
                )
        if pre_rebuild:
            # exact fallback BEFORE any probe assignment (the cell pass
            # would be discarded work): the old snapshot's cell ids
            # belong to dead centroids — ignore them and score every
            # row per query.
            inv = self.table.read(spark, at_version=at_version)
            qframe = queries.select(
                F.col(id_col).cast("bigint").alias("query_id"),
                F.col(vec_col).alias("_qvec"),
            )
            scored = (
                inv.crossJoin(F.broadcast(qframe))
                .filter(F.col("vec_id") != F.col("query_id"))
                .withColumn(
                    "cos_sim", NR.round4(cosine(F.col("_qvec"), F.col("embedding")))
                )
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

        probes = (
            queries.select(id_col, vec_col)
            .mapInPandas(
                assign_probes, schema="query_id bigint, _qvec array<float>, cell int"
            )
            # materialize once: the distinct-cell collect below and the
            # broadcast join both consume this tiny frame, and a lazy
            # plan would recompute the assignment pass per consumer
            .transform(materialize)
        )
        # driver-side probe-cell set: at most #queries x n_probe ints
        probe_cells = sorted(
            r.cell for r in probes.select("cell").distinct().collect()
        )
        inv = self.table.read(spark, at_version=at_version).filter(
            F.col("cell").isin(probe_cells) if probe_cells else F.lit(False)
        )
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


class IVFPQIndex:
    """IVF + product quantization, persisted: the billion-vector serving
    layout (Jegou et al., PAMI 2011). The inverted file stores ``m``
    uint8 PQ codes per vector as a BINARY column (m bytes at rest vs
    4*dim for float32 — 32x at m=16/dim=64) clustered by IVF cell;
    search probes ``n_probe`` cells (pushed cell-IN scan filter — file
    skipping), ADC-scores the probed codes via per-query lookup tables
    (m table gathers per vector, no float math per dimension), and
    optionally re-ranks the short list with exact cosine against a
    full-precision vector store (``rerank_with``), touching only
    ``Q * k * rerank_factor`` true vectors.

    Vectors are PQ-encoded RAW (not residual-to-centroid): simpler, and
    exactness of the re-rank stage never depends on it; the trade is
    mildly coarser ADC ordering. Centroids + codebooks live in one
    atomic JSON sidecar; ingest appends with frozen centroids AND
    codebooks (retraining either is a rebuild)."""

    def __init__(self, root: str, name: str = "ann_ivfpq") -> None:
        self.table = TxnTable(root, name)
        self.meta_path = os.path.join(self.table.table_dir, "ivfpq_meta.json")

    # ---- internals ------------------------------------------------------

    def _meta(self):
        import numpy as np

        with open(self.meta_path) as f:
            d = json.load(f)
        return (
            np.array(d["centroids"], dtype=np.float64),
            np.array(d["codebooks"], dtype=np.float64),
        )

    @staticmethod
    def _encode(
        spark: SparkSession,
        vectors: DataFrame,
        cents,
        books,
        id_col: str,
        vec_col: str,
    ) -> DataFrame:
        import numpy as np

        m, _, sub = books.shape
        b_cents = spark.sparkContext.broadcast(cents)
        b_books = spark.sparkContext.broadcast(books)

        def encode(batches):
            import pandas as pd

            cts, bks = b_cents.value, b_books.value
            for pdf in batches:
                if not len(pdf):
                    continue
                block = np.array(list(pdf[vec_col]), dtype=np.float64)
                block = block / np.maximum(
                    np.linalg.norm(block, axis=1, keepdims=True), 1e-12
                )
                cell = np.argmax(block @ cts.T, axis=1)
                n = len(block)
                blocks = block.reshape(n, m, sub)
                codes = np.empty((n, m), dtype=np.uint8)
                recon_sq = np.zeros(n)
                for j in range(m):
                    d2 = ((blocks[:, j, None, :] - bks[None, j]) ** 2).sum(axis=2)
                    codes[:, j] = np.argmin(d2, axis=1)
                    recon_sq += (bks[j][codes[:, j]] ** 2).sum(axis=1)
                yield pd.DataFrame(
                    {
                        "cell": cell,
                        "vec_id": pdf[id_col],
                        "codes": [c.tobytes() for c in codes],
                        "recon_norm": np.maximum(np.sqrt(recon_sq), 1e-12),
                    }
                )

        return (
            vectors.select(id_col, vec_col)
            .mapInPandas(
                encode,
                schema="cell int, vec_id bigint, codes binary, recon_norm double",
            )
            .repartitionByRange(max(2, len(cents) // 4), "cell")
            .sortWithinPartitions("cell")
        )

    # ---- build / ingest -------------------------------------------------

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        corpus: DataFrame,
        root: str,
        name: str = "ann_ivfpq",
        n_centroids: int | None = 16,
        m: int = 16,
        n_codes: int = 32,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IVFPQIndex":
        from spark_data_engineering_spark.operators.similarity import (
            pq_train_codebooks,
        )

        idx = cls(root, name)
        cents = train_ivf_centroids(corpus, n_centroids, id_col=id_col, vec_col=vec_col)
        books = pq_train_codebooks(corpus, m=m, n_codes=n_codes, vec_col=vec_col, id_col=id_col)
        encoded = cls._encode(spark, corpus, cents, books, id_col, vec_col)
        idx.table.overwrite(encoded)
        tmp = f"{idx.meta_path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"centroids": cents.tolist(), "codebooks": books.tolist()}, f
            )
        os.replace(tmp, idx.meta_path)
        return idx

    def ingest(
        self,
        spark: SparkSession,
        new_vectors: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        app_id: str | None = None,
        epoch_id: int | None = None,
    ) -> int | None:
        cents, books = self._meta()
        encoded = self._encode(spark, new_vectors, cents, books, id_col, vec_col)
        if app_id is not None and epoch_id is not None:
            return self.table.append_idempotent(encoded, app_id, epoch_id)
        return self.table.append(encoded)

    def delete_ids(self, spark: SparkSession, ids, mode: str = "cow") -> int:
        """Id-level erasure, same contract as ``IVFIndex.delete_ids``
        (including ``mode="dv"`` position-sidecar deletes): centroids
        and codebooks untouched (deletion never changes cell geometry
        or quantization)."""
        if mode == "dv":
            return self.table.delete_where_dv(spark, F.col("vec_id").isin(list(ids)))
        return self.table.delete_where(spark, F.col("vec_id").isin(list(ids)))

    # ---- search ---------------------------------------------------------

    def search(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 10,
        n_probe: int = 4,
        rerank_with: DataFrame | None = None,
        rerank_factor: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """ADC top-``k*rerank_factor`` over the probed cells; exact
        cosine re-rank against ``rerank_with`` (a full-precision vector
        table — at serving scale a key-value fetch; modeled here as a
        broadcast-candidate join) when given, else the ADC ranking with
        ``adc_sim`` as the score column."""
        import numpy as np

        cents, books = self._meta()
        m, _, sub = books.shape
        n_probe = min(n_probe, len(cents))

        q_rows = queries.select(id_col, vec_col).collect()
        if not q_rows:
            score = "cos_sim" if rerank_with is not None else "adc_sim"
            return spark.createDataFrame(
                [], f"query_id bigint, neighbor_id bigint, {score} double, rank bigint"
            )
        q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
        q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
        q_mat = q_mat / np.maximum(
            np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12
        )
        probe = np.argsort(-(q_mat @ cents.T), axis=1)[:, :n_probe]
        probe_cells = sorted({int(c) for row in probe for c in row})
        # tables[q, j, c] = <query_q subvector j, codebook[j][c]>
        tables = np.einsum(
            "qjs,jcs->qjc", q_mat.reshape(len(q_mat), m, sub), books
        )
        sc = spark.sparkContext
        b_tables = sc.broadcast(tables)
        b_qids = sc.broadcast(q_ids)
        b_qcells = sc.broadcast(probe)

        def adc_score(batches):
            import pandas as pd

            tbl, qids, qprobe = b_tables.value, b_qids.value, b_qcells.value
            for pdf in batches:
                if not len(pdf):
                    continue
                codes = np.stack(
                    [np.frombuffer(b, dtype=np.uint8) for b in pdf["codes"]]
                ).astype(np.int64)
                cells = pdf["cell"].to_numpy()
                ids = pdf["vec_id"].to_numpy(dtype=np.int64)
                recon = pdf["recon_norm"].to_numpy()
                j_idx = np.arange(m)
                out_q, out_n, out_s = [], [], []
                for qi in range(len(qids)):
                    mask = np.isin(cells, qprobe[qi])
                    if not mask.any():
                        continue
                    sims = (
                        tbl[qi, j_idx[None, :], codes[mask]].sum(axis=1)
                        / recon[mask]
                    )
                    mids = ids[mask]
                    kk = min(k * rerank_factor + 4, len(sims))
                    top = np.argpartition(-sims, kk - 1)[:kk]
                    for t in top:
                        if mids[t] == qids[qi]:
                            continue
                        out_q.append(qids[qi])
                        out_n.append(mids[t])
                        out_s.append(round(float(sims[t]), 4))
                yield pd.DataFrame(
                    {"query_id": out_q, "neighbor_id": out_n, "adc_sim": out_s}
                )

        inv = self.table.read(spark).filter(F.col("cell").isin(probe_cells))
        cand = inv.mapInPandas(
            adc_score, schema="query_id bigint, neighbor_id bigint, adc_sim double"
        )
        w_adc = W.partitionBy("query_id").orderBy(
            F.col("adc_sim").desc(), F.col("neighbor_id").asc()
        )
        short_list = (
            cand.withColumn("_r", F.row_number().over(w_adc))
            .filter(F.col("_r") <= k * rerank_factor)
            .select("query_id", "neighbor_id", "adc_sim")
        )
        if rerank_with is None:
            return (
                short_list.withColumn(
                    "rank",
                    F.row_number().over(
                        W.partitionBy("query_id").orderBy(
                            F.col("adc_sim").desc(), F.col("neighbor_id").asc()
                        )
                    ),
                )
                .filter(F.col("rank") <= k)
                .select(
                    "query_id",
                    "neighbor_id",
                    "adc_sim",
                    F.col("rank").cast("bigint").alias("rank"),
                )
            )
        c_vecs = rerank_with.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
        )
        q_vecs = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
        )
        rescored = (
            c_vecs.join(F.broadcast(short_list.select("query_id", "neighbor_id")), "neighbor_id")
            .join(F.broadcast(q_vecs), "query_id")
            .withColumn(
                "cos_sim", NR.round4(cosine(F.col("_qvec"), F.col("_cvec")))
            )
        )
        w = W.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id").asc()
        )
        return (
            rescored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "neighbor_id",
                "cos_sim",
                F.col("rank").cast("bigint").alias("rank"),
            )
        )
