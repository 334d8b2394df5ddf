"""SemDeDup — semantic deduplication via cluster-bounded cosine pruning
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication" — public method).

Exact embedding near-dup (operators/similarity.cosine_pairs_blocked) is
O(N^2) by contract; SemDeDup bounds the comparisons by first k-means
clustering the embeddings and only comparing WITHIN a cluster. With
~sqrt(N) clusters the total pairwise work is ~N^1.5 instead of N^2 —
the shape that makes embedding-level dedup feasible on a billion-doc
corpus. The price is recall: near-dup pairs that straddle a cluster
boundary are never compared. That tradeoff is measured, not assumed —
``semantic_dedup_report`` (queries/similarity.py) pins drop-validity
(= 1.0: every drop is a true near-dup) and drop-recall vs the exact
all-pairs connected-components result.

Scale shape: centroid training is the same bounded driver-side sample
as IVF (operators/similarity.train_ivf_centroids); assignment is one
Arrow pass; the within-cluster pass is ``applyInPandas`` — one shuffle
on the cell id, per-cell work quadratic in cell size (~sqrt N), no
driver materialization of the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_data_engineering_spark.operators.similarity import train_ivf_centroids
from spark_data_engineering_spark.materialize import materialize


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.45,
    n_clusters: int | None = None,
    kmeans_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_overlap: int = 1,
    centroids=None,
) -> DataFrame:
    """Per-id semantic-dedup verdicts: ``(id, cell, rep_id, keep,
    max_sim)``.

    Within each k-means cell, items whose (round-4) cosine reaches
    ``threshold`` are linked; each connected component keeps its
    minimum id (``rep_id``), every other member is a drop
    (``keep = false``). ``max_sim`` is the item's highest within-cell
    similarity to another member of its component (0.0 for
    singletons). Similarities are rounded to 4 decimals BEFORE the
    threshold compare so verdicts are bit-stable across partitionings.

    ``n_overlap`` (default 1) is the epsilon-overlap mitigation for
    boundary-straddling pairs: each point is assigned to its
    ``n_overlap`` nearest centroids and pairs are compared within the
    UNION of cells, so a near-dup pair is missed only when the two
    points share none of their top-``n_overlap`` cells. Work scales
    ~linearly in ``n_overlap`` (each point appears in that many cells;
    per-cell work stays quadratic in cell population). With overlap,
    components are computed globally over the union of within-cell
    thresholded pairs (min-label propagation), ``cell`` reports the
    PRIMARY (nearest) centroid, and ``max_sim`` is the max over
    thresholded pairs (0.0 for singletons)."""
    # centroids may be passed in so several dedup configurations over the
    # same corpus (e.g. the report's n_overlap=1 vs =2 rows) train k-means
    # once; verdicts are identical because training is deterministic
    cents = (
        centroids
        if centroids is not None
        else train_ivf_centroids(corpus, n_clusters, kmeans_iters, id_col, vec_col)
    )
    b_cents = corpus.sparkSession.sparkContext.broadcast(cents)
    n_overlap = max(1, min(n_overlap, len(cents)))
    if n_overlap > 1:
        return _semantic_dedup_overlap(
            corpus, b_cents, threshold, id_col, vec_col, n_overlap
        )

    def assign(batches):
        cts = b_cents.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            block = np.array(list(pdf[vec_col]), dtype=np.float64)
            block = block / np.maximum(
                np.linalg.norm(block, axis=1, keepdims=True), 1e-12
            )
            cell = np.argmax(block @ cts.T, axis=1)
            yield pd.DataFrame(
                {"id": pdf[id_col], "vec": pdf[vec_col], "cell": cell.astype("int32")}
            )

    assigned = corpus.select(id_col, vec_col).mapInPandas(
        assign, schema="id bigint, vec array<float>, cell int"
    )

    def dedup_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        ids = pdf["id"].to_numpy()
        n = len(ids)
        mat = np.array(list(pdf["vec"]), dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = np.floor(mat @ mat.T * 10000 + 0.5) / 10000
        np.fill_diagonal(sims, -1.0)
        # union-find over thresholded pairs
        parent = np.arange(n)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        for a, b in zip(ii.tolist(), jj.tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(i) for i in range(n)])
        rep = ids[roots]  # ids sorted ascending -> root index = min id
        max_sim = np.zeros(n)
        for comp in np.unique(roots):
            members = np.nonzero(roots == comp)[0]
            if len(members) > 1:
                sub = sims[np.ix_(members, members)]
                max_sim[members] = sub.max(axis=1)
        return pd.DataFrame(
            {
                "id": ids,
                "cell": pdf["cell"].to_numpy(),
                "rep_id": rep,
                "keep": ids == rep,
                "max_sim": max_sim,
            }
        )

    out = assigned.groupBy("cell").applyInPandas(
        dedup_cell,
        schema="id bigint, cell int, rep_id bigint, keep boolean, max_sim double",
    )
    return out.select(
        F.col("id").alias(id_col),
        "cell",
        "rep_id",
        "keep",
        F.col("max_sim"),
    )


def _semantic_dedup_overlap(
    corpus: DataFrame,
    b_cents,
    threshold: float,
    id_col: str,
    vec_col: str,
    n_overlap: int,
) -> DataFrame:
    """The epsilon-overlap path: top-``n_overlap`` centroid assignment,
    within-cell thresholded PAIRS (not verdicts — a component may span
    cells), then one global min-label connected-components pass
    (operators/dedup.dedup_clusters) over the deduplicated pair union.
    Same cosine rounding as the single-assignment path, so verdicts are
    bit-stable. Shuffle shape: one exchange on the cell id for the pair
    pass + the CC iterations over #pairs edges — no all-pairs anywhere.
    """
    from spark_data_engineering_spark.operators.dedup import dedup_clusters

    def assign_multi(batches):
        cts = b_cents.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            block = np.array(list(pdf[vec_col]), dtype=np.float64)
            block = block / np.maximum(
                np.linalg.norm(block, axis=1, keepdims=True), 1e-12
            )
            # stable argsort: deterministic top-n under dot-product ties
            order = np.argsort(-(block @ cts.T), axis=1, kind="stable")
            for j in range(n_overlap):
                yield pd.DataFrame(
                    {
                        "id": pdf[id_col],
                        "vec": pdf[vec_col],
                        "cell": order[:, j].astype("int32"),
                        "is_primary": j == 0,
                    }
                )

    assigned = corpus.select(id_col, vec_col).mapInPandas(
        assign_multi, schema="id bigint, vec array<float>, cell int, is_primary boolean"
    )

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        ids = pdf["id"].to_numpy()
        mat = np.array(list(pdf["vec"]), dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = np.floor(mat @ mat.T * 10000 + 0.5) / 10000
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        return pd.DataFrame(
            {"id_a": ids[ii], "id_b": ids[jj], "sim": sims[ii, jj]}
        )

    pairs = (
        assigned.groupBy("cell")
        .applyInPandas(cell_pairs, schema="id_a bigint, id_b bigint, sim double")
        # a pair sharing several assigned cells appears once per shared
        # cell with the identical rounded sim — one dedup aggregate
        .groupBy("id_a", "id_b")
        .agg(F.max("sim").alias("sim"))
        .transform(materialize)
    )
    comp = dedup_clusters(
        pairs, corpus.select(id_col), id_col=id_col
    )  # (id_col, cluster_id)
    max_sims = (
        pairs.select(F.col("id_a").alias("_mid"), "sim")
        .union(pairs.select(F.col("id_b").alias("_mid"), "sim"))
        .groupBy("_mid")
        .agg(F.max("sim").alias("_max_sim"))
    )
    primary = assigned.filter(F.col("is_primary")).select(
        F.col("id").alias("_pid"), "cell"
    )
    return (
        comp.join(primary, F.col(id_col) == F.col("_pid"))
        .join(max_sims, F.col(id_col) == F.col("_mid"), "left")
        .select(
            F.col(id_col),
            "cell",
            F.col("cluster_id").alias("rep_id"),
            (F.col(id_col) == F.col("cluster_id")).alias("keep"),
            F.coalesce(F.col("_max_sim"), F.lit(0.0)).alias("max_sim"),
        )
    )


def overlap_pair_sets(
    corpus: DataFrame,
    threshold: float = 0.45,
    n_clusters: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_overlap: int = 2,
    centroids=None,
) -> tuple[DataFrame, DataFrame]:
    """ONE assignment + pair pass serving BOTH accounting regimes:
    returns ``(pairs_all, pairs_primary)`` where pairs_all are the
    thresholded within-cell pairs under top-``n_overlap`` assignment and
    pairs_primary is the subset whose two points share their PRIMARY
    cell — exactly the edge set the single-assignment path compares
    (both endpoints primary in the same cell ⇔ same primary cell), so
    ``dedup_clusters(pairs_primary, ids)`` reproduces
    ``semantic_dedup(n_overlap=1)``'s components and
    ``dedup_clusters(pairs_all, ids)`` reproduces ``n_overlap=2``'s.
    Built for ``semantic_dedup_report``: halves the Arrow passes vs
    running the operator twice (equivalence pinned in
    tests/test_semdedup.py)."""
    cents = (
        centroids
        if centroids is not None
        else train_ivf_centroids(corpus, n_clusters, 5, id_col, vec_col)
    )
    b_cents = corpus.sparkSession.sparkContext.broadcast(cents)
    n_overlap = max(2, min(n_overlap, len(cents)))

    def assign_multi(batches):
        cts = b_cents.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            block = np.array(list(pdf[vec_col]), dtype=np.float64)
            block = block / np.maximum(
                np.linalg.norm(block, axis=1, keepdims=True), 1e-12
            )
            order = np.argsort(-(block @ cts.T), axis=1, kind="stable")
            for j in range(n_overlap):
                yield pd.DataFrame(
                    {
                        "id": pdf[id_col],
                        "vec": pdf[vec_col],
                        "cell": order[:, j].astype("int32"),
                        "primary_cell": order[:, 0].astype("int32"),
                    }
                )

    assigned = corpus.select(id_col, vec_col).mapInPandas(
        assign_multi,
        schema="id bigint, vec array<float>, cell int, primary_cell int",
    )

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        ids = pdf["id"].to_numpy()
        prim = pdf["primary_cell"].to_numpy()
        cell = int(pdf["cell"].iloc[0]) if len(pdf) else -1
        mat = np.array(list(pdf["vec"]), dtype=np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = np.floor(mat @ mat.T * 10000 + 0.5) / 10000
        ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
        return pd.DataFrame(
            {
                "id_a": ids[ii],
                "id_b": ids[jj],
                "sim": sims[ii, jj],
                "both_primary": (prim[ii] == cell) & (prim[jj] == cell),
            }
        )

    pairs = (
        assigned.groupBy("cell")
        .applyInPandas(
            cell_pairs,
            schema="id_a bigint, id_b bigint, sim double, both_primary boolean",
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.max("sim").alias("sim"),
            F.max(F.col("both_primary").cast("int")).cast("boolean").alias(
                "both_primary"
            ),
        )
        .transform(materialize)
    )
    return pairs, pairs.filter(F.col("both_primary"))
