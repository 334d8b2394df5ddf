"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline; random-hyperplane
LSH bucketing as the scale path (the reference has nothing like this —
extension surface per repo mission).

Scale design: the query set broadcasts; the corpus scan + cosine are one
codegen stage with no shuffle. The only shuffle is the per-query top-k
(TakeOrderedAndProject-style via window on query_id — key cardinality =
#queries, so the shuffle is trivial). The LSH variant prunes the corpus
to matching hash buckets before scoring — at 1B vectors the bucket join
replaces the full scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_data_engineering_spark.functions import numeric as NR

from spark_data_engineering_spark.functions.vectors import cosine


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    Returns (query_id, neighbor_id, cos_sim, rank), self-matches excluded,
    deterministic tie-break on neighbor id over the rounded similarity.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", NR.round4(cosine(F.col("_qvec"), F.col("_cvec"))))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("bigint").alias("rank"))
    )


def _hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes via an LCG walk
    (no RNG state; reproducible across runs and engines)."""
    planes, x = [], 1_234_567
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            x = (1_103_515_245 * x + 12_345) % (1 << 31)
            row.append((x / float(1 << 31)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def auto_num_planes(
    corpus_rows: int, target_bucket: int = 256, lo: int = 3, hi: int = 20
) -> int:
    """Plane count sized so the expected bucket holds ~``target_bucket``
    vectors: ``2**planes ~= N / target_bucket``. Fixed plane counts break
    at both ends — 8 planes is 256 buckets whether the corpus holds 6e3
    vectors (23/bucket: probes cover almost nothing, recall collapses) or
    1e9 (4M/bucket: every probe rescans a shard). Capped at ``hi`` so the
    signature stays one bigint."""
    import math

    return max(lo, min(hi, math.ceil(math.log2(max(1.0, corpus_rows / target_bucket)))))


def lsh_bucket_signature(vec, planes: list[list[float]]):
    """Bit signature column: sign of the dot product with each plane."""
    sig = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        plane_arr = F.array(*[F.lit(v) for v in plane])
        d = F.aggregate(
            F.zip_with(vec, plane_arr, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(d > 0, F.shiftleft(F.lit(1).cast("bigint"), i)).otherwise(F.lit(0).cast("bigint"))
    return sig


def lsh_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 9,
) -> DataFrame:
    """Approximate top-k via hyperplane LSH bucketing. **Multi-probe by
    default** (``n_probes=9``: home bucket + 8 one-bit flips — measured
    recall@10 = 1.0 on the synthetic corpus); single-probe measured
    0.14 on the same corpus, near-useless as a default, and survives
    only as the explicit opt-out ``n_probes=1`` — its recall stays on
    the ``ann_recall_report`` frontier as the documented cheapest point.
    ``num_planes=None`` sizes buckets from the corpus row count
    (metadata-only count job; see ``auto_num_planes``).
    """
    if n_probes > 1:
        return lsh_knn_multiprobe(
            corpus,
            queries,
            k=k,
            num_planes=num_planes,
            dim=dim,
            n_probes=n_probes,
            id_col=id_col,
            vec_col=vec_col,
        )
    if num_planes is None:
        num_planes = auto_num_planes(corpus.count())
    planes = _hyperplanes(num_planes, dim)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        lsh_bucket_signature(F.col(vec_col), planes).alias("_bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        lsh_bucket_signature(F.col(vec_col), planes).alias("_bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "_bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", NR.round4(cosine(F.col("_qvec"), F.col("_cvec"))))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("bigint").alias("rank"))
    )


def cosine_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with round4(cosine) >= threshold (id_a < id_b).

    Implementation: the L2-normalized corpus matrix is broadcast once;
    an Arrow-batched ``mapInPandas`` pass computes each partition-block x
    full-matrix product with numpy (BLAS) and emits qualifying pairs.
    This replaces a 2M-pair interpreted higher-order-function cosine
    (measured 30s at sf0.1) with a single ~256 MFLOP matmul (<1s).

    Scale note: brute-force all-pairs is inherently O(N^2) — it is the
    small-N verification path. For large N the LSH-bucketed variant
    (``lsh_knn`` buckets) bounds the candidate set first; the broadcast
    here caps at the corpus sizes where N^2 is feasible at all.
    """
    import numpy as np

    rows = corpus.select(id_col, vec_col).collect()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    sc = corpus.sparkSession.sparkContext
    b_ids = sc.broadcast(ids)
    b_mat = sc.broadcast(mat)

    def op(batches):
        import pandas as pd

        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            block = np.array(list(pdf[vec_col]), dtype=np.float64)
            bn = np.linalg.norm(block, axis=1, keepdims=True)
            bn[bn == 0] = 1.0
            block = block / bn
            sims = block @ all_mat.T
            sims = np.floor(sims * 10000 + 0.5) / 10000
            bids = pdf[id_col].to_numpy()
            mask = (sims >= threshold) & (all_ids[None, :] > bids[:, None])
            ii, jj = np.nonzero(mask)
            yield pd.DataFrame(
                {"id_a": bids[ii], "id_b": all_ids[jj], "cos_sim": sims[ii, jj]}
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        op, schema="id_a bigint, id_b bigint, cos_sim double"
    )


def cosine_pairs_blocked(
    corpus: DataFrame,
    threshold: float,
    n_blocks: int | None = None,
    target_block_rows: int = 8192,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """EXACT all pairs with round4(cosine) >= threshold (id_a < id_b),
    computed distributed — no driver-side corpus materialization.

    Block-matrix formulation: rows hash into ``n_blocks`` blocks; each of
    the B(B+1)/2 unordered block pairs becomes one ``applyInPandas``
    group holding both blocks' vectors, scored with one numpy (BLAS)
    matmul. Exactness is preserved (every pair of rows lands in exactly
    one group), unlike LSH candidate generation, whose recall < 1 would
    break the all-pairs contract.

    Scale shape: shuffle volume = N x B rows (each row replicates to the
    B groups it participates in), compute = the inherent O(N^2) of exact
    all-pairs spread over B(B+1)/2 independent tasks, and peak task
    memory = 2 blocks ~ 2N/B vectors. By default B adapts to the corpus:
    ``ceil(N / target_block_rows)`` clamped to [1, 64], which bounds a
    task's working set to ~2 x target_block_rows vectors at any N while
    keeping tiny corpora in one task instead of paying 36 groups of
    scheduling overhead (measured 1.7s -> 0.6s on a 2k-vector corpus).
    For approximate near-dup at the 100 TB scale where N^2 itself is
    infeasible, the MinHash/SimHash/LSH family (operators/dedup.py,
    lsh_knn) is the path — this operator is the exact-semantics tier.
    """
    import math

    import numpy as np

    spark = corpus.sparkSession
    if n_blocks is None:
        n_rows = corpus.count()
        n_blocks = max(1, min(64, math.ceil(n_rows / target_block_rows)))
    pair_rows = [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)]
    block_pairs = spark.createDataFrame(pair_rows, "bi int, bj int")

    src = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("_blk"),
    )
    # a row joins every group where its block is either side. The old
    # form dropDuplicates'd the union (the i==j diagonal group received
    # each row from BOTH sides), paying a full extra Exchange of the
    # vector payload; duplicates arise ONLY on the diagonal, and only
    # from the right branch, so excluding bi==bj there reproduces the
    # exact same membership with one payload shuffle instead of two
    # (guide §2.3 — shuffle fewer bytes).
    left = src.join(F.broadcast(block_pairs), F.col("_blk") == F.col("bi"))
    right = src.join(
        F.broadcast(block_pairs),
        (F.col("_blk") == F.col("bj")) & (F.col("bi") != F.col("bj")),
    )
    members = left.unionByName(right)

    def score_group(pdf):
        import pandas as pd

        bi, bj = int(pdf["bi"].iloc[0]), int(pdf["bj"].iloc[0])
        blk = pdf["_blk"].to_numpy()
        ids = pdf["_id"].to_numpy()
        mat = np.array(list(pdf["_vec"]), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat = mat / norms
        li = np.nonzero(blk == bi)[0]
        rj = np.nonzero(blk == bj)[0]
        if len(li) == 0 or len(rj) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cos_sim": "float64"}
            )
        sims = mat[li] @ mat[rj].T
        sims = np.floor(sims * 10000 + 0.5) / 10000
        ia, ib = ids[li], ids[rj]
        if bi == bj:
            # diagonal group: both (a,b) and (b,a) appear — keep strictly
            # ordered pairs, which also drops self-pairs
            mask = (sims >= threshold) & (ia[:, None] < ib[None, :])
            ii, jj = np.nonzero(mask)
            out_a, out_b = ia[ii], ib[jj]
        else:
            # cross-block group: each unordered pair appears once; order
            # the ids on output (the smaller id may live in either block)
            mask = sims >= threshold
            ii, jj = np.nonzero(mask)
            out_a = np.minimum(ia[ii], ib[jj])
            out_b = np.maximum(ia[ii], ib[jj])
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "cos_sim": sims[ii, jj]})

    return members.groupBy("bi", "bj").applyInPandas(
        score_group, schema="id_a bigint, id_b bigint, cos_sim double"
    )


def lsh_knn_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int | None = None,
    dim: int = 64,
    n_probes: int = 9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe hyperplane LSH: each query probes the ``n_probes``
    buckets nearest (by hamming distance) to its own signature — mask 0
    is the home bucket, then single-bit flips, then two-bit flips, and so
    on. Recovers most of the recall single-probe loses when buckets are
    fine; with ``n_probes = 2**num_planes`` every bucket is probed and
    recall is exactly 1 (the oracle-able configuration).
    ``num_planes=None`` sizes buckets from the corpus row count
    (metadata-only count job; see ``auto_num_planes``).

    The corpus is still bucketed ONCE; only the (tiny) query side
    replicates per probe — the scan volume stays #corpus + #queries x
    n_probes, the property that matters at 1B vectors.
    """
    if num_planes is None:
        num_planes = auto_num_planes(corpus.count())
    planes = _hyperplanes(num_planes, dim)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        lsh_bucket_signature(F.col(vec_col), planes).alias("_bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        lsh_bucket_signature(F.col(vec_col), planes).alias("_sig"),
    )
    masks = sorted(range(1 << num_planes), key=lambda m: (bin(m).count("1"), m))
    flips = [F.col("_sig").bitwiseXOR(F.lit(m)) for m in masks[:n_probes]]
    probes = q.select(
        "query_id", "_qvec", F.explode(F.array(*flips)).alias("_bucket")
    )
    scored = (
        c.join(F.broadcast(probes), "_bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cos_sim", NR.round4(cosine(F.col("_qvec"), F.col("_cvec"))))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("bigint").alias("rank"))
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int | None = 16,
    kmeans_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Driver-side k-means over a bounded DETERMINISTIC sample: the ~4k
    smallest-id rows, selected with ``orderBy(id).limit(n)`` (Spark
    compiles this to TakeOrderedAndProject — per-partition top-k + a
    driver merge, never a full sort). Because the sampled SET is a pure
    function of the ids, the trained centroids are invariant to
    partition/scan order and file layout at ANY corpus size — a bare
    ``limit()`` picked whatever rows the scan met first, which made
    every IVF-derived verdict layout-dependent (caught by the
    semantic-dedup partitioning test; for corpora beyond the sample cap
    the sampled subset itself used to change under compaction).
    Evenly-spaced init over the sorted sample, unit-normalized
    centroids. Returns the (n_centroids, dim) numpy array shared by
    ``ivf_knn`` and the persisted ``IVFIndex``; ``n_centroids=None``
    sizes FAISS-style (~sqrt(N), floor 16)."""
    import math

    import numpy as np

    if n_centroids is None:
        n_centroids = max(16, round(math.sqrt(corpus.count())))
    # sample must cover the requested centroid count: once sqrt(N)
    # exceeds a fixed 4096-row cap, linspace init would yield duplicate
    # indices (duplicate/empty centroids) — grow the sample with k
    sample_rows = max(4096, 4 * n_centroids)
    rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(sample_rows).collect()
    if not rows:
        raise ValueError("train_ivf_centroids: corpus is empty — cannot train centroids")
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    n_centroids = min(n_centroids, len(mat))
    idx = np.linspace(0, len(mat) - 1, n_centroids).astype(int)
    cents = mat[idx].copy()
    for _ in range(kmeans_iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for j in range(n_centroids):
            members = mat[assign == j]
            if len(members):
                c = members.mean(axis=0)
                cents[j] = c / max(np.linalg.norm(c), 1e-12)
    return cents


def ivf_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int | None = 16,
    n_probe: int = 4,
    kmeans_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
) -> DataFrame:
    """IVF (inverted-file) approximate k-NN: partition the corpus into
    ``n_centroids`` Voronoi cells via a small k-means, then score each
    query only against its ``n_probe`` nearest cells.
    ``n_centroids=None`` sizes the cell count FAISS-style from the
    corpus (~sqrt(N), floor 16): cells stay ~sqrt(N) vectors each, so
    probe cost grows as sqrt of the corpus rather than a fixed fraction.

    The centroid table is tiny (n_centroids x dim) and lives driver-side:
    k-means runs as numpy over a SAMPLE collected once (deterministic
    hash-based sample + init), then cell assignment is one broadcast-
    join-free mapInPandas pass over the corpus. At 1B vectors this is the
    standard sharded-ANN layout: cells ~ balanced, probe cost =
    n_probe/n_centroids of a full scan.

    ``centroids`` lets a caller that already trained the identical
    centroid set (same corpus, same ``train_ivf_centroids`` parameters)
    pass it in and skip the duplicate training pass — the assignment and
    scoring below are unchanged.
    """
    import numpy as np

    cents = (
        centroids
        if centroids is not None
        else train_ivf_centroids(corpus, n_centroids, kmeans_iters, id_col, vec_col)
    )
    n_centroids = len(cents)
    sc = corpus.sparkSession.sparkContext
    b_cents = sc.broadcast(cents)

    def assign_cells(batches):
        import pandas as pd

        cts = b_cents.value
        for pdf in batches:
            block = np.array(list(pdf[vec_col]), dtype=np.float64)
            block = block / np.maximum(np.linalg.norm(block, axis=1, keepdims=True), 1e-12)
            cell = np.argmax(block @ cts.T, axis=1)
            yield pd.DataFrame(
                {"neighbor_id": pdf[id_col], "_cvec": pdf[vec_col], "_cell": cell}
            )

    c = corpus.select(id_col, vec_col).mapInPandas(
        assign_cells, schema=f"neighbor_id bigint, _cvec array<float>, _cell int"
    )

    def assign_probes(batches):
        import pandas as pd

        cts = b_cents.value
        for pdf in batches:
            block = np.array(list(pdf[vec_col]), dtype=np.float64)
            block = block / np.maximum(np.linalg.norm(block, axis=1, keepdims=True), 1e-12)
            order = np.argsort(-(block @ cts.T), axis=1)[:, :n_probe]
            out_q, out_v, out_c = [], [], []
            for i in range(len(block)):
                for cell in order[i]:
                    out_q.append(pdf[id_col].iloc[i])
                    out_v.append(pdf[vec_col].iloc[i])
                    out_c.append(int(cell))
            yield pd.DataFrame({"query_id": out_q, "_qvec": out_v, "_cell": out_c})

    q = queries.select(id_col, vec_col).mapInPandas(
        assign_probes, schema=f"query_id bigint, _qvec array<float>, _cell int"
    )
    scored = (
        c.join(F.broadcast(q), "_cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", NR.round4(cosine(F.col("_qvec"), F.col("_cvec"))))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("bigint").alias("rank"))
    )


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = 127/max|x|,
    q_i = floor(x_i·scale + 0.5). 4× memory reduction vs float32 — at
    100 TB of embeddings that's the difference between a corpus that
    fits executor memory and one that doesn't, and integer dot products
    vectorize (SIMD) on the scan side.

    Values stay in a double array holding exact integers in [-127,127]:
    every downstream product/sum is then EXACT in IEEE doubles (≤2^53),
    which is what makes the quantized kNN hash-matchable against a SQL
    oracle — no float-accumulation-order sensitivity anywhere.

    The higher-order transform runs interpreted, which is fine for an
    ingest-time one-pass op (amortized over every later query); a
    cluster-scale ingest would swap in a vectorized Pandas UDF.
    """
    x = F.col(vec_col)
    ma = F.array_max(F.transform(x, lambda v: F.abs(v.cast("double"))))
    q = F.when(
        ma > 0,
        F.transform(
            x, lambda v: F.floor(v.cast("double") * 127.0 / ma + 0.5).cast("double")
        ),
    ).otherwise(F.transform(x, lambda v: F.lit(0.0)))
    return df.select(F.col(id_col), q.alias("qvec"))


def int8_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k over int8-quantized vectors: cosine of the quantized
    representation, ranked with the same (score DESC, id ASC) contract
    as ``brute_force_knn``. All sums are exact (integer values in
    doubles), so results are bit-deterministic across engines, runs and
    partitionings — unusual for a float kNN and ideal for regression
    gating. Same scan shape as brute force: query side broadcasts, one
    corpus pass, per-query top-k window."""
    from pyspark.sql import Window as W

    cq = quantize_int8(corpus, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("qvec").alias("_cvec")
    )
    qq = quantize_int8(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("qvec").alias("_qvec")
    )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
        )

    scored = (
        cq.crossJoin(F.broadcast(qq))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos_sim_q",
            NR.round4(
                _dot(F.col("_qvec"), F.col("_cvec"))
                / (
                    F.sqrt(_dot(F.col("_qvec"), F.col("_qvec")))
                    * F.sqrt(_dot(F.col("_cvec"), F.col("_cvec")))
                )
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim_q").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "cos_sim_q",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def pq_train_codebooks(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    kmeans_iters: int = 5,
    sample_rows: int = 4096,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Train product-quantization codebooks: split the (normalized)
    vector into ``m`` contiguous subvectors and run an independent small
    k-means per subspace. Returns a numpy array of shape
    ``(m, n_codes, dim // m)``.

    Training is driver-side over a BOUNDED sample: the ``sample_rows``
    smallest-id rows via ``orderBy(id).limit`` (TakeOrderedAndProject —
    the sampled set is a pure function of the ids, so codebooks are
    invariant to partition/scan order and file layout at any corpus
    size; same contract as ``train_ivf_centroids``). Codebook quality
    depends on the sample, correctness of the index does not. At 1B
    vectors the sample is still 4k rows; nothing here grows with the
    corpus.
    """
    import numpy as np

    rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(sample_rows).collect()
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = np.empty((m, n_codes, sub), dtype=np.float64)
    for j in range(m):
        block = mat[:, j * sub : (j + 1) * sub]
        # deterministic init: evenly spaced rows of the sample block
        idx = np.linspace(0, len(block) - 1, n_codes).astype(int)
        cents = block[idx].copy()
        for _ in range(kmeans_iters):
            d2 = ((block[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(n_codes):
                members = block[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def pq_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization approximate k-NN: asymmetric distance
    computation (ADC) for candidate generation, exact-cosine re-rank of
    the short list — the memory-bound scale path for billion-vector
    corpora: each corpus vector is scanned as ``m`` uint8 codes (8 bytes
    at m=8 vs 256 bytes for float32 dim=64 — 32x), and ADC-scoring a
    vector costs ``m`` table lookups instead of ``dim`` multiplies.

    Flow: (1) train codebooks on a bounded driver-side sample;
    (2) one mapInPandas pass encodes the corpus (codes + reconstructed
    norm) — at scale this is the ingest-time index build, amortized over
    every later query; (3) queries stay FLOAT (asymmetric): per query a
    ``m x n_codes`` dot-product table is built once, then each encoded
    corpus row is scored by gathering ``m`` entries. Scoring emits only
    a per-batch short list per query, so shuffle volume is
    ``O(batches * queries * k * rerank_factor)``, not ``O(N * queries)``;
    (4) the global ADC top ``k * rerank_factor`` candidates join back to
    the corpus for true vectors and an EXACT cosine re-rank picks the
    final top-k — the standard two-stage layout (IVFPQ + re-rank): the
    full-precision fetch touches only ``Q * k * rerank_factor`` rows, so
    the 32x scan compression is preserved.

    Approximate by design (the true neighbor must survive the ADC
    short-list cut) — recall vs ``brute_force_knn`` is asserted in
    tests, same contract as ``lsh_knn``/``ivf_knn``.
    """
    import numpy as np

    books = pq_train_codebooks(corpus, m=m, n_codes=n_codes, vec_col=vec_col, id_col=id_col)
    sub = books.shape[2]
    sc = corpus.sparkSession.sparkContext
    b_books = sc.broadcast(books)

    # Queries are the small side (same broadcast contract as every kNN
    # here): collect once, precompute per-query ADC tables driver-side,
    # broadcast tables — not vectors — to the scan.
    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    q_mat = q_mat / np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    # tables[q, j, c] = <query_q subvector j, codebook[j][c]>
    tables = np.einsum("qjs,jcs->qjc", q_mat.reshape(len(q_mat), m, sub), books)
    b_tables = sc.broadcast(tables)
    b_qids = sc.broadcast(q_ids)

    def encode_and_score(batches):
        import pandas as pd

        bks = b_books.value
        tbl = b_tables.value
        qids = b_qids.value
        for pdf in batches:
            if not len(pdf):
                continue
            block = np.array(list(pdf[vec_col]), dtype=np.float64)
            block = block / np.maximum(
                np.linalg.norm(block, axis=1, keepdims=True), 1e-12
            )
            n = len(block)
            blocks = block.reshape(n, m, sub)
            # encode: per subspace, nearest codeword (L2)
            codes = np.empty((n, m), dtype=np.int64)
            recon_sq = np.zeros(n)
            for j in range(m):
                d2 = ((blocks[:, j, None, :] - bks[None, j]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d2, axis=1)
                recon_sq += (bks[j][codes[:, j]] ** 2).sum(axis=1)
            recon_norm = np.maximum(np.sqrt(recon_sq), 1e-12)
            # ADC: gather m table entries per (query, row), normalize by
            # the reconstructed corpus norm (queries are unit-norm)
            j_idx = np.arange(m)
            sims = (
                tbl[:, j_idx[None, :], codes[:, :]].sum(axis=2) / recon_norm[None, :]
            )  # (Q, n)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            # per-batch short list per query: bounds emitted rows
            kk = min(k * rerank_factor + 4, n)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(qids)):
                s = sims[qi]
                top = np.argpartition(-s, kk - 1)[:kk]
                for t in top:
                    if ids[t] == qids[qi]:
                        continue
                    out_q.append(qids[qi])
                    out_n.append(ids[t])
                    out_s.append(round(float(s[t]), 4))
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "adc_sim": out_s}
            )

    cand = corpus.select(id_col, vec_col).mapInPandas(
        encode_and_score, schema="query_id bigint, neighbor_id bigint, adc_sim double"
    )
    w_adc = W.partitionBy("query_id").orderBy(
        F.col("adc_sim").desc(), F.col("neighbor_id").asc()
    )
    short_list = (
        cand.withColumn("_adc_rank", F.row_number().over(w_adc))
        .filter(F.col("_adc_rank") <= k * rerank_factor)
        .select("query_id", "neighbor_id")
    )
    # Exact re-rank: fetch true vectors for the tiny candidate set (the
    # candidate side broadcasts into the corpus scan), score against the
    # broadcast query vectors with full-precision cosine.
    c_vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec")
    )
    q_vecs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    rescored = (
        c_vecs.join(F.broadcast(short_list), "neighbor_id")
        .join(F.broadcast(q_vecs), "query_id")
        .withColumn("cos_sim", NR.round4(cosine(F.col("_qvec"), F.col("_cvec"))))
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


def hard_negative_mining(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 8,
    sim_lo: float = 0.2,
    sim_hi: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Contrastive-training pair mining: for each anchor, the top-k
    MOST similar vectors whose cosine falls inside [sim_lo, sim_hi) —
    similar enough to be informative negatives, below the near-dup
    ceiling so no positive leaks into the negative set (the standard
    hard-negative recipe for embedding/retriever training, e.g. DPR,
    Karpukhin et al. 2020). Returns (query_id, neighbor_id, cos_sim,
    rank) with the same determinism contract as ``brute_force_knn``
    (rounded similarity, neighbor-id tie-break).

    Scale: one broadcast of the anchor set over a single corpus scan +
    a per-anchor WindowGroupLimit top-k — identical cost shape to
    brute-force kNN; swap the scan for an ANN candidate fetch
    (IVFIndex.search with a wider k, then band-filter) when the corpus
    outgrows full scans."""
    q = anchors.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos_sim", NR.round4(cosine(F.col("_qvec"), F.col("_cvec"))))
        .filter((F.col("cos_sim") >= sim_lo) & (F.col("cos_sim") < sim_hi))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("bigint").alias("rank"))
    )
