"""Dedup queries over the documents table, wired to the registry."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_data_engineering_spark.operators import dedup as D
from spark_data_engineering_spark.registry import query
from spark_data_engineering_spark.sources import load_table
from spark_data_engineering_spark.materialize import materialize

# Exact pairwise Jaccard on word 3-gram shingles, as one SQL statement —
# shared by the exact query and (as verification target) the LSH query.
_JACCARD_SQL = """
    WITH sh AS (
        SELECT doc_id,
               UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
                   RANGE(LEN(STRING_SPLIT(text, ' ')) - 2),
                   i -> STRING_SPLIT(text, ' ')[i + 1] || ' ' ||
                        STRING_SPLIT(text, ' ')[i + 2] || ' ' ||
                        STRING_SPLIT(text, ' ')[i + 3]))) AS shingle
        FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           FLOOR((CAST(i AS DOUBLE) / (sa.sz + sb.sz - i)) * 10000 + 0.5) / 10000 AS jaccard
    FROM inter
    JOIN sizes sa ON id_a = sa.doc_id
    JOIN sizes sb ON id_b = sb.doc_id
    WHERE FLOOR((CAST(i AS DOUBLE) / (sa.sz + sb.sz - i)) * 10000 + 0.5) / 10000 >= 0.8
"""


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS fp,
           CAST(MIN(doc_id) AS BIGINT) AS keep_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5 fingerprint groupBy, min doc_id kept."""
    return D.exact_duplicates(load_table(spark, "documents", sf_dir))


@query("ngram_jaccard_pairs", oracle=_JACCARD_SQL)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs: word 3-gram Jaccard ≥ 0.8 via shingle
    inverted-index self-join."""
    return D.jaccard_pairs(load_table(spark, "documents", sf_dir), threshold=0.8)


@query("jaccard_prefix_pairs", oracle=_JACCARD_SQL)
def jaccard_prefix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.8 pairs via PREFIX FILTERING (round 6;
    operators/dedup.py::jaccard_pairs_prefix) — the exact-tier scale
    path: only each doc's canonically-rarest shingles enter the
    self-join (lossless for the threshold, so the result hash-matches
    the SAME brute-force oracle as ngram_jaccard_pairs), cutting the
    df^2 hot-shingle cost the plain inverted-index join pays; exact
    verification then touches candidate pairs only. Candidate-reduction
    and equality-with-unfiltered are pytest-pinned."""
    return D.jaccard_pairs_prefix(load_table(spark, "documents", sf_dir), threshold=0.8)


@query("minhash_lsh_pairs", oracle=_JACCARD_SQL)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) + LSH(8 bands × 4 rows) candidates, exact-verified at
    Jaccard ≥ 0.8 — the linear-scale dedup path. Oracle is the exact
    pairwise Jaccard: at this corpus's similarity profile (planted dups
    at J≈0.99) banded-LSH recall is ~1, so results coincide; a recall
    miss would surface as a correctness diff, which is exactly what we
    want measured."""
    return D.minhash_lsh_dedup(load_table(spark, "documents", sf_dir), threshold=0.8)


def _simhash_oracle(bits: int = 48, band_bits: int = 12, max_hamming: int = 3) -> str:
    """Replay the full simhash pipeline in SQL: shingles -> 48-bit md5
    feature hash (hex digits parsed positionally — every term is < 2^48,
    exact in doubles) -> per-bit majority votes -> signature -> banded
    self-join -> hamming filter. Generated, because 48 vote columns are
    not something to hand-write."""
    votes = ",\n               ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(bits)
    )
    sig = " + ".join(f"(CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(bits))
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    return f"""
    WITH sh AS (
        SELECT doc_id AS _id,
               UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
                   RANGE(LEN(STRING_SPLIT(text, ' ')) - 2),
                   i -> STRING_SPLIT(text, ' ')[i + 1] || ' ' ||
                        STRING_SPLIT(text, ' ')[i + 2] || ' ' ||
                        STRING_SPLIT(text, ' ')[i + 3]))) AS shingle
        FROM documents
    ),
    hashed AS (
        SELECT _id,
               CAST(LIST_SUM(LIST_TRANSFORM(RANGE(1, 13),
                   j -> (STRPOS('0123456789abcdef', SUBSTR(MD5(shingle), j, 1)) - 1)
                        * POWER(16, 12 - j))) AS BIGINT) AS h
        FROM sh
    ),
    votes AS (SELECT _id,
               {votes}
              FROM hashed GROUP BY _id),
    sigs AS (SELECT _id, CAST({sig} AS BIGINT) AS sig FROM votes),
    banded AS (
        SELECT _id, sig, band, (sig >> (band * {band_bits})) & {mask} AS bkey
        FROM sigs CROSS JOIN (SELECT UNNEST(RANGE(0, {n_bands})) AS band) nb
    )
    SELECT DISTINCT l._id AS id_a, r._id AS id_b,
           CAST(BIT_COUNT(XOR(l.sig, r.sig)) AS INT) AS hamming
    FROM banded l JOIN banded r
      ON l.band = r.band AND l.bkey = r.bkey AND l._id < r._id
    WHERE BIT_COUNT(XOR(l.sig, r.sig)) <= {max_hamming}
    """


@query("simhash_near_pairs", oracle=_simhash_oracle())
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(48-bit, 12-bit bands) near-dup pairs at hamming ≤ 3 — the
    banding guarantees exact recall (pigeonhole: hamming < #bands). Uses
    the md5_48 feature hash so the oracle can replay the signatures
    bit-for-bit in SQL; the operator's xxhash64 default is the faster
    production path (same algorithm, different feature hash)."""
    return D.simhash_near_pairs(load_table(spark, "documents", sf_dir), hash_fn="md5_48")


@query(
    "dedup_clusters",
    oracle="""
    WITH RECURSIVE
    pairs AS (
        SELECT id_a, id_b FROM (""" + _JACCARD_SQL + """)
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ),
    reach(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.src, r.label
        FROM edges e JOIN reach r ON e.dst = r.node
    )
    SELECT node AS doc_id, CAST(MIN(label) AS BIGINT) AS cluster_id
    FROM reach GROUP BY node
    """,
)
def dedup_clusters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup clustering: near-dup pairs (Jaccard >= 0.8) ->
    connected components via iterative min-label propagation (the
    'duplicates are transitive' post-step every dedup pipeline needs).
    Oracle: DuckDB recursive CTE computing the same reachability
    closure."""
    docs = load_table(spark, "documents", sf_dir)
    pairs = D.jaccard_pairs(docs, threshold=0.8)
    return D.dedup_clusters(pairs, docs)


@query(
    "dedup_keep_best",
    oracle="""
    WITH RECURSIVE
    pairs AS (
        SELECT id_a, id_b FROM (""" + _JACCARD_SQL + """)
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ),
    reach(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.src, r.label
        FROM edges e JOIN reach r ON e.dst = r.node
    ),
    clus AS (
        SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node
    ),
    t AS (
        SELECT doc_id,
               LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_tokens
        FROM documents
    )
    SELECT c.doc_id,
           CAST(c.cluster_id AS BIGINT) AS cluster_id,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           (ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                               ORDER BY t.n_tokens DESC, c.doc_id ASC) = 1) AS keep
    FROM clus c JOIN t ON c.doc_id = t.doc_id
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-BEST-per-cluster dedup — the curation policy refinement of
    keep-min-id: near-dup clusters (3-gram Jaccard >= 0.8 -> connected
    components, same machinery as ``dedup_clusters``) each keep their
    most complete member (highest whitespace token count, doc_id
    tie-break) instead of the arbitrary smallest id. This is how
    production corpus dedup actually picks survivors (quality-ranked
    representatives); any deterministic quality score slots into the
    same window. One extra shuffle over dedup_clusters (the per-cluster
    rank); clusters are near-dup groups, so partitions are tiny."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from spark_data_engineering_spark.functions import text as TX

    docs = load_table(spark, "documents", sf_dir)
    pairs = D.jaccard_pairs(docs, threshold=0.8)
    clusters = D.dedup_clusters(pairs, docs)
    toks = docs.select(
        "doc_id", TX.token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )
    w = W.partitionBy("cluster_id").orderBy(
        F.col("n_tokens").desc(), F.col("doc_id").asc()
    )
    return (
        clusters.join(toks, "doc_id")
        .withColumn("keep", F.row_number().over(w) == 1)
        .select("doc_id", "cluster_id", "n_tokens", "keep")
    )


@query(
    "containment_pairs",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
                   RANGE(LEN(STRING_SPLIT(text, ' ')) - 2),
                   i -> STRING_SPLIT(text, ' ')[i + 1] || ' ' ||
                        STRING_SPLIT(text, ' ')[i + 2] || ' ' ||
                        STRING_SPLIT(text, ' ')[i + 3]))) AS shingle
        FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_small, b.doc_id AS id_big, COUNT(*) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id != b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_small, id_big,
           FLOOR((CAST(i AS DOUBLE) / sa.sz) * 10000 + 0.5) / 10000 AS containment
    FROM inter
    JOIN sizes sa ON id_small = sa.doc_id
    WHERE FLOOR((CAST(i AS DOUBLE) / sa.sz) * 10000 + 0.5) / 10000 >= 0.9
    """,
)
def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup detection: |A∩B| / |A| >= 0.9 over 3-gram
    shingles — the subsumption case symmetric Jaccard misses (a short
    doc fully quoted inside a long one scores tiny Jaccard but
    containment ~1; Broder 1997's containment measure, the same one
    ``benchmark_contamination`` uses corpus-vs-eval, here doc-vs-doc).
    Ordered pairs (id_small is the contained side). Same inverted
    shingle-index join shape as ``ngram_jaccard_pairs`` — quadratic by
    contract, the verification tier; at scale the candidate set comes
    from MinHash/LSH first."""
    from pyspark.sql import functions as F

    from spark_data_engineering_spark.functions import numeric as NR
    from spark_data_engineering_spark.operators.dedup import shingle_index

    docs = load_table(spark, "documents", sf_dir)
    # three consumers (both join sides + sizes): materialize once
    idx = (
        shingle_index(docs, "text", "doc_id", 3)
        .select("_id", F.xxhash64("_shingle").alias("_h"))
        .transform(materialize)
    )
    sizes = idx.groupBy("_id").agg(F.count("*").alias("_sz"))
    a, b = idx.alias("a"), idx.alias("b")
    inter = (
        a.join(b, (F.col("a._h") == F.col("b._h")) & (F.col("a._id") != F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_small"), F.col("b._id").alias("id_big"))
        .agg(F.count("*").alias("_inter"))
    )
    return (
        inter.join(F.broadcast(sizes), F.col("id_small") == F.col("_id"))
        .withColumn(
            "containment",
            NR.round4(F.col("_inter").cast("double") / F.col("_sz")),
        )
        .filter(F.col("containment") >= 0.9)
        .select("id_small", "id_big", "containment")
    )


@query(
    "dedup_cluster_stats",
    oracle="""
    WITH RECURSIVE
    pairs AS (
        SELECT id_a, id_b FROM (""" + _JACCARD_SQL + """)
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ),
    reach(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.src, r.label
        FROM edges e JOIN reach r ON e.dst = r.node
    ),
    clus AS (
        SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node
    ),
    sizes AS (
        SELECT cluster_id, COUNT(*) AS csize FROM clus GROUP BY cluster_id
    )
    SELECT CAST(csize AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(csize) AS BIGINT) AS n_docs,
           CAST(SUM(csize - 1) AS BIGINT) AS n_removable
    FROM sizes
    GROUP BY csize
    """,
)
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup AUDIT report every curation run publishes before
    deleting anything: the near-dup cluster size histogram (how many
    singletons, pairs, bigger families) with per-size doc counts and
    the number of docs a keep-one policy would remove. Answers "what
    fraction of the corpus is duplicated, and in what shape" —
    e.g. many pairs = boilerplate variants, few giant clusters = one
    template gone viral, and the removable total IS the dedup savings
    estimate. Same CC machinery as ``dedup_clusters`` + two tiny
    aggregations that reuse its output partitioning."""
    from pyspark.sql import functions as F

    docs = load_table(spark, "documents", sf_dir)
    pairs = D.jaccard_pairs(docs, threshold=0.8)
    clusters = D.dedup_clusters(pairs, docs)
    sizes = clusters.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("csize"))
    return sizes.groupBy(F.col("csize").cast("bigint").alias("cluster_size")).agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("csize").alias("n_docs"),
        F.sum(F.col("csize") - 1).alias("n_removable"),
    )
