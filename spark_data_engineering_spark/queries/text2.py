"""Second text-analysis batch: TF-IDF, vocabulary statistics, embedding
centroids — the feature-engineering queries of a training-data pipeline."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_data_engineering_spark.functions import numeric as NR
from spark_data_engineering_spark.materialize import materialize
from spark_data_engineering_spark.registry import query
from spark_data_engineering_spark.sources import load_table


@query(
    "vocab_top_tokens",
    oracle="""
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS tf,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
    FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY tf DESC, token ASC
    LIMIT 20
    """,
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: term + document frequency, top-20. explode ->
    one aggregation (tf and df together) -> TakeOrderedAndProject."""
    d = load_table(spark, "documents", sf_dir)
    tokens = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    return (
        tokens.groupBy("token")
        .agg(F.count("*").alias("tf"), F.countDistinct("doc_id").alias("df"))
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(20)
    )


@query(
    "tfidf_top_terms",
    oracle="""
    WITH tokens AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM tokens GROUP BY doc_id, token
    ),
    df AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, token,
           FLOOR((tf * LN(n_docs / df)) * 10000 + 0.5) / 10000 AS tfidf,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT tf.doc_id, tf.token,
               tf.tf, df.df, n.n_docs,
               ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY FLOOR((tf.tf * LN(n.n_docs / df.df)) * 10000 + 0.5) / 10000 DESC,
                            tf.token ASC) AS rnk
        FROM tf JOIN df USING (token) CROSS JOIN n
    )
    WHERE rnk <= 3 AND doc_id < 50
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF (raw tf x ln(N/df)) with top-3 terms per document
    (restricted to doc_id < 50 to keep the gate output bounded).
    Three aggregations + one broadcast join; the window partitions by
    doc — all shuffles keyed and partial-agg friendly."""
    d = load_table(spark, "documents", sf_dir)
    n_docs = d.count()
    tokens = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tokens.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tokens.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df), "token").withColumn(
        "tfidf", NR.round4(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")))
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter((F.col("rnk") <= 3) & (F.col("doc_id") < 50))
        .select("doc_id", "token", "tfidf", F.col("rnk").cast("bigint").alias("rnk"))
    )


@query(
    "label_centroids",
    oracle="""
    SELECT label,
           CAST(pos AS INT) AS pos,
           FLOOR((AVG(val)) * 10000 + 0.5) / 10000 AS mean_val,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM (
        SELECT label,
               UNNEST(RANGE(LEN(embedding))) AS pos,
               UNNEST(CAST(embedding AS DOUBLE[])) AS val
        FROM embeddings
    )
    GROUP BY label, pos
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid, flattened to (label, pos, mean):
    posexplode -> one aggregation keyed by (label, dimension). The
    vector-aggregation shape every embedding pipeline needs (cluster
    centers, class prototypes)."""
    emb = load_table(spark, "embeddings", sf_dir)
    exploded = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "val")
    )
    return exploded.groupBy("label", "pos").agg(
        NR.round4(F.avg("val")).alias("mean_val"), F.count("*").alias("n_vectors")
    )


@query(
    "heavy_hitter_tokens",
    oracle="""
    WITH tokens AS (
        SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
    ),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM tokens)
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS tf,
           (COUNT(*) > (SELECT total FROM n) / 200.0) AS guaranteed
    FROM tokens
    GROUP BY token
    ORDER BY tf DESC, token ASC
    LIMIT 20
    """,
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a distributed Misra-Gries(200) sketch
    (operators/sketches.py) + exact recount of only the candidate keys
    — the bounded-memory pattern for top-k over an unbounded token
    domain. Exactness is PROVEN at runtime, not assumed: MG guarantees
    every token with tf > n/201 is a candidate, so if the recounted
    20th-largest candidate count exceeds n/201, no non-candidate can
    belong in the top-20 and the candidate-bounded result equals the
    exact top-20; when that margin check fails (flat distributions
    where rank-20 sits under the presence bound), the query falls back
    to the full exact aggregation — either way the exact SQL oracle
    must hash-match. ``guaranteed`` marks tokens above the n/200
    threshold on BOTH sides from exact counts. At 100 TB: two scans —
    one Arrow sketch pass carrying k counters AND the row count n (no
    separate count job), one recount aggregating ~k keys instead of
    the whole vocabulary."""
    from spark_data_engineering_spark.operators.sketches import (
        exact_topk_via_sketch,
        misra_gries_summary,
    )

    d = load_table(spark, "documents", sf_dir)
    tokens = d.select(F.explode(F.split("text", " ")).alias("token"))
    mg = misra_gries_summary(tokens, "token", k=200)
    base = exact_topk_via_sketch(tokens, "token", mg, topk=20)
    return (
        base.withColumn("guaranteed", F.col("tf") > F.lit(mg.n) / 200.0)
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(20)
    )


@query(
    "token_run_lengths",
    oracle="""
    WITH t AS (
        SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents
    ),
    u AS (
        SELECT doc_id, UNNEST(toks) AS token,
               GENERATE_SUBSCRIPTS(toks, 1) AS i
        FROM t
    ),
    g AS (
        SELECT doc_id, token, i,
               i - ROW_NUMBER() OVER (PARTITION BY doc_id, token ORDER BY i) AS grp
        FROM u
    )
    SELECT doc_id,
           CAST(MIN(i) AS BIGINT) AS start_idx,
           CAST(COUNT(*) AS BIGINT) AS run_len,
           token
    FROM g
    GROUP BY doc_id, token, grp
    HAVING COUNT(*) >= 2
    """,
)
def token_run_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal runs of consecutively-repeated tokens (>=2) per document
    — the stutter/repetition signal Gopher-style quality filters cut on
    — computed with a Spark 4 Python UDTF (Arrow-optimized) applied via
    SQL LATERAL: the run detection is a single forward pass per
    document, the shape that's imperative-natural and awkward as SQL
    (the oracle replays it relationally as gaps-and-islands:
    index minus per-token row_number groups each run). One Generate
    over the corpus, no shuffle at all until a consumer aggregates;
    the UDTF is the LAST per-row Python tier the engine exposes
    (scalar Pandas UDFs, grouped/cogrouped applyInPandas, mapInPandas,
    stateful transformWithState being the others — all covered
    elsewhere in this repo)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="start_idx bigint, run_len bigint, token string", useArrow=True)
    class TokenRuns:
        def eval(self, text: str):
            toks = (text or "").split(" ")
            i = 0
            while i < len(toks):
                j = i
                while j + 1 < len(toks) and toks[j + 1] == toks[i]:
                    j += 1
                if j > i:
                    yield i + 1, j - i + 1, toks[i]  # 1-based start
                i = j + 1

    spark.udtf.register("token_runs", TokenRuns)
    docs = load_table(spark, "documents", sf_dir)
    docs.createOrReplaceTempView("_docs_for_runs")
    return spark.sql(
        """SELECT d.doc_id, r.start_idx, r.run_len, r.token
           FROM _docs_for_runs d, LATERAL token_runs(d.text) r"""
    )


_CMS_D = 4
_CMS_W = 2048


@query(
    "cms_token_frequencies",
    oracle=f"""
    WITH tokens AS (
        SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
    ),
    hashed AS (
        SELECT token, r,
               CAST(('0x' || SUBSTR(MD5('cms' || CAST(r AS VARCHAR) || ':' || token), 1, 8))
                    AS BIGINT) % {_CMS_W} AS c
        FROM tokens CROSS JOIN RANGE({_CMS_D}) g(r)
    ),
    cells AS (
        SELECT r, c, COUNT(*) AS cnt FROM hashed GROUP BY r, c
    ),
    top10 AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tokens GROUP BY token
        ORDER BY tf DESC, token ASC LIMIT 10
    ),
    probes AS (
        SELECT t.token, t.tf, g.r,
               CAST(('0x' || SUBSTR(MD5('cms' || CAST(g.r AS VARCHAR) || ':' || t.token), 1, 8))
                    AS BIGINT) % {_CMS_W} AS c
        FROM top10 t CROSS JOIN RANGE({_CMS_D}) g(r)
    )
    SELECT p.token, p.tf,
           CAST(MIN(cells.cnt) AS BIGINT) AS cms_est,
           (MIN(cells.cnt) >= p.tf) AS no_underestimate
    FROM probes p JOIN cells ON cells.r = p.r AND cells.c = p.c
    GROUP BY p.token, p.tf
    """,
)
def cms_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CountMin sketch point-frequency estimation (Cormode &
    Muthukrishnan 2005 — public method): a {_CMS_D}x{_CMS_W} counter
    grid built in ONE shuffled aggregation over the exploded token
    stream (each token increments one cell per hash row; cells are
    plain per-(row,cell) counts, so partial map-side aggregation makes
    the sketch mergeable across partitions — and across corpora, by
    adding grids). Estimates for the exact top-10 tokens come from a
    broadcast join against the 8k-cell grid; CountMin never
    underestimates, checked per row on BOTH sides
    (``no_underestimate``). Hash rows are seeded md5 prefixes, so the
    DuckDB oracle rebuilds the identical sketch and the whole report
    hash-matches — the sketch complement to Misra-Gries
    (``heavy_hitter_tokens``): MG answers "which keys are heavy", CMS
    answers "how often is THIS key", in {_CMS_D}x{_CMS_W} integers
    regardless of vocabulary size."""
    d = load_table(spark, "documents", sf_dir)
    tokens = d.select(F.explode(F.split("text", " ")).alias("token"))

    def _cell(tok_col, r_col):
        h = F.md5(
            F.concat(
                F.lit("cms"), r_col.cast("string"), F.lit(":"), tok_col
            ).cast("binary")
        )
        return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _CMS_W

    rs = F.explode(F.array(*[F.lit(r) for r in range(_CMS_D)])).alias("r")
    # r13 optimization (guide §2.3 — aggregate before you multiply): a
    # cell's count is the number of token OCCURRENCES hashing into it,
    # which equals the tf-weighted sum over DISTINCT tokens:
    # cnt(r,c) = Σ_token tf(token)·[cell(r,token)=c]. So build the word-
    # frequency table once (vocab rows, not occurrence rows), hash each
    # distinct token 4x instead of each occurrence 4x, and SUM(tf) into
    # cells — identical counters, ~20x fewer md5s at sf0.1, and the tf
    # table is shared with the top-10 side (one scan+explode instead of
    # two). At corpus scale this is the standard persisted-wordcount
    # shape; the materialize pins the shared frame for both consumers.
    tf_tab = (
        tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .transform(materialize)
    )
    hashed = tf_tab.select("token", "tf", rs).select(
        "r", _cell(F.col("token"), F.col("r")).alias("c"), "tf"
    )
    cells = hashed.groupBy("r", "c").agg(F.sum("tf").alias("cnt"))
    top10 = tf_tab.orderBy(F.col("tf").desc(), F.col("token").asc()).limit(10)
    probes = top10.select(
        "token", "tf", rs
    ).select("token", "tf", "r", _cell(F.col("token"), F.col("r")).alias("c"))
    return (
        probes.join(F.broadcast(cells), ["r", "c"])
        .groupBy("token", "tf")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "token",
            "tf",
            "cms_est",
            (F.col("cms_est") >= F.col("tf")).alias("no_underestimate"),
        )
    )


# Pinned at sf0.01 (the driver gate's scale): BPE learning is a pure
# function of the word-frequency table (deterministic tie-breaks), so
# the top-20 subword counts are corpus constants — the ann_recall_report
# expectation pattern. tests/test_bpe.py re-derives them structurally.
_BPE_EXPECTED_SF001 = """
    SELECT subword, CAST(n AS BIGINT) AS n
    FROM (VALUES
        ('a', 7259), ('l', 5525), ('s', 5481), ('</w>', 5366),
        ('c', 4653), ('m', 4602), ('e</w>', 4473), ('t', 3593),
        ('er</w>', 2779), ('ow</w>', 2747), ('o', 2746), ('d', 2732),
        ('b', 2721), ('r', 2709), ('u', 2709), ('g', 2697),
        ('e', 2696), ('or', 2696), ('st', 2676), ('h</w>', 1884)
    ) t(subword, n)
    """


@query("bpe_subword_stats", oracle=_BPE_EXPECTED_SF001)
def bpe_subword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword tokenization end-to-end (operators/bpe.py): learn 20 BPE
    merges from the distributed word-frequency table (vocabulary-sized
    bounded collect — the split every production tokenizer trainer
    uses), apply them in one Arrow pass with per-batch distinct-token
    caching, and report the top-20 subwords by count. Deterministic
    ties make the whole pipeline a corpus constant, pinned as the
    oracle at the gate's sf0.01."""
    from spark_data_engineering_spark.operators.bpe import bpe_subwords, learn_bpe

    d = load_table(spark, "documents", sf_dir)
    wf = sorted(
        (r["token"], r["n"])
        for r in d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()  # bounded: one row per DISTINCT word (vocab-sized)
    )
    merges = learn_bpe(wf, 20)
    return (
        bpe_subwords(d, merges)
        .groupBy("subword")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("subword").asc())
        .limit(20)
    )


@query(
    "bigram_fluency_scores",
    oracle="""
    WITH toks AS (
        SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w,
               GENERATE_SUBSCRIPTS(STRING_SPLIT(text, ' '), 1) AS i
        FROM documents
    ),
    bg AS (
        SELECT a.doc_id, a.w AS w1, b.w AS w2
        FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
    ),
    uni AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
    bi AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
    v AS (
        SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS vocab FROM toks
    )
    SELECT bg.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           FLOOR((AVG((bi.c2 + 1.0) / (uni.c1 + (SELECT vocab FROM v))))
                 * 1000000 + 0.5) / 1000000 AS mean_cond_prob
    FROM bg
    JOIN bi ON bg.w1 = bi.w1 AND bg.w2 = bi.w2
    JOIN uni ON bg.w1 = uni.w1
    GROUP BY bg.doc_id
    """,
)
def bigram_fluency_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model fluency scoring WITHOUT logs — the corpus-LM
    quality heuristic (a KenLM-perplexity stand-in) kept oracle-exact:
    train add-1-smoothed bigram conditional probabilities on the corpus
    itself, then score each document by the ARITHMETIC mean of
    P(w_i | w_{i-1}) over its bigrams. Geometric means need ln()
    (cross-engine poison — module float policy); the arithmetic mean
    ranks fluency the same way for filtering purposes and every term is
    a ratio of integers, so round-6 makes the hash exact. Two
    partial-agg shuffles (bigram + unigram counts) + one broadcastable
    vocab scalar; scoring joins are keyed on the bigram."""
    d = load_table(spark, "documents", sf_dir)
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i", "w")
    )
    w = W.partitionBy("doc_id").orderBy("i")
    bg = (
        toks.withColumn("w2", F.lead("w").over(w))
        .filter(F.col("w2").isNotNull())
        .select("doc_id", F.col("w").alias("w1"), "w2")
    )
    uni = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    bi = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    vocab = toks.agg(F.countDistinct("w").alias("vocab"))
    return (
        bg.join(bi, ["w1", "w2"])
        .join(F.broadcast(uni), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            NR.round6(
                F.avg(
                    (F.col("c2") + F.lit(1.0))
                    / (F.col("c1") + F.col("vocab"))
                )
            ).alias("mean_cond_prob"),
        )
    )
