"""Persisted inverted text index — build-once/search-many BM25.

``bm25_keyword_search`` (queries/retrieval.py) is the full-scan form:
correct, but every query pays a corpus scan. This is the indexed form —
the text twin of the persisted ANN indexes (operators/ann_index.py).

Layout: ONE TxnTable holding two row kinds —
``('p', term, doc_id, tf, dl)`` postings and
``('l', NULL, doc_id, NULL, dl)`` doc-length rows — range-clustered by
(kind, term) so doc-length rows pack into their own files and every
postings file covers a tight [min,max] term box. One table means every
build/ingest is ONE atomic commit: there is no instant (and no crash
state) at which a search can see postings without their corpus stats or
vice versa — the torn-index hazard a postings+lengths table pair has by
construction.

- ``search`` plans from commit-log footer stats
  (``TxnTable.read(prune=...)``): only the query terms' postings files
  and the doc-length files are ever opened — the IVF cell-filter
  pattern. Corpus stats (n_docs, avgdl) and per-term df are computed
  from the fetched rows at query time, so ingest can never leave a
  stale sidecar.
- ``ingest`` appends new documents' rows without rebuilding; with
  ``(app_id, epoch_id)`` it is exactly-once
  (``TxnTable.append_idempotent`` — a redelivered micro-batch commits
  nothing).

Scoring is the same log-free BM25 variant as the full-scan query
(rational idf — every op exactly-rounded IEEE; see retrieval.py module
docstring), with per-term contributions added in the same fixed order
and absent terms contributing an exact 0.0 — so an index search must
hash-match the full-scan oracle bit for bit. At 100 TB: the build is
one tokenize + one range shuffle; a search touches O(postings of the
query terms + doc-length rows), not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_data_engineering_spark.functions import numeric as NR
from spark_data_engineering_spark.sources.txn import TxnTable

_K1 = 1.2
_B = 0.75


class TextIndex:
    def __init__(self, root: str) -> None:
        self.root = root
        self.table = TxnTable(root, "text_index")

    @staticmethod
    def _rows(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
        """Postings + doc-length rows for a document batch, clustered by
        (kind, term): 'l' rows sort before 'p' rows, so lengths pack
        into their own files and postings files get tight term boxes."""
        toks = F.split(F.col(text_col), " ")
        base = docs.select(
            F.col(id_col).cast("bigint").alias("doc_id"),
            toks.alias("toks"),
            F.size(toks).cast("double").alias("dl"),
        )
        postings = (
            base.select("doc_id", "dl", F.explode("toks").alias("term"))
            .groupBy("term", "doc_id", "dl")
            .agg(F.count("*").cast("double").alias("tf"))
            .select(
                F.lit("p").alias("kind"), "term", "doc_id", "tf", "dl"
            )
        )
        lengths = base.select(
            F.lit("l").alias("kind"),
            F.lit(None).cast("string").alias("term"),
            "doc_id",
            F.lit(None).cast("double").alias("tf"),
            "dl",
        )
        return postings.unionByName(lengths)

    @classmethod
    def build(
        cls,
        docs: DataFrame,
        root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_files: int = 16,
    ) -> "TextIndex":
        idx = cls(root)
        rows = cls._rows(docs, id_col, text_col)
        clustered = rows.repartitionByRange(
            n_files, "kind", "term"
        ).sortWithinPartitions("kind", "term", "doc_id")
        idx.table.overwrite(clustered)  # one atomic commit
        return idx

    def ingest(
        self,
        new_docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        app_id: str | None = None,
        epoch_id: int | None = None,
    ) -> None:
        """Append new documents' postings + length rows in ONE atomic
        commit — a search sees all of a batch or none of it, crash or
        not. Exactly-once with (app_id, epoch_id)."""
        rows = self._rows(new_docs, id_col, text_col)
        if app_id is not None and epoch_id is not None:
            self.table.append_idempotent(rows, app_id, epoch_id)
        else:
            self.table.append(rows)

    def search(
        self, spark: SparkSession, terms: tuple[str, ...], k: int = 20
    ) -> DataFrame:
        """Top-k BM25 over the indexed corpus for ``terms``. Plans from
        commit-log footer stats: only the query terms' postings files
        and the doc-length files are opened.

        Contract: only documents matching AT LEAST ONE query term are
        ranked (standard IR semantics — a zero-score doc is not a
        result), so when fewer than ``k`` docs match, fewer than ``k``
        rows come back. The full-scan twins mirror this exactly with
        ``WHERE tf0+..+tfN > 0`` (queries/retrieval.py:_bm25_oracle), so
        the bit-for-bit hash-match holds at every match count, including
        the sparse-term regime (tests/test_text_index.py covers a
        fewer-matches-than-k corpus). Callers who want zero-padded
        rankings must left-join the lengths table themselves — padding
        here would cost an n_docs-wide join on every search for
        semantics no retrieval consumer wants."""
        if not terms:
            raise ValueError("search: need at least one term")
        if len(set(terms)) != len(terms):
            raise ValueError(f"search: duplicate terms in {terms!r}")
        lo, hi = min(terms), max(terms)
        # 'l' rows have term=NULL -> no term stats recorded for pure
        # length files; they are conservatively kept by prune_files, and
        # the kind prune drops pure-postings files for the lengths side
        hits = self.table.read(spark, prune={"term": (lo, hi)}).filter(
            (F.col("kind") == "p") & F.col("term").isin(list(terms))
        )
        lengths = self.table.read(spark, prune={"kind": ("l", "l")}).filter(
            F.col("kind") == "l"
        )
        stats = lengths.agg(
            F.count("*").cast("double").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
        # per-doc tf columns in the SAME fixed term order as the
        # full-scan query; a doc missing a term gets an exact 0.0
        per_doc = hits.groupBy("doc_id").agg(
            F.first("dl").alias("dl"),
            *[
                F.coalesce(
                    F.sum(F.when(F.col("term") == t, F.col("tf"))), F.lit(0.0)
                ).alias(f"tf{i}")
                for i, t in enumerate(terms)
            ],
        )
        dfs = hits.groupBy().pivot("term", list(terms)).agg(
            F.countDistinct("doc_id").cast("double")
        )
        dfs = dfs.select(
            *[
                F.coalesce(F.col(f"`{t}`"), F.lit(0.0)).alias(f"df{i}")
                for i, t in enumerate(terms)
            ]
        )
        j = per_doc.crossJoin(F.broadcast(stats)).crossJoin(F.broadcast(dfs))
        per_term = [
            (
                (F.col("n_docs") - F.col(f"df{i}") + F.lit(0.5))
                / (F.col(f"df{i}") + F.lit(0.5))
            )
            * (
                F.col(f"tf{i}")
                * (_K1 + 1.0)
                / (F.col(f"tf{i}") + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl")))
            )
            for i in range(len(terms))
        ]
        score = per_term[0]
        for p in per_term[1:]:
            score = score + p  # fixed left-to-right order, like the oracle
        scored = j.select("doc_id", NR.round4(score).alias("bm25"))
        w = W.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("doc_id", "bm25", F.col("rank").cast("bigint").alias("rank"))
        )
