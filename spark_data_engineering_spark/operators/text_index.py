"""Persisted inverted text index — build-once/search-many BM25.

``bm25_keyword_search`` (queries/retrieval.py) is the full-scan form:
correct, but every query pays a corpus scan. This is the indexed form —
the text twin of the persisted ANN indexes (operators/ann_index.py):

- ``build`` tokenizes once and writes a POSTINGS TxnTable
  ``(term, doc_id, tf, dl)`` range-clustered and sorted by term, so
  every parquet file covers a tight [min,max] term box, plus a skinny
  DOC-LENGTHS TxnTable ``(doc_id, dl)`` for corpus stats.
- ``search`` reads ONLY the query terms' postings (the term predicate
  prunes on footer stats exactly like the IVF cell filter) and one
  column-pruned aggregate over the lengths table for (n_docs, avgdl).
  df per term falls out of the fetched postings themselves.
- ``ingest`` appends new documents' postings + lengths without
  rebuilding; stats are computed at query time FROM the tables, so
  every search sees exactly the ingested corpus — no stale sidecar.
  With (app_id, epoch_id) both appends are exactly-once.

Scoring is the same log-free BM25 variant as the full-scan query
(rational idf — every op exactly-rounded IEEE; see retrieval.py module
docstring), with per-term contributions added in the same fixed order
and absent terms contributing an exact 0.0 — so an index search must
hash-match the full-scan oracle bit for bit. At 100 TB: the build is
one tokenize + one term-range shuffle; a search touches
O(postings of the query terms), not the corpus.
"""

from __future__ import annotations

import os

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
        self.postings = TxnTable(root, "postings")
        self.lengths = TxnTable(root, "doc_lengths")

    @staticmethod
    def _tokenize(docs: DataFrame, id_col: str, text_col: str):
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
            .select("term", "doc_id", "tf", "dl")
        )
        lengths = base.select("doc_id", "dl")
        return postings, lengths

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        docs: DataFrame,
        root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n_files: int = 16,
    ) -> "TextIndex":
        idx = cls(root)
        postings, lengths = cls._tokenize(docs, id_col, text_col)
        clustered = postings.repartitionByRange(n_files, "term").sortWithinPartitions(
            "term", "doc_id"
        )
        idx.postings.overwrite(clustered)
        idx.lengths.overwrite(lengths)
        return idx

    def ingest(
        self,
        spark: SparkSession,
        new_docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        app_id: str | None = None,
        epoch_id: int | None = None,
    ) -> None:
        """Append new documents' postings + lengths. Exactly-once with
        (app_id, epoch_id): both tables use the same watermark, so a
        replayed micro-batch commits to neither."""
        postings, lengths = self._tokenize(new_docs, id_col, text_col)
        if app_id is not None and epoch_id is not None:
            self.postings.append_idempotent(postings, f"{app_id}:postings", epoch_id)
            self.lengths.append_idempotent(lengths, f"{app_id}:lengths", epoch_id)
        else:
            self.postings.append(postings)
            self.lengths.append(lengths)

    def search(
        self, spark: SparkSession, terms: tuple[str, ...], k: int = 20
    ) -> DataFrame:
        """Top-k BM25 over the indexed corpus for ``terms``. Reads only
        those terms' postings (term-clustered files prune on footer
        stats) + one skinny lengths aggregate."""
        stats = self.lengths.read(spark).agg(
            F.count("*").cast("double").alias("n_docs"),
            F.avg("dl").alias("avgdl"),
        )
        hits = self.postings.read(spark).filter(F.col("term").isin(list(terms)))
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
