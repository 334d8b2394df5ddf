"""Deduplication operators over a document corpus.

Exact (md5 hash-groupBy), n-gram Jaccard (exact pairwise over a shingle
inverted index), MinHash+LSH (banded signature join — the 100 TB scale
path), and SimHash (bit-signature hamming buckets). All pure DataFrame
compositions of JVM built-ins: higher-order array functions + joins; no
Python UDFs, fully deterministic (hash family derived from md5).

The reference repo has no dedup operators at all — its README mentions
duplicate *checks* only, implemented as validation (SURVEY.md §2.6/§2.7).
This module is the training-data-pipeline extension surface.

Scale design:
- exact dedup: one shuffle on the fingerprint; map-side partial agg.
- shingle index: explode multiplies rows by ~tokens/doc; the self-join
  shuffles on the shingle string. At 100 TB, shingle → 64-bit hash first
  so the shuffle key is fixed-width (done here via md5→bigint).
- MinHash LSH: candidate generation joins on (band_idx, band_signature) —
  shuffle volume is #docs × #bands rows, independent of pairwise count;
  this is the operator that survives 1000× scale where exact pairwise
  Jaccard explodes quadratically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_data_engineering_spark.functions import numeric as NR

# Mersenne prime 2^31-1; hash family h_j(x) = (a_j * x + b_j) mod P with
# deterministic odd coefficients (public textbook construction,
# Broder 1997 "On the resemblance and containment of documents").
_P = 2_147_483_647


def _minhash_coeffs(num_hashes: int) -> tuple[list[int], list[int]]:
    # Deterministic coefficients from a fixed linear-congruential walk.
    a, b, coeffs_a, coeffs_b = 1_103_515_245, 12_345, [], []
    x = 42
    for _ in range(num_hashes):
        x = (a * x + b) % _P
        coeffs_a.append(x | 1)  # odd, non-zero
        x = (a * x + b) % _P
        coeffs_b.append(x)
    return coeffs_a, coeffs_b


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("_tokens", F.split(F.col(text_col), " "))


def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document as array<string>."""
    toks = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    shingle = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
    )
    return df.withColumn(
        "shingles",
        F.when(F.size(toks) >= n, F.array_distinct(F.transform(idx, shingle))).otherwise(
            F.array(F.col(text_col))
        ),
    )


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group by md5 fingerprint; keep the minimum id as the canonical doc.

    Returns (fp, keep_id, n_copies). One shuffle on the 128-bit key;
    partial aggregation makes the shuffle ~#distinct-docs rows.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


def _shingle_index(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """(id, shingle) inverted index — exploded distinct shingles."""
    return with_shingles(df, text_col, n).select(
        F.col(id_col).alias("_id"), F.explode("shingles").alias("_shingle")
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    Returns (id_a, id_b, jaccard) with id_a < id_b and round(jaccard,4)
    >= threshold. Quadratic in the worst case — the correctness baseline
    the LSH path is validated against.
    """
    idx = _shingle_index(df, text_col, id_col, n)
    sizes = idx.groupBy("_id").agg(F.count("*").alias("_sz"))
    a = idx.alias("a")
    b = idx.alias("b")
    inter = (
        a.join(b, (F.col("a._shingle") == F.col("b._shingle")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("_inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(F.broadcast(sa), F.col("id_a") == F.col("sa._id"))
        .join(F.broadcast(sb), F.col("id_b") == F.col("sb._id"))
        .withColumn(
            "jaccard",
            NR.round4(
                F.col("_inter").cast("double")
                / (F.col("sa._sz") + F.col("sb._sz") - F.col("_inter"))
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """MinHash signature per document as array<bigint>[num_hashes].

    Shingle → 32-bit int via md5 prefix (deterministic across engines),
    then k permutation-hash minima via higher-order array functions —
    entirely inside codegen, no shuffle.
    """
    ca, cb = _minhash_coeffs(num_hashes)
    shingled = with_shingles(df, text_col, n)
    hashed = shingled.withColumn(
        "_hvals",
        F.transform(
            "shingles", lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint") % _P
        ),
    )
    def _min_hasher(a: int, b: int):
        return lambda acc, h: F.least(acc, (F.lit(a) * h + F.lit(b)) % _P)

    sig_entries = [
        F.aggregate("_hvals", F.lit(_P).cast("bigint"), _min_hasher(a_j, b_j)).alias(f"_mh{j}")
        for j, (a_j, b_j) in enumerate(zip(ca, cb))
    ]
    return hashed.select(F.col(id_col).alias("_id"), F.array(*sig_entries).alias("signature"))


def lsh_candidate_pairs(signatures: DataFrame, bands: int = 8, rows: int = 4) -> DataFrame:
    """Banded LSH: docs sharing any band signature become candidates.

    Shuffle key is (band_idx, band_sig) — volume #docs × #bands, not
    quadratic. Returns distinct (id_a, id_b).
    """
    banded = signatures.select(
        "_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.concat_ws("-", F.slice("signature", i * rows + 1, rows)).alias("sig"),
                ),
            )
        ).alias("b"),
    ).select("_id", F.col("b.band").alias("band"), F.col("b.sig").alias("sig"))
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )


def minhash_lsh_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    rows: int = 4,
    threshold: float = 0.8,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signatures → banded candidates
    → exact-Jaccard verification of candidates only.

    Returns (id_a, id_b, jaccard) — same shape as ``jaccard_pairs`` but
    with candidate generation that scales linearly in corpus size.
    """
    sigs = minhash_signatures(df, text_col, id_col, n, num_hashes)
    cands = lsh_candidate_pairs(sigs, bands, rows)
    exact = jaccard_pairs(df, text_col, id_col, n, threshold=0.0)
    return (
        cands.join(exact, ["id_a", "id_b"])
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 48
) -> DataFrame:
    """SimHash bit signature per document (Charikar 2002): per bit,
    majority vote of token-hash bits; near-dup docs get hamming-close
    signatures. Returns (_id, simhash: bigint)."""
    toks = F.array_distinct(F.split(F.col(text_col), " "))
    hashed = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 12), 16, 10).cast("bigint"))

    def _bit_vote(i: int):
        # shiftrightunsigned needs a Python-int bit position, so the bit
        # loop is unrolled driver-side (bits is small and fixed).
        return lambda acc, h: acc + (F.shiftrightunsigned(h, i).bitwiseAND(F.lit(1)) * 2 - 1)

    sig = F.lit(0).cast("bigint")
    for i in range(bits):
        vote = F.aggregate(hashed, F.lit(0).cast("bigint"), _bit_vote(i))
        sig = sig + F.when(vote > 0, F.lit(1 << i).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return df.select(F.col(id_col).alias("_id"), sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 48,
    band_bits: int = 12,
    max_hamming: int = 6,
) -> DataFrame:
    """SimHash near-dup pairs: band the signature (pigeonhole — any pair
    within hamming ≤ bands-1 shares a band), join on band value, then
    exact hamming filter via bit_count(xor)."""
    sigs = simhash(df, text_col, id_col, bits)
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    band_structs = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned(F.col("simhash"), i * band_bits)
            .bitwiseAND(F.lit(mask))
            .alias("key"),
        )
        for i in range(n_bands)
    ]
    banded = sigs.select(
        "_id", "simhash", F.explode(F.array(*band_structs)).alias("b")
    ).select("_id", "simhash", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
