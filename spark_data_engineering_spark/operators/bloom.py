"""Bloom-filter join pruning — build a compact membership sketch on the
small (dim) side of a join and prune the big (fact) side BEFORE the
shuffle, then run the exact join to eliminate false positives.

This is the runtime-filter technique every warehouse engine applies to
selective star joins (Spark itself ships it as
``spark.sql.optimizer.runtime.bloomFilter.enabled`` for sort-merge
joins); the explicit operator form here covers the cases the built-in
runtime filter does not reach — pruning ahead of a Python/Arrow stage, a
persisted filter reused across queries, or a semi-join whose dim side is
above the injection threshold.

Scale shape (100 TB): the filter is built from the SMALL side — one
partial bitmap per partition (``mapInPandas``), OR-merged on the driver.
The merged bitmap is fixed-size (m/8 bytes: 1.2 MiB for 1M keys at 1%
fpp, ~120 MiB for 100M keys) and ships to executors once via the task
closure, exactly like a broadcast variable. The fact side is then
filtered with a vectorized Arrow batch test before any shuffle — at a 1%
hit rate that is a 99% reduction in shuffled bytes. Results stay EXACT:
the subsequent real join removes bloom false positives, so the operator
is safely substitutable for a plain semi/inner join (and is
SQL-oracle-able as one).

Hash consistency: both build and probe positions use the SAME
``xxhash64(lit(seed), key)`` JVM expression, so the bits set and the
bits tested agree bit-for-bit with no Python/JVM hash mismatch.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def bloom_params(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (m bits, k hashes) for the target false-positive rate:
    m = -n ln(p) / (ln 2)^2, k = (m/n) ln 2. m is rounded up to a whole
    number of 64-bit words."""
    n = max(1, expected_items)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, int(round(m / n * math.log(2))))
    return m, k


def _position(key: Column, m: int, i: int) -> Column:
    """Bit position for hash ``i`` — the single definition both build
    and probe paths use, so they can never disagree. Seeded by folding
    the per-hash literal into xxhash64's input."""
    return F.pmod(F.xxhash64(F.lit(i), key), F.lit(m))


def _positions(key: Column, m: int, k: int) -> Column:
    """k bit positions as an array<bigint>, computed JVM-side."""
    return F.array(*[_position(key, m, i) for i in range(k)])


def build_bloom(
    dim: DataFrame,
    key: str | Column,
    expected_items: int,
    fpp: float = 0.01,
) -> tuple[bytes, int, int]:
    """Aggregate the dim side's keys into one Bloom bitmap.

    One pass over the dim side: each partition packs its keys' bit
    positions into a local m-bit numpy bitmap (``mapInPandas``), the
    driver ORs the per-partition bitmaps. Driver traffic is
    #partitions x m/8 bytes — bounded by the dim side being the small
    side of the join (the reason a bloom filter helps at all).
    Returns (bitmap_bytes, m, k)."""
    m, k = bloom_params(expected_items, fpp)
    key_col = F.col(key) if isinstance(key, str) else key
    pos_df = dim.select(_positions(key_col, m, k).alias("pos"))
    n_words = m // 64

    # small dims (<=64k keys ~ 450k boxed position ints): collect the
    # JVM-computed positions directly and set bits on the driver — one
    # job, no Python-worker stage. Larger dims take the Arrow path:
    # fixed-size partial bitmaps, never n x k driver rows.
    # Gated on an ACTUAL limit-probe count, not the expected_items hint
    # (ADVICE r4): the hint sizes the bitmap but is never validated, so
    # an under-estimate on a large dim would otherwise collect n x k
    # boxed rows onto the driver. The probe short-circuits at 64k+1
    # rows, so it's one cheap early-stopping job either way.
    if (
        expected_items <= 65_536
        and dim.select(key_col).limit(65_537).count() <= 65_536
    ):
        rows = pos_df.collect()
        bitmap = np.zeros(n_words, dtype=np.uint64)
        if rows:
            flat = np.concatenate([np.asarray(r["pos"], dtype=np.int64) for r in rows])
            np.bitwise_or.at(
                bitmap, flat // 64, np.uint64(1) << (flat % 64).astype(np.uint64)
            )
        return bitmap.tobytes(), m, k

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitmap = np.zeros(n_words, dtype=np.uint64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            flat = np.concatenate([np.asarray(p, dtype=np.int64) for p in pdf["pos"]])
            words, bits = flat // 64, flat % 64
            np.bitwise_or.at(bitmap, words, np.uint64(1) << bits.astype(np.uint64))
        if seen:
            yield pd.DataFrame({"bitmap": [bitmap.tobytes()]})

    partials = pos_df.mapInPandas(pack, schema=T.StructType([
        T.StructField("bitmap", T.BinaryType())
    ])).collect()
    merged = np.zeros(n_words, dtype=np.uint64)
    for row in partials:
        merged |= np.frombuffer(row["bitmap"], dtype=np.uint64)
    return merged.tobytes(), m, k


# Bitmaps at or below this many 64-bit words (32 KiB) are inlined into
# the plan as an array literal so the membership test runs entirely in
# whole-stage codegen; larger bitmaps fall back to an Arrow batch test.
_JVM_INLINE_WORDS = 4096


def bloom_might_contain(bitmap: bytes, m: int, k: int, key: Column) -> Column:
    """Boolean membership-test column. Positions are the same JVM
    xxhash64 expressions as the build. Small bitmaps (<= 32 KiB) are
    inlined as an array<bigint> literal and tested with element_at +
    shiftright — pure JVM, stays inside whole-stage codegen, zero
    Python in the scan. Large bitmaps use a vectorized Arrow batch over
    the closure-captured numpy words (shipped per executor once, like a
    broadcast)."""
    words_arr = np.frombuffer(bitmap, dtype=np.uint64)
    if len(words_arr) <= _JVM_INLINE_WORDS:
        words_lit = F.lit([int(w) for w in words_arr.astype(np.int64)])
        # positions come from the SAME _positions() expression as the
        # build — single-sourced so build and probe can never diverge
        pos_arr = _positions(key, m, k)
        cond = F.lit(True)
        for i in range(k):
            pos = F.element_at(pos_arr, i + 1)
            word = F.element_at(words_lit, (pos / 64).cast("int") + 1)
            shift = F.pmod(pos, F.lit(64)).cast("int")
            # arithmetic >> keeps bit b of the two's-complement word, so
            # (word >> b) & 1 is correct even for "negative" int64 words
            bit = F.call_function("shiftright", word, shift).bitwiseAND(F.lit(1))
            cond = cond & (bit == 1)
        return cond

    @F.pandas_udf(T.BooleanType())
    def test(pos: pd.Series) -> pd.Series:
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        mat = np.stack([np.asarray(p, dtype=np.int64) for p in pos])
        hit = (words_arr[mat // 64] >> (mat % 64).astype(np.uint64)) & np.uint64(1)
        return pd.Series(hit.all(axis=1))

    return test(_positions(key, m, k))


_WORDS_COL = "__bloom_words__"


def bloom_prune(
    fact: DataFrame, bitmap: bytes, m: int, k: int, fact_key: str
) -> DataFrame:
    """Filter ``fact`` to rows whose key might be in the bloom set —
    the DataFrame-level form of ``bloom_might_contain``.

    Why a separate entry point: a Column-only API can express the small
    bitmap solely as an in-plan array literal, and PySpark lowers
    ``F.lit(list)`` to ``CreateArray`` — codegen then REBUILDS the whole
    m/64-word array per row (measured at sf0.1: 3.2 s vs 0.8 s for a
    plain broadcast semi on the same scan; ~1.5k stores x 600k rows).
    Here the words ride in as a single-row broadcast DataFrame instead,
    so ``element_at`` reads a constant ArrayData and the per-row work is
    just k hashes + k loads + bit tests, all inside whole-stage codegen.
    Large bitmaps keep the Arrow batch path (closure-captured numpy)."""
    words_arr = np.frombuffer(bitmap, dtype=np.uint64)
    if len(words_arr) > _JVM_INLINE_WORDS:
        key_col = F.col(fact_key)
        return fact.filter(bloom_might_contain(bitmap, m, k, key_col))
    if _WORDS_COL in fact.columns:
        # the helper column would shadow (or be dropped with) the
        # caller's — fail loudly instead of an ambiguous-column surprise
        raise ValueError(
            f"bloom_prune: fact already has a column named {_WORDS_COL!r}"
        )
    words = [int(w) for w in words_arr.astype(np.int64)]
    words_df = fact.sparkSession.createDataFrame(
        [(words,)], f"{_WORDS_COL} array<bigint>"
    )
    out = fact.crossJoin(F.broadcast(words_df))
    key_col = F.col(fact_key)
    cond = F.lit(True)
    for i in range(k):
        pos = _position(key_col, m, i)
        word = F.element_at(F.col(_WORDS_COL), (pos / 64).cast("int") + 1)
        shift = F.pmod(pos, F.lit(64)).cast("int")
        # arithmetic >> keeps bit b of the two's-complement word, so
        # (word >> b) & 1 is correct even for "negative" int64 words
        bit = F.call_function("shiftright", word, shift).bitwiseAND(F.lit(1))
        cond = cond & (bit == 1)
    return out.filter(cond).drop(_WORDS_COL)


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    expected_items: int | None = None,
    fpp: float = 0.01,
    min_items_for_bloom: int = 0,
) -> DataFrame:
    """Exact ``fact ⋈ dim`` with a Bloom pre-filter on the fact side.

    ``how`` may be any join type whose result is a subset of the inner
    match on the fact side ("inner", "semi"/"leftsemi") — the final join
    eliminates bloom false positives, so results are identical to the
    unpruned join. ``expected_items`` defaults to a dim-side count (one
    extra small-side pass).

    ``min_items_for_bloom``: below this dim size the bitmap build is
    pure overhead — Spark will broadcast the dim and the hash join IS
    the filter (measured at sf0.1: plain broadcast semi 0.6 s vs bloom
    1.7 s on a 43-key dim). Production callers should set it around the
    broadcast threshold (~10M keys at default configs); the default 0
    always blooms, which the registered query uses to exercise the
    operator deterministically."""
    if how not in ("inner", "semi", "leftsemi", "left_semi"):
        raise ValueError(f"bloom pruning only narrows the fact side; how={how!r}")
    if min_items_for_bloom > 0:
        # the skip decision needs the ACTUAL dim size — expected_items is
        # documented as an upper-bound HINT (metadata-only count of an
        # unfiltered parent), which would defeat the gate exactly when a
        # selective filter shrank the dim below the threshold
        dim_size = dim.count()
        if dim_size < min_items_for_bloom:
            if how == "inner":
                return fact.join(dim, fact[fact_key] == dim[dim_key], "inner")
            return fact.join(dim, fact[fact_key] == dim[dim_key], "left_semi")
        if expected_items is None:
            expected_items = max(1, dim_size)
    if expected_items is None:
        expected_items = max(1, dim.select(dim_key).distinct().count())
    bitmap, m, k = build_bloom(dim, dim_key, expected_items, fpp)
    fact = bloom_prune(fact, bitmap, m, k, fact_key)
    if how == "inner":
        return fact.join(dim, fact[fact_key] == dim[dim_key], "inner")
    return fact.join(dim, fact[fact_key] == dim[dim_key], "left_semi")
