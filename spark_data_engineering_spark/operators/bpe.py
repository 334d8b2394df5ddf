"""Byte-pair-encoding subword tokenizer (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units" — public
method): learn merge rules from a word-frequency table, apply them
distributively.

Scale shape — the split every production tokenizer trainer uses:
LEARNING runs on the word-frequency table, which is vocabulary-sized
(bounded driver collect — ~100k-1M distinct words even for web-scale
corpora; the corpus itself is never collected), after the DISTRIBUTED
groupBy produces it. APPLICATION is an Arrow ``mapInPandas`` pass that
segments each batch's tokens against the broadcast merge list, caching
the segmentation per distinct token within a batch.

Determinism: ties in pair frequency break lexicographically, so the
merge list — and therefore every segmentation — is a pure function of
the word-frequency table. That is what lets ``bpe_subword_stats`` pin
its expected output as an oracle.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_END = "</w>"  # end-of-word marker, standard BPE


def learn_bpe(word_freqs: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Greedy BPE merge learning over (word, freq) rows. Returns the
    ordered merge list. Deterministic: the most frequent adjacent
    symbol pair wins each round, ties broken lexicographically."""
    words: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs:
        if w:
            words[tuple(w) + (_END,)] = words.get(tuple(w) + (_END,), 0) + int(f)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, f in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        out: dict[tuple[str, ...], int] = {}
        for sym, f in words.items():
            res = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    res.append(merged)
                    i += 2
                else:
                    res.append(sym[i])
                    i += 1
            key = tuple(res)
            out[key] = out.get(key, 0) + f
        words = out
    return merges


def segment_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply the ordered merge list to one word (same greedy order as
    learning, so training words segment to their learned form)."""
    sym = list(word) + [_END]
    for a, b in merges:
        i, res = 0, []
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                res.append(a + b)
                i += 2
            else:
                res.append(sym[i])
                i += 1
        sym = res
    return sym


def bpe_subwords(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Distributed application: one (subword) row per emitted symbol.
    Arrow batches; the per-distinct-token segmentation is cached within
    each batch (corpora repeat tokens — the cache turns per-row work
    into per-vocab work)."""
    tokens = df.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out: list[str] = []
            for tok in pdf["token"]:
                s = cache.get(tok)
                if s is None:
                    s = segment_word(tok, merges)
                    cache[tok] = s
                out.extend(s)
            yield pd.DataFrame({"subword": out})

    return tokens.mapInPandas(seg, schema="subword string")
