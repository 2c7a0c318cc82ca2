"""Distributed BPE tokenizer training — learn subword merges from the
corpus itself.

The training-data pipeline's tokenizer is usually trained offline on a
sample; at 100 TB the sample IS a distributed aggregation problem. This
is the classic byte-pair-encoding algorithm (Sennrich et al. 2016,
public): start from characters (with an end-of-word marker), repeatedly
merge the most frequent adjacent symbol pair.

The key scale observation: after the first aggregation the working
state is the WORD-FREQUENCY table — bounded by |vocab| (distinct
words), not corpus size. Every merge round then runs on that small
table: one explode of adjacent pairs weighted by word frequency, one
hash aggregation, a single-row argmax to the driver (bounded — it is
one pair), and an expression-only left-to-right merge fold over each
word's symbol array. N merges = N cheap rounds over |vocab| rows; the
corpus is touched exactly once.

Determinism: ties on the pair count break lexicographically on (left,
right), and the merge fold is greedy left-to-right — the exact classic
semantics, replayable anywhere. Training runs N driver-coordinated
rounds (like IVF's k-means trainer); the learned merge table is data,
so downstream encoding is a pure function.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pipelines_rj_sms_spark.functions.text import tokens

__all__ = ["word_freq_table", "bpe_train", "bpe_encode_udf"]

_EOW = "</w>"


def word_freq_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the corpus — the one corpus-wide pass.
    Persist the result; training never re-reads the corpus."""
    return (df.select(F.explode(tokens(text_col)).alias("w"))
            .groupBy("w").agg(F.count("*").alias("freq")))


def _merge_pair_expr(symbols, left: str, right: str, merged: str):
    """Greedy left-to-right merge of adjacent (left, right) -> merged
    inside a symbol array, as a pure aggregate fold (no Python)."""
    init = F.struct(F.array().cast("array<string>").alias("out"))

    def step(acc, x):
        prev = F.element_at(acc["out"], -1)
        can = (F.size(acc["out"]) > 0) & (prev == F.lit(left)) \
            & (x == F.lit(right))
        merged_out = F.concat(
            F.slice(acc["out"], 1, F.size(acc["out"]) - 1),
            F.array(F.lit(merged)))
        return F.struct(
            F.when(can, merged_out)
            .otherwise(F.concat(acc["out"], F.array(x))).alias("out"))

    return F.aggregate(symbols, init, step)["out"]


def bpe_train(df: DataFrame, text_col: str, n_merges: int = 50,
              min_pair_count: int = 2) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns the ordered merge table
    [(left, right, count), ...]. Stops early when no pair reaches
    ``min_pair_count``.

    Greedy-left-to-right note: a merged symbol CAN seed another merge
    in the same word on a later round (classic behavior), but within
    one round each position participates in at most one merge.
    """
    wf = word_freq_table(df, text_col)
    state = wf.select(
        "freq",
        F.concat(F.split(F.col("w"), ""),
                 F.array(F.lit(_EOW))).alias("sym"))
    state = state.persist()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = state.select(
            "freq",
            F.explode(F.when(
                F.size("sym") > 1,
                F.zip_with(
                    F.slice("sym", 1, F.size("sym") - 1),
                    F.slice("sym", 2, F.size("sym") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r"))))
                .otherwise(F.array().cast(
                    "array<struct<l:string,r:string>>"))).alias("p"))
        top = (pairs.groupBy("p").agg(F.sum("freq").alias("c"))
               .orderBy(F.col("c").desc(), F.col("p.l").asc(),
                        F.col("p.r").asc())
               .limit(1).collect())
        if not top or top[0]["c"] < min_pair_count:
            break
        left, right = top[0]["p"]["l"], top[0]["p"]["r"]
        merges.append((left, right, int(top[0]["c"])))
        nxt = state.select(
            "freq",
            _merge_pair_expr(F.col("sym"), left, right,
                             left + right).alias("sym")
        ).localCheckpoint()
        state.unpersist()
        state = nxt
    state.unpersist()
    return merges


def bpe_encode_udf(merges: list[tuple[str, str, int]]):
    """Arrow-batched encoder applying the learned merge table in
    training order — the standard BPE segmenter. Returns a pandas UDF
    mapping a text column to array<string> of subword tokens (with the
    end-of-word marker folded into the final symbol of each word).

    Encoding is the sanctioned Python path: per-word merge application
    is data-dependent looping that SQL expressions can't chain for
    hundreds of merges (each merge would nest another fold); inside
    Arrow batches it is a tight dict-driven loop, and the merge table
    is a plain closure (broadcast with the task like any literal).
    """
    from pyspark.sql.functions import pandas_udf

    order = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    joined = {(l, r): l + r for l, r, _ in merges}

    def encode_word(word: str) -> list[str]:
        sym = list(word) + [_EOW]
        while len(sym) > 1:
            best, best_rank = None, None
            for i in range(len(sym) - 1):
                rank = order.get((sym[i], sym[i + 1]))
                if rank is not None and (best_rank is None
                                         or rank < best_rank):
                    best, best_rank = i, rank
            if best is None:
                break
            pair = (sym[best], sym[best + 1])
            # greedy left-to-right application of THIS merge
            out, i = [], 0
            while i < len(sym):
                if (i < len(sym) - 1
                        and (sym[i], sym[i + 1]) == pair):
                    out.append(joined[pair])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        return sym

    @pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            out: list[str] = []
            for w in t.lower().split():
                out.extend(encode_word(w))
            return out
        return texts.map(one)

    return _encode
