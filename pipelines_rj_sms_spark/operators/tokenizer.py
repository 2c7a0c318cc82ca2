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


def _select_merge_batch(rows, min_pair_count: int, max_batch: int):
    """Maximal EXACT batch from the ranked (count desc, lex) pair
    list: the longest pairwise symbol-disjoint PREFIX, trimmed to
    pairs whose count strictly exceeds the first excluded pair's
    count (the cutoff).

    Why this equals the sequential trainer's next ``len(batch)``
    picks: (1) disjoint pairs' counts are invariant under each
    other's merges (a merge only touches adjacencies involving its
    own symbols), so the batched pairs keep their ranks among
    themselves; (2) a merge of (l, r) -> m can only CREATE pairs
    (x, m) / (m, y), whose counts are bounded by the pre-merge counts
    of the existing overlapping pairs (x, l) / (r, y) — every such
    pair overlaps a batched pair, so it sits past the prefix in the
    ranking, i.e. at count <= cutoff < every batched count. Hence no
    created pair can outrank a batched one mid-sequence, and
    destroyed/shrunk pairs only fall further. Ties inside the batch
    follow the ranking's lexicographic order, which is exactly the
    sequential tie-break. Falls back to batching the single top pair
    (always sequential-exact) when the trim empties the prefix.
    """
    batch: list[tuple[str, str, int]] = []
    used: set[str] = set()
    stop_at = len(rows)
    truncated = True  # only a complete scan proves the ranking ended
    for idx, row in enumerate(rows):
        left, right, c = row["p"]["l"], row["p"]["r"], int(row["c"])
        if c < min_pair_count:
            stop_at, truncated = idx, False
            break
        if left in used or right in used or len(batch) >= max_batch:
            stop_at = idx
            break
        batch.append((left, right, c))
        used.add(left)
        used.add(right)
    else:
        truncated = len(rows) >= max_batch  # exhausted the collect cap?
    if not batch:
        return batch
    # Created-pair counts are bounded by existing pairs OVERLAPPING the
    # batch — only those constrain; disjoint tail pairs rank after the
    # batch by construction and stay there. The cutoff is therefore the
    # max count among overlapping tail pairs (plus the last collected
    # count when the ranking was truncated, since unseen pairs below it
    # might overlap).
    cutoff = 0
    for row in rows[stop_at:]:
        left, right, c = row["p"]["l"], row["p"]["r"], int(row["c"])
        if left in used or right in used:
            cutoff = max(cutoff, c)
    if truncated and rows:
        cutoff = max(cutoff, int(rows[-1]["c"]))
    trimmed = [b for b in batch if b[2] > cutoff]
    if not trimmed:
        trimmed = batch[:1]
    return trimmed


def _driver_bpe(word_freqs: dict[str, int], n_merges: int,
                min_pair_count: int) -> list[tuple[str, str, int]]:
    """Exact sequential BPE on a collected word-frequency dict — the
    classic incremental-index trainer (Sennrich et al. 2016 describe
    the algorithm; this is a from-scratch lazy-heap spelling): pair
    counts update only for words a merge touches, and a max-heap keyed
    (-count, pair) with stale-entry revalidation yields the next merge
    in O(log P) instead of a full rescan. Tie-break matches the
    distributed trainer exactly: count desc, then (left, right)
    lexicographic (the heap key IS that ordering).
    """
    import heapq

    words: list[tuple[list[str], int]] = [
        (list(w) + [_EOW], f) for w, f in word_freqs.items()]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def scan_add(wi: int, sym: list[str], f: int) -> None:
        for i in range(len(sym) - 1):
            q = (sym[i], sym[i + 1])
            pair_counts[q] = pair_counts.get(q, 0) + f
            pair_words.setdefault(q, set()).add(wi)

    for wi, (sym, f) in enumerate(words):
        scan_add(wi, sym, f)
    heap = [(-c, q) for q, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges and heap:
        negc, p = heapq.heappop(heap)
        c = pair_counts.get(p, 0)
        if -negc != c:  # stale; requeue at its live count
            if c > 0:
                heapq.heappush(heap, (-c, p))
            continue
        if c < min_pair_count:
            break
        left, right = p
        merges.append((left, right, c))
        merged = left + right
        touched: set[tuple[str, str]] = set()
        for wi in list(pair_words.get(p, ())):
            sym, f = words[wi]
            has = any(sym[i] == left and sym[i + 1] == right
                      for i in range(len(sym) - 1))
            if not has:  # stale index entry
                continue
            for i in range(len(sym) - 1):  # retract the old pairs
                q = (sym[i], sym[i + 1])
                pair_counts[q] -= f
                touched.add(q)
            out: list[str] = []
            i = 0
            while i < len(sym):  # greedy left-to-right, classic
                if (i < len(sym) - 1 and sym[i] == left
                        and sym[i + 1] == right):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[wi] = (out, f)
            for i in range(len(out) - 1):
                q = (out[i], out[i + 1])
                pair_counts[q] = pair_counts.get(q, 0) + f
                pair_words.setdefault(q, set()).add(wi)
                touched.add(q)
        pair_counts.pop(p, None)
        pair_words.pop(p, None)
        touched.discard(p)
        for q in touched:
            cq = pair_counts.get(q, 0)
            if cq > 0:
                heapq.heappush(heap, (-cq, q))
    return merges


def bpe_train(df: DataFrame, text_col: str, n_merges: int = 50,
              min_pair_count: int = 2, max_batch: int = 16,
              driver_vocab_limit: int = 1_000_000,
              stats: dict | None = None) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns the ordered merge table
    [(left, right, count), ...]. Stops early when no pair reaches
    ``min_pair_count``.

    Two execution paths, identical output (both unit-pinned against
    an independent reference trainer):

    - ``n_vocab <= driver_vocab_limit`` (the common case — distinct
      words, not corpus rows): ONE distributed corpus pass builds the
      word-frequency table, then the whole merge loop runs on the
      driver with the incremental-index algorithm — zero per-merge
      Spark jobs, which is the honest cost model when the state fits
      (a 1M-word vocab is ~tens of MB).
    - larger vocabs: distributed rounds; each round counts pairs ONCE
      and applies up to ``max_batch`` merges whose sequential
      equivalence is provable from that single count (see
      `_select_merge_batch`), chaining the merge folds in one
      projection. ``max_batch=1`` recovers the one-merge-per-round
      trainer exactly.

    ``stats`` (optional dict) reports {"mode", "rounds"} — rounds is 0
    on the driver path.

    Greedy-left-to-right note: a merged symbol CAN seed another merge
    in the same word on a later round (classic behavior), but within
    one round each position participates in at most one merge per
    merge rule, applied in ranked order.
    """
    wf = word_freq_table(df, text_col)
    n_vocab = wf.count()
    if n_vocab <= driver_vocab_limit:
        # the working state is |vocab|-bounded regardless of corpus
        # size, so when it fits comfortably on the driver the whole
        # merge loop runs locally: ONE distributed corpus pass, ZERO
        # per-merge Spark jobs — bit-identical to the distributed
        # rounds (equivalence unit-pinned)
        freqs = {r["w"]: int(r["freq"]) for r in wf.collect()}
        if stats is not None:
            stats["rounds"] = 0
            stats["mode"] = "driver"
        return _driver_bpe(freqs, n_merges, min_pair_count)
    state = wf.select(
        "freq",
        F.concat(F.split(F.col("w"), ""),
                 F.array(F.lit(_EOW))).alias("sym"))
    state = state.persist()
    merges: list[tuple[str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        rounds += 1
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
        # 8x headroom over max_batch: the tail is what proves batch
        # exactness (overlap cutoff), so see well past the prefix;
        # truncation is still handled conservatively
        top = (pairs.groupBy("p").agg(F.sum("freq").alias("c"))
               .orderBy(F.col("c").desc(), F.col("p.l").asc(),
                        F.col("p.r").asc())
               .limit(max(8 * max_batch, 16)).collect())
        room = n_merges - len(merges)
        batch = _select_merge_batch(top, min_pair_count,
                                    min(max_batch, room))
        if not batch:
            break
        merges.extend(batch)
        sym = F.col("sym")
        for left, right, _c in batch:
            sym = _merge_pair_expr(sym, left, right, left + right)
        nxt = state.select("freq", sym.alias("sym")).localCheckpoint()
        state.unpersist()
        state = nxt
    state.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
        stats["mode"] = "distributed"
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
