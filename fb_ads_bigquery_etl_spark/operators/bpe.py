"""BPE merge learning — the tokenizer-training fixpoint, distributed.

Byte-pair encoding (Sennrich et al. 2016) trains a tokenizer by
repeatedly (1) counting adjacent symbol pairs across the corpus
weighted by word frequency, (2) merging the most frequent pair
everywhere (greedy leftmost-nonoverlapping within each word), and
iterating. This is the fourth iterative operator family in the engine
(next to k-means, PageRank, and connected components) and, like them,
it is expressed so a SQL oracle can replay it exactly:

- the corpus folds ONCE to a (word, freq) vocabulary frame — every
  subsequent step is vocabulary-sized, never corpus-sized (the reason
  real BPE trainers scale: pair statistics ride word frequencies);
- symbol state is positional rows (word, pos, sym); adjacency is a
  per-word lead() window (partitions bounded by word length);
- the argmax pair is a count-desc/lexicographic LIMIT 1 — a one-row
  broadcast, kept lazy (no driver-side collect between iterations);
- greedy leftmost-nonoverlapping application is run-parity selection:
  candidates at consecutive sequence indices (only possible when the
  pair is (a, a)) keep even offsets within each run — exactly the
  left-to-right scan's choices, but computable as window arithmetic.

Iterations are unrolled lazily (fixed `iters`), mirroring the
unrolled-CTE DuckDB oracle in __spark_entry__.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F


def word_frequencies(df: DataFrame, tokens_col: Column) -> DataFrame:
    """Corpus -> (wid, freq): the single corpus-sized pass."""
    return (
        df.select(F.explode(tokens_col).alias("wid"))
        .groupBy("wid")
        .agg(F.count("*").alias("freq"))
    )


def initial_symbols(words: DataFrame) -> DataFrame:
    """(wid, pos, sym): each word split into 1-char symbols."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("wid")),
        lambda i: F.col("wid").substr(i, F.lit(1)),
    )
    return words.select(
        "wid", F.posexplode(chars).alias("pos", "sym")
    )


def _one_merge(state: DataFrame, words: DataFrame):
    """One BPE iteration. Returns (merge_row_df, next_state_df)."""
    w = Window.partitionBy("wid").orderBy("pos")
    n = state.select(
        "wid",
        "pos",
        "sym",
        F.lead("sym").over(w).alias("_nxt"),
        F.row_number().over(w).alias("_rn"),
    )
    pairs = (
        n.filter(F.col("_nxt").isNotNull())
        .join(words, "wid")
        .groupBy("sym", "_nxt")
        .agg(F.sum("freq").alias("cnt"))
    )
    top = (
        pairs.orderBy(F.col("cnt").desc(), F.col("sym").asc(), F.col("_nxt").asc())
        .limit(1)
        .select(
            F.col("sym").alias("_a"),
            F.col("_nxt").alias("_b"),
            F.col("cnt").cast("long").alias("_c"),
        )
    )
    # the 1-row argmax feeds two consumers (the application's broadcast
    # AND the caller's output union); checkpoint it HERE — before cand
    # captures the lineage — so the pair-count aggregate runs once per
    # iteration instead of once per consumer
    top = top.localCheckpoint(eager=True)
    cand = (
        n.crossJoin(F.broadcast(top))
        .filter((F.col("sym") == F.col("_a")) & (F.col("_nxt") == F.col("_b")))
        .select(
            "wid",
            "_rn",
            "_b",
            F.row_number()
            .over(Window.partitionBy("wid").orderBy("_rn"))
            .alias("_crn"),
        )
    )
    # run-parity: candidates at consecutive _rn form a run (possible only
    # for (a, a) pairs); the greedy left-to-right scan takes even offsets.
    runs = cand.withColumn(
        "_off",
        F.col("_rn")
        - F.min("_rn").over(
            Window.partitionBy("wid", F.col("_rn") - F.col("_crn"))
        ),
    )
    sel = runs.filter(F.col("_off") % 2 == 0).select("wid", "_rn", "_b")
    # apply the merge with two left joins: selected rows take the fused
    # symbol; rows immediately after a selected row are consumed
    s_hit = sel.select(
        F.col("wid").alias("_hw"), F.col("_rn").alias("_hr"), "_b"
    )
    s_prev = sel.select(
        F.col("wid").alias("_pw"), (F.col("_rn") + 1).alias("_pr")
    )
    nxt_state = (
        n.join(
            s_hit,
            (F.col("wid") == F.col("_hw")) & (F.col("_rn") == F.col("_hr")),
            "left",
        )
        .join(
            s_prev,
            (F.col("wid") == F.col("_pw")) & (F.col("_rn") == F.col("_pr")),
            "left",
        )
        .filter(F.col("_pr").isNull())
        .select(
            "wid",
            "pos",
            F.when(
                F.col("_hr").isNotNull(), F.concat(F.col("sym"), F.col("_b"))
            )
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
    )
    return top, nxt_state


def learn_merges(
    df: DataFrame, tokens_col: Column, *, iters: int = 3
) -> DataFrame:
    """Learn the first `iters` BPE merges over the corpus.

    Returns (step, left_sym, right_sym, pair_weight) — one row per
    learned merge, in order. Everything after the initial corpus fold
    is vocabulary-sized; iterations are unrolled lazily.
    """
    # checkpoint the vocabulary: every iteration joins it, and each lazy
    # consumer would otherwise re-run the corpus fold
    words = word_frequencies(df, tokens_col).localCheckpoint(eager=True)
    state = initial_symbols(words)
    outs = []
    for step in range(1, iters + 1):
        top, state = _one_merge(state, words)
        # cut the lineage each iteration: state feeds multiple consumers
        # in the next one (pair counts AND candidate application), and
        # without a checkpoint the recomputation compounds geometrically
        # across iterations — same treatment as the k-means / PageRank
        # fixpoints. Vocabulary-sized, so the materialization is cheap.
        state = state.localCheckpoint(eager=True)
        outs.append(
            top.select(
                F.lit(step).cast("long").alias("step"),
                F.col("_a").alias("left_sym"),
                F.col("_b").alias("right_sym"),
                F.col("_c").alias("pair_weight"),
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result.orderBy("step")


def _apply_pair(state: DataFrame, a: str, b: str) -> DataFrame:
    """Apply one KNOWN merge (a, b) to the positional symbol state.

    The run-parity greedy application of `_one_merge` with the pair
    fixed as literals: no argmax, no broadcast — candidate filtering is
    a narrow predicate, so each rank costs the per-word adjacency
    window plus two vocabulary-sized left joins.
    """
    w = Window.partitionBy("wid").orderBy("pos")
    n = state.select(
        "wid",
        "pos",
        "sym",
        F.lead("sym").over(w).alias("_nxt"),
        F.row_number().over(w).alias("_rn"),
    )
    cand = (
        n.filter((F.col("sym") == a) & (F.col("_nxt") == b))
        .select(
            "wid",
            "_rn",
            F.row_number()
            .over(Window.partitionBy("wid").orderBy("_rn"))
            .alias("_crn"),
        )
    )
    runs = cand.withColumn(
        "_off",
        F.col("_rn")
        - F.min("_rn").over(
            Window.partitionBy("wid", F.col("_rn") - F.col("_crn"))
        ),
    )
    sel = runs.filter(F.col("_off") % 2 == 0).select("wid", "_rn")
    s_hit = sel.select(F.col("wid").alias("_hw"), F.col("_rn").alias("_hr"))
    s_prev = sel.select(
        F.col("wid").alias("_pw"), (F.col("_rn") + 1).alias("_pr")
    )
    return (
        n.join(
            s_hit,
            (F.col("wid") == F.col("_hw")) & (F.col("_rn") == F.col("_hr")),
            "left",
        )
        .join(
            s_prev,
            (F.col("wid") == F.col("_pw")) & (F.col("_rn") == F.col("_pr")),
            "left",
        )
        .filter(F.col("_pr").isNull())
        .select(
            "wid",
            "pos",
            F.when(F.col("_hr").isNotNull(), F.concat(F.col("sym"), F.lit(b)))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
    )


def apply_merges(
    words: DataFrame, merges: Sequence[tuple[str, str]]
) -> DataFrame:
    """BPE ENCODING: tokenize the vocabulary with a learned merge table.

    The half a data pipeline actually runs at scale — `learn_merges`
    trains once, this applies the table to every corpus. Semantics are
    the trainer's own: merges apply in RANK ORDER, one greedy
    leftmost-nonoverlapping pass per rank (a pass can never re-create
    an adjacency of its own pair: fusing (a, b) yields a symbol `ab`
    whose neighbours form different pairs), so encode(learn(corpus))
    is exactly the trainer's final symbol state.

    Operates on the DISTINCT-WORD frame — vocabulary-sized, never
    corpus-sized; join the result back to documents for corpus token
    streams. Returns (wid, toks: array<string>). The unrolled plan is
    the oracle-replayable path for small tables; production-size merge
    tables (30k+ ranks) should use `apply_merges_pandas`, the
    arrow-batched twin property-tested against this one.
    """
    state = initial_symbols(words.select("wid").distinct())
    for a, b in merges:
        # each rank's state feeds the next rank's window AND both
        # application joins — cut lineage per rank like learn_merges
        state = _apply_pair(state, a, b).localCheckpoint(eager=True)
    return _assemble_toks(state)


def _assemble_toks(state: DataFrame) -> DataFrame:
    """(wid, pos, sym) positional state -> (wid, toks array<string>),
    the encode output shape — shared final fold of apply_merges and
    merge_usage(return_state=True)."""
    return state.groupBy("wid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "sym"))),
            lambda s: s["sym"],
        ).alias("toks")
    )


def apply_merges_pandas(
    words: DataFrame, merges: Sequence[tuple[str, str]]
) -> DataFrame:
    """Scale path for production-size merge tables: a PAIR-PRIORITY
    sequential encoder per distinct word, applied as an Arrow-batched
    pandas UDF over the vocabulary frame (O(vocab) work regardless of
    corpus size; the merge table broadcasts inside the UDF closure).

    Encode cost is independent of merge-table size: instead of one
    pass per RANK (30k passes per word at production table sizes,
    almost all no-ops), a dict maps each pair to its rank and a
    min-heap holds the ranks of pairs PRESENT in the word. Ranks pop
    in ascending order — exactly the sequential per-rank schedule with
    the absent-rank no-ops skipped — and after each applied pass only
    pairs with HIGHER rank are (re-)enqueued, because a lower-rank
    pair materializing later missed its turn in the sequential
    schedule too. Cost per word: O(len) per APPLIED rank (bounded by
    len), never O(ranks).

    Same per-rank greedy leftmost-nonoverlapping semantics as
    `apply_merges` for ARBITRARY tables (property-tested equal in
    tests/test_bpe.py, including a 30k-rank padded table); use this
    when the unrolled per-rank plan would be too deep for Catalyst
    (beyond a few dozen ranks). Measured note in SCALE.md: same vocab,
    5-rank vs 30k-rank table, ~flat encode time.
    """
    import heapq

    merge_list = [tuple(m) for m in merges]
    # FIRST occurrence wins on a duplicated pair: in the sequential
    # per-rank schedule the lower rank fires first and the duplicate is
    # a no-op forever after (real tables never repeat a pair, but the
    # property test feeds arbitrary ones — a last-wins dict would rank
    # the pair BEHIND merges the sequential schedule runs later)
    rank_of: dict[tuple[str, str], int] = {}
    for r, pair in enumerate(merge_list):
        rank_of.setdefault(pair, r)

    def encode_word(word: str) -> list[str]:
        syms = list(word)
        heap = sorted(
            {
                rank_of[p]
                for p in zip(syms, syms[1:])
                if p in rank_of
            }
        )
        done: set[int] = set()
        while heap:
            r = heapq.heappop(heap)
            if r in done:
                continue
            done.add(r)
            a, b = merge_list[r]
            out: list[str] = []
            i = 0
            changed = False
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                    changed = True
                else:
                    out.append(syms[i])
                    i += 1
            if not changed:
                continue
            syms = out
            for p in zip(syms, syms[1:]):
                rr = rank_of.get(p)
                if rr is not None and rr > r and rr not in done:
                    heapq.heappush(heap, rr)
        return syms

    @F.pandas_udf("array<string>")
    def encode(col: pd.Series) -> pd.Series:
        return col.map(encode_word)

    return (
        words.select("wid")
        .distinct()
        .select("wid", encode(F.col("wid")).alias("toks"))
    )


def decode_pieces(encoded: DataFrame, toks_col: str = "toks") -> DataFrame:
    """BPE DECODE: (wid, decoded) with decoded = the concatenation of
    the word's pieces — the inverse of `apply_merges` BY CONSTRUCTION
    (every merge only fuses adjacent symbols of the same word, so the
    character stream is preserved in order; the round-trip gate
    verifies it anyway, per word, from the data). Completes the
    tokenizer lifecycle: train -> encode -> decode. Pure JVM
    expression; vocabulary-sized like the encode it inverts."""
    return encoded.select(
        "wid", F.concat_ws("", F.col(toks_col)).alias("decoded")
    )


def merge_usage(
    words: DataFrame,
    merges: Sequence[tuple[str, str]],
    *,
    return_state: bool = False,
) -> list[int] | tuple[list[int], DataFrame]:
    """Corpus-weighted firing count per merge rank: apply the table
    rank by rank over the vocabulary frame and measure, per rank, the
    corpus piece-count drop (each firing fuses exactly two pieces into
    one, so usage_k = sum_w freq_w * (pieces_{k-1}(w) - pieces_k(w))).
    One vocabulary-sized pass per rank plus a scalar agg — the audit a
    tokenizer build runs to find dead vocabulary. Returns one int per
    rank, in rank order; with `return_state=True`, returns
    (usages, encoded) where `encoded` is the full table's
    (wid, toks) encode — the audit already ran every rank, so callers
    that also need the encode (the `bpe_vocab_prune` gate) reuse it
    instead of paying the R-pass chain twice."""
    uniq = words.select("wid").distinct()
    freq = words.select("wid", "freq")

    def total_pieces(state: DataFrame) -> int:
        cnt = state.groupBy("wid").agg(F.count("*").alias("_c"))
        return int(
            cnt.join(freq, "wid")
            .agg(F.sum(F.col("freq") * F.col("_c")).cast("long"))
            .head()[0]
        )

    state = initial_symbols(uniq).localCheckpoint(eager=True)
    prev = total_pieces(state)
    usages: list[int] = []
    for a, b in merges:
        state = _apply_pair(state, a, b).localCheckpoint(eager=True)
        cur = total_pieces(state)
        usages.append(prev - cur)
        prev = cur
    if return_state:
        return usages, _assemble_toks(state)
    return usages


def prune_merges(
    words: DataFrame,
    merges: Sequence[tuple[str, str]],
    *,
    min_uses: int,
    usages: Sequence[int] | None = None,
) -> list[tuple[str, str]]:
    """Vocabulary pruning: drop merges whose corpus-weighted usage
    falls below `min_uses`, preserving rank order of the survivors —
    the standard tokenizer-shrink step (a merge nobody fires is a
    wasted vocabulary slot; re-encoding with the pruned table shifts
    fertility only by the dropped merges' firings). Usage is measured
    against the FULL table's sequential schedule (merge_usage), so a
    kept merge that consumed a dropped merge's output keeps its
    measured behavior visible to the caller via the fertility shift
    the `bpe_vocab_prune` gate reports. Pass `usages` (from a
    merge_usage call you already ran) to skip re-measuring the whole
    chain."""
    if usages is None:
        usages = merge_usage(words, merges)
    return [
        tuple(m)
        for m, u in zip(merges, usages)
        if u >= min_uses
    ]
