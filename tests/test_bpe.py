"""BPE merge learning vs a sequential reference implementation."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from fb_ads_bigquery_etl_spark.functions.portable import tokens
from fb_ads_bigquery_etl_spark.operators import bpe


def _reference_bpe(texts: list[str], iters: int) -> list[tuple[str, str, int]]:
    """Plain sequential BPE: the semantics learn_merges must match."""
    words = Counter()
    for t in texts:
        words.update(w for w in t.lower().split() if w)
    state = {w: [c for c in w] for w in words}
    merges = []
    for _ in range(iters):
        counts: Counter = Counter()
        for w, syms in state.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += words[w]
        if not counts:
            break
        # max count, then lexicographic (a, b) — the engine's tie-break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, c))
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    return merges


def _run(spark, texts, iters=3):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    got = [
        (r["left_sym"], r["right_sym"], r["pair_weight"])
        for r in bpe.learn_merges(df, tokens(F.col("text")), iters=iters).collect()
    ]
    assert got == _reference_bpe(texts, iters), f"texts={texts}"


def test_bpe_matches_reference_on_simple_corpus(spark):
    _run(spark, ["low lower lowest", "low low newer newest", "wider wide"])


def test_bpe_greedy_overlap_runs(spark):
    # 'aaaa' exercises the (a, a) run-parity path: greedy takes
    # positions 0-1 and 2-3, NOT the overlapping 1-2
    _run(spark, ["aaaa aaa aa baab", "aaaa caa aac"])


def test_bpe_merged_symbols_chain(spark):
    # after (a, b) -> 'ab', the next iterations must see 'ab' as ONE
    # symbol (e.g. ('ab', 'c') can win), not re-split it
    _run(spark, ["abc abc abc abd", "abx abc yabc"], iters=4)


def _reference_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = [c for c in word]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_apply_merges_matches_sequential_and_pandas_twin(spark):
    words = [
        "lower", "lowest", "aaaa", "aaab", "baab", "stream", "strstr",
        "x", "", "ststst", "restart",
    ]
    merges = [("s", "t"), ("a", "a"), ("st", "r"), ("e", "r"), ("aa", "aa")]
    df = spark.createDataFrame([(w,) for w in words if w], ["wid"])
    want = {w: _reference_encode(w, merges) for w in words if w}
    got = {
        r["wid"]: r["toks"]
        for r in bpe.apply_merges(df, merges).collect()
    }
    assert got == want
    got_pd = {
        r["wid"]: r["toks"]
        for r in bpe.apply_merges_pandas(df, merges).collect()
    }
    assert got_pd == want


def test_encode_learn_roundtrip_reproduces_trainer_state(spark):
    """encode(learn(corpus)) must equal the trainer's final symbol
    state: applying the learned table in rank order with one greedy
    pass per rank is exactly what learning did."""
    texts = ["low lower lowest low", "newer newest wide wider low"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    learned = [
        (r["left_sym"], r["right_sym"])
        for r in bpe.learn_merges(df, tokens(F.col("text")), iters=4).collect()
    ]
    words = {w for t in texts for w in t.lower().split()}
    wdf = spark.createDataFrame([(w,) for w in words], ["wid"])
    got = {
        r["wid"]: r["toks"] for r in bpe.apply_merges(wdf, learned).collect()
    }
    # independent sequential replay of train-then-encode
    ref_merges = [(a, b) for a, b, _ in _reference_bpe(texts, 4)]
    assert learned == ref_merges
    assert got == {w: _reference_encode(w, ref_merges) for w in words}


def test_apply_merges_pandas_arbitrary_tables_random(spark):
    """The priority encoder must equal the sequential per-rank spec on
    ARBITRARY (not just well-formed learned) merge tables — including
    tables where a later rank creates a pair an earlier rank would
    have matched (the sequential schedule does NOT go back)."""
    import random

    rng = random.Random(7)
    alphabet = ["a", "b", "c"]
    pieces = alphabet + ["ab", "ba", "aa", "bc", "cc", "abc", "ca"]
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(60)
    ]
    for trial in range(8):
        merges = []
        seen = set()
        for _ in range(10):
            p = (rng.choice(pieces), rng.choice(pieces))
            if p not in seen:
                seen.add(p)
                merges.append(p)
        df = spark.createDataFrame([(w,) for w in set(words)], ["wid"])
        want = {w: _reference_encode(w, merges) for w in set(words)}
        got = {
            r["wid"]: r["toks"]
            for r in bpe.apply_merges_pandas(df, merges).collect()
        }
        assert got == want, (trial, merges)


def test_apply_merges_pandas_30k_rank_table(spark):
    """Production-size table: the 5 live merges buried in 30k ranks of
    never-matching padding. Semantics unchanged (padding passes are
    no-ops in the sequential spec too); cost must not scan all ranks
    per word — the SCALE.md note times this same shape."""
    live = [("s", "t"), ("a", "a"), ("st", "r"), ("e", "r"), ("aa", "aa")]
    merges: list[tuple[str, str]] = []
    for i in range(30_000):
        merges.append((f"pad{i}", f"pad{i}"))  # can never occur
        if i % 6000 == 0 and live:
            merges.append(live.pop(0))
    merges += live
    words = ["lower", "lowest", "aaaa", "baab", "strstr", "ststst", "restart"]
    df = spark.createDataFrame([(w,) for w in words], ["wid"])
    want = {w: _reference_encode(w, merges) for w in words}
    got = {
        r["wid"]: r["toks"]
        for r in bpe.apply_merges_pandas(df, merges).collect()
    }
    assert got == want


def test_decode_usage_prune_lifecycle(spark):
    """decode_pieces must invert apply_merges for every word; per-rank
    usages must account exactly for the total piece-count drop; and
    prune_merges must keep a rank-ordered subset whose re-encode
    shifts fertility by exactly the dropped ranks' firings when no
    kept rank depended on a dropped one."""
    texts = [
        "steer steer stern inner inner now stow stow stow",
        "strew rest rest inn inn inn erst now now",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    words = bpe.word_frequencies(df, tokens(F.col("text"))).localCheckpoint(
        eager=True
    )
    merges = [("e", "r"), ("i", "n"), ("s", "t"), ("o", "w"), ("st", "r")]

    enc = bpe.apply_merges(words, merges).localCheckpoint(eager=True)
    dec = {r["wid"]: r["decoded"] for r in bpe.decode_pieces(enc).collect()}
    assert dec == {w: w for w in dec}  # round-trip, per word

    usages = bpe.merge_usage(words, merges)
    freq = {r["wid"]: r["freq"] for r in words.collect()}
    toks = {r["wid"]: r["toks"] for r in enc.collect()}
    init_pieces = sum(len(w) * f for w, f in freq.items())
    final_pieces = sum(len(toks[w]) * f for w, f in freq.items())
    assert sum(usages) == init_pieces - final_pieces
    assert all(u >= 0 for u in usages)

    # prune the bottom rank(s); survivors keep rank order
    floor = sorted(usages)[1]  # drop exactly the rarest rank
    kept = bpe.prune_merges(words, merges, min_uses=floor)
    assert kept == [m for m, u in zip(merges, usages) if u >= floor]
    assert len(kept) < len(merges)
    # pruned re-encode still round-trips
    enc2 = bpe.apply_merges(words, kept)
    dec2 = {r["wid"]: r["decoded"]
            for r in bpe.decode_pieces(enc2).collect()}
    assert dec2 == {w: w for w in dec2}
