"""Positional inverted index + phrase search — the retrieval
capability a term-level inverted index (q_inverted_index) cannot
answer: "these tokens, ADJACENT, in this order". Classic IR posting
shape (token -> (doc, positions[])), the index every phrase/proximity
query engine ships.

Scale shape: the index builds with ONE posexplode + token-keyed
aggregate (positions arrays bounded by per-doc term frequency); a
phrase query reads ONLY the phrase's tokens' postings (token-keyed
predicate pushdown — at 100 TB the index is stored token-bucketed, so
this is a partition-pruned read of |phrase| postings lists), then ONE
doc-keyed aggregate pivots the distinct tokens' position arrays onto
each doc row and the match count is pure array arithmetic:
|P(t0) ∩ (P(t1) - 1) ∩ ... ∩ (P(tn) - n)| — the textbook shifted
positional intersection, no self-join per phrase term, no window.
Duplicate phrase tokens (e.g. "batch batch") need no special case:
the same positions array intersects against its own shift.

Engine-exactness: positions are 0-based token ordinals; counts are
pure integers. The oracle replays the phrase count directly over the
token arrays (a different, obviously-correct formulation), so the
gate proves the INDEX path reproduces the scan-path semantics.

No reference counterpart (north-star extension, BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fb_ads_bigquery_etl_spark.functions.portable import tokens


def build_positional_index(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(token, doc_id, positions array<int>) — positions sorted
    ascending, 0-based. One explode + one (token, doc)-keyed
    aggregate."""
    return (
        docs.select(
            F.col(id_col),
            F.posexplode(tokens(F.col(text_col))).alias("pos", "token"),
        )
        .groupBy("token", id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
    )


def proximity_match(
    index: DataFrame,
    phrase: list[str],
    *,
    slop: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Proximity search ("a b"~k): (doc_id, n_occurrences) counting
    anchor positions p0 of the first term such that EVERY later term
    j sits within its slop window [p0 + j, p0 + j + slop] — in-order
    matching with up to `slop` extra displacement per term (the
    k-envelope proximity variant; slop=0 degenerates to the exact
    phrase and equals `phrase_match`).

    Same plan shape as phrase_match — read only the query terms'
    postings, ONE doc-keyed pivot, then pure array arithmetic: the
    slop window is a union of shifted position arrays, so the count
    is |P(t0) ∩ ⋂_j ∪_{d=0..slop} (P(t_j) - j - d)| — still no
    per-term self-join, no window function, and duplicate query
    tokens intersect an array against its own shifted windows."""
    if not phrase:
        raise ValueError("empty phrase")
    if slop < 0:
        raise ValueError("slop must be >= 0")
    uniq = list(dict.fromkeys(phrase))
    filt = index.filter(F.col("token").isin(uniq))
    per_doc = filt.groupBy(id_col).agg(
        *[
            F.first(
                F.when(F.col("token") == t, F.col("positions")),
                ignorenulls=True,
            ).alias(f"_p{i}")
            for i, t in enumerate(uniq)
        ]
    )
    slot = {t: f"_p{i}" for i, t in enumerate(uniq)}

    def _shift(offset: int):
        # closure factory (see phrase_match: defaulted lambda args
        # become the (element, index) HOF form)
        return lambda x: x - F.lit(offset)

    def _window(col, base: int):
        if slop == 0:
            return F.transform(col, _shift(base))
        return F.array_distinct(
            F.concat(
                *[F.transform(col, _shift(base + d)) for d in range(slop + 1)]
            )
        )

    matched = F.col(slot[phrase[0]])
    for j, t in enumerate(phrase[1:], start=1):
        matched = F.array_intersect(matched, _window(F.col(slot[t]), j))
    have_all = None
    for t in uniq:
        cond = F.col(slot[t]).isNotNull()
        have_all = cond if have_all is None else (have_all & cond)
    n = F.when(have_all, F.size(matched)).otherwise(F.lit(0))
    return (
        per_doc.select(F.col(id_col), n.cast("long").alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 0)
    )


def phrase_match(
    index: DataFrame, phrase: list[str], *, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_occurrences) for docs containing the exact phrase.

    Reads only the phrase tokens' postings; one doc-keyed aggregate
    pivots each DISTINCT token's positions array onto the doc row
    (first(when(...)) — a token appears once per doc in the index);
    the count is the shifted positional intersection. Docs missing any
    phrase token drop out (their pivoted array is null)."""
    if not phrase:
        raise ValueError("empty phrase")
    uniq = list(dict.fromkeys(phrase))
    filt = index.filter(F.col("token").isin(uniq))
    per_doc = filt.groupBy(id_col).agg(
        *[
            F.first(
                F.when(F.col("token") == t, F.col("positions")),
                ignorenulls=True,
            ).alias(f"_p{i}")
            for i, t in enumerate(uniq)
        ]
    )
    slot = {t: f"_p{i}" for i, t in enumerate(uniq)}

    def _shift(offset: int):
        # closure factory, NOT a defaulted second lambda arg: PySpark
        # infers HOF arity from the signature, so `lambda x, o=i:`
        # would become the (element, index) form and bind o to the
        # ARRAY INDEX at runtime
        return lambda x: x - F.lit(offset)

    matched = F.col(slot[phrase[0]])
    for i, t in enumerate(phrase[1:], start=1):
        matched = F.array_intersect(
            matched, F.transform(F.col(slot[t]), _shift(i))
        )
    have_all = None
    for t in uniq:
        cond = F.col(slot[t]).isNotNull()
        have_all = cond if have_all is None else (have_all & cond)
    n = F.when(have_all, F.size(matched)).otherwise(F.lit(0))
    return (
        per_doc.select(F.col(id_col), n.cast("long").alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 0)
    )
