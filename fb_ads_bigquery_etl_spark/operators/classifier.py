"""Linear text classifier over hashed n-gram features — the
fastText-style quality filter (Joulin et al. 2016; the shape behind
CCNet/GPT-3-style "looks like reference text" corpus filters).

A production curation pass scores every document with a linear model:
hash the document's word uni/bigrams into B buckets, sum the buckets'
learned weights, threshold. At 100 TB the only viable plan is exactly
that shape: one narrow corpus pass to explode features (array-side
n-gram construction, no window), a BROADCAST join against the
vocab-sized weight table, and a map-side-combined per-doc sum. Nothing
data-sized shuffles except the doc-keyed partial aggregate.

Engine-exactness: feature hashing uses portable.hash32 (md5-based,
bit-identical in DuckDB); weights are INTEGER milli-units so the score
is pure BIGINT accumulation — no float order-dependence, no libm. The
`quality_classifier` oracle gate replays the whole pipeline in SQL.

Training is out of scope (weights arrive as a table, e.g. exported
from a fastText/liblinear fit); this module is the inference pass a
pipeline runs per-corpus, which is where the 100 TB cost lives.

No reference counterpart (north-star extension, BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from fb_ads_bigquery_etl_spark.functions.portable import hash32, tokens


def hashed_text_features(text: Column, *, include_bigrams: bool = True) -> Column:
    """Array of feature strings: word unigrams plus (optionally) space-
    joined bigrams. Array-side construction — no explode until the
    caller chooses, no window, no UDF.

    DuckDB replay: unigrams are the token list; bigrams are
    ``list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' ||
    t[i+1])`` (guarded to [] for short docs — Spark's sequence(1, 0)
    is DESCENDING, the word_shingles trap).
    """
    tok = tokens(text)

    def feats_of(t: Column) -> Column:
        uni = t
        if not include_bigrams:
            return uni
        big = F.when(
            F.size(t) >= 2,
            F.transform(
                F.slice(t, 1, F.size(t) - 1),
                lambda w, i: F.concat(w, F.lit(" "), F.get(t, i + 1)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.concat(uni, big)

    # bind: evaluate the token array once, not once per lambda element
    from fb_ads_bigquery_etl_spark.functions.portable import bind

    return bind(tok, feats_of)


def feature_bucket(feat: Column, buckets: int) -> Column:
    """Stable bucket in [0, buckets) — hash32 is non-negative, so a
    plain modulus matches DuckDB's ``%``."""
    return (hash32(feat) % F.lit(buckets)).cast("long")


def score_documents(
    df: DataFrame,
    weights: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1 << 18,
    bias_milli: int = 0,
    include_bigrams: bool = True,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document linear score over hashed features.

    `weights` is (bucket: long, weight_milli: long) — vocab-sized, it
    BROADCASTS (plan-pinned by tests/test_plans.py); missing buckets
    weigh 0 (feature hashing leaves most of the table implicit). Output
    one row per input doc: (id, *extra_cols, n_feats, score_milli,
    prediction) with score_milli = bias + sum of feature weights
    (BIGINT-exact) and prediction = score_milli > 0. Docs with no
    features score at bias.

    `extra_cols` are doc-level passthrough columns (functionally
    dependent on the id) carried THROUGH the doc-keyed groupBy — the
    alternative is a second doc-count-sized shuffle join back to the
    corpus just to recover them, a full extra corpus-keyset shuffle at
    100 TB.
    """
    feats = df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.explode_outer(
            hashed_text_features(F.col(text_col), include_bigrams=include_bigrams)
        ).alias("_feat"),
    ).select(
        id_col,
        *extra_cols,
        feature_bucket(F.col("_feat"), buckets).alias("_bucket"),
    )
    scored = (
        feats.join(F.broadcast(weights), feats["_bucket"] == weights["bucket"], "left")
        .groupBy(id_col, *extra_cols)
        .agg(
            F.count("_bucket").cast("long").alias("n_feats"),
            (
                F.coalesce(F.sum("weight_milli"), F.lit(0)).cast("long")
                + F.lit(bias_milli).cast("long")
            ).alias("score_milli"),
        )
        .withColumn("prediction", F.col("score_milli") > 0)
    )
    return scored


def synthetic_weights(spark, *, buckets: int, seed_mult: int = 2654435761, mod: int = 2001) -> DataFrame:
    """Deterministic pseudo-weight table for tests/gates: weight(b) =
    (b * seed_mult) % mod - (mod-1)/2, i.e. integers in roughly
    [-1000, 1000] milli-units. Arithmetic on both engines — the oracle
    derives the same weights inline instead of shipping a fixture."""
    return spark.range(buckets).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * F.lit(seed_mult)) % F.lit(mod) - F.lit((mod - 1) // 2))
        .cast("long")
        .alias("weight_milli"),
    )
