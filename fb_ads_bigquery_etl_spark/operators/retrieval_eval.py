"""Retrieval-quality evaluation: nDCG@k and reciprocal rank per query
— the eval harness a retrieval stack ships with (Järvelin & Kekäläinen
2002 for DCG; MRR is the classic QA metric). Runs over any (query_id,
neighbor_id, rank) ranking frame against a graded relevance derived
from a corpus label column: rel = greatest(0, 3 - |label_q - label_d|).

Engine-exactness: the position discounts 1/log2(r+1) are the one
libm-dependent piece of nDCG, so they are PRECOMPUTED micro-unit
integer literals (the same table inlines into the Spark expressions
and the DuckDB oracle — the libm-log dodge BM25's idf already uses).
DCG accumulates as pure BIGINT (rel * disc_micro), order-independent;
IDCG derives ARITHMETICALLY from per-grade relevant-doc counts and a
cumulative-discount literal table — no ideal-ranking sort. The only
doubles are one IEEE division per query for ndcg (dcg/idcg) and one
for the reciprocal rank (1/first_rank), both correctly rounded
identically by any engine.

Scale shape: the ranking input is k rows per query (bounded, it
BROADCASTS into the corpus label scan); the ideal side needs only the
corpus LABEL HISTOGRAM — label-cardinality rows from one map-side-
combined aggregate — cross-joined with the (tiny) query-label list.
Nothing corpus-sized shuffles; no window touches the corpus.

No reference counterpart (north-star extension, BASELINE.json).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

# discount table for ranks 1..K_MAX (micro-units of 1/log2(r+1)) and
# its cumulative prefix — module-level so the oracle SQL inlines the
# SAME literals
K_MAX = 10
DISC_MICRO = [
    int(round(1_000_000 / math.log2(r + 1))) for r in range(1, K_MAX + 1)
]
CUM_DISC_MICRO = [0]
for _d in DISC_MICRO:
    CUM_DISC_MICRO.append(CUM_DISC_MICRO[-1] + _d)


def relevance_grade(label_q, label_d):
    """Graded relevance in {0..3} from label affinity:
    greatest(0, 3 - |label_q - label_d|). Pure integer arithmetic —
    both engines state it identically."""
    return F.greatest(
        F.lit(0).cast("long"),
        (F.lit(3) - F.abs(label_q - label_d)).cast("long"),
    )


def ndcg_mrr(
    ranked: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    rank_col: str = "rank",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Per-query (query_id, dcg_micro, idcg_micro, ndcg, rr,
    n_rel_in_k) from a (query, doc, rank<=k) frame plus the corpus
    (id, label) table.

    CONTRACT: every query id and every ranked doc id MUST be a corpus
    id. The label joins are inner (the only shape that lets the
    bounded ranking frame broadcast into one corpus scan — a fail-loud
    outer join would force a corpus-sized shuffle just to validate),
    so an id absent from the corpus silently contributes no rel_rows:
    its ranked positions score 0 relevance and a fully-unlabeled query
    disappears from the output. Callers joining rankings produced
    OUTSIDE the corpus must pre-filter to corpus ids.

    IDCG@k of a graded labeling needs only HOW MANY docs of each grade
    exist: the ideal list takes min(c3, k) grade-3 docs first, then
    grade-2 into the remaining slots, then grade-1 — so
    idcg = 3*CUM[n3] + 2*(CUM[n3+n2]-CUM[n3]) + (CUM[n3+n2+n1]-
    CUM[n3+n2]) with CUM the cumulative discount literals. The grade
    counts come from the corpus LABEL HISTOGRAM (self-doc excluded) —
    label-cardinality-sized, so the whole ideal side is metadata."""
    if k > K_MAX:
        raise ValueError(f"k={k} exceeds the precomputed table ({K_MAX})")
    disc = F.array(*[F.lit(d).cast("long") for d in DISC_MICRO])
    cum = F.array(*[F.lit(c).cast("long") for c in CUM_DISC_MICRO])
    labels = corpus.select(
        F.col(id_col).alias("_id"), F.col(label_col).alias("_lab")
    )
    qlab = labels.select(
        F.col("_id").alias(query_col), F.col("_lab").alias("_qlab")
    ).join(
        F.broadcast(ranked.select(query_col).distinct()), query_col
    )
    # bounded ranking frame broadcasts into the corpus label scan
    rel_rows = (
        labels.withColumnRenamed("_id", doc_col)
        .join(
            F.broadcast(ranked.filter(F.col(rank_col) <= k)), doc_col
        )
        .join(F.broadcast(qlab), query_col)
        .select(
            query_col,
            F.col(rank_col),
            relevance_grade(F.col("_qlab"), F.col("_lab")).alias("_rel"),
        )
    )
    per_q = rel_rows.groupBy(query_col).agg(
        F.sum(
            F.col("_rel") * F.element_at(disc, F.col(rank_col).cast("int"))
        )
        .cast("long")
        .alias("dcg_micro"),
        F.min(F.when(F.col("_rel") > 0, F.col(rank_col))).alias("_first_rel"),
        F.sum((F.col("_rel") > 0).cast("long")).alias("n_rel_in_k"),
    )
    # ideal side: corpus label histogram (label-cardinality rows) x
    # query labels; subtract the self doc from its own label's bin
    hist = labels.groupBy("_lab").agg(F.count("*").alias("_n"))
    grade = relevance_grade(F.col("_qlab"), F.col("_lab"))
    counts = (
        qlab.crossJoin(F.broadcast(hist))
        .select(
            query_col,
            grade.alias("_g"),
            (
                F.col("_n")
                - F.when(F.col("_lab") == F.col("_qlab"), 1).otherwise(0)
            ).alias("_n"),
        )
        .groupBy(query_col)
        .agg(
            F.sum(F.when(F.col("_g") == 3, F.col("_n")).otherwise(0))
            .cast("long")
            .alias("_c3"),
            F.sum(F.when(F.col("_g") == 2, F.col("_n")).otherwise(0))
            .cast("long")
            .alias("_c2"),
            F.sum(F.when(F.col("_g") == 1, F.col("_n")).otherwise(0))
            .cast("long")
            .alias("_c1"),
        )
    )
    n3 = F.least(F.col("_c3"), F.lit(k).cast("long"))
    n2 = F.least(F.col("_c2"), F.lit(k) - n3)
    n1 = F.least(F.col("_c1"), F.lit(k) - n3 - n2)

    def _cum(n):
        return F.element_at(cum, (n + 1).cast("int"))

    idcg = (
        F.lit(3) * _cum(n3)
        + F.lit(2) * (_cum(n3 + n2) - _cum(n3))
        + (_cum(n3 + n2 + n1) - _cum(n3 + n2))
    ).cast("long")
    joined = per_q.join(F.broadcast(counts), query_col)
    return joined.select(
        query_col,
        "dcg_micro",
        idcg.alias("idcg_micro"),
        F.when(
            idcg > 0,
            F.col("dcg_micro").cast("double") / idcg.cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("ndcg"),
        F.when(
            F.col("_first_rel").isNotNull(),
            F.lit(1.0) / F.col("_first_rel").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("rr"),
        "n_rel_in_k",
    )
