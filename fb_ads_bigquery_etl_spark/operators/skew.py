"""Skew-mitigation joins: deterministic key salting.

AQE's skew-join split (spark.sql.adaptive.skewJoin) repairs skewed
SORT-MERGE joins at runtime, but it can't help when (a) the skewed side
feeds a shuffled HASH join, or (b) one key is so hot that a single
post-split partition still dominates. Salting is the planned-ahead fix:
split every hot fact key into S sub-keys and replicate the matching dim
rows S times, so the hot key's rows spread over S reducers.

The reference's dedup key (campaign|ad|date|platform) is exactly the
skewed-key shape this exists for — a handful of big campaigns dominate
row counts (SURVEY.md §4 "salting/AQE-skew handling on the dedup key").

Salt derivation is HASH-BASED, not rand(): `pmod(xxhash64(all fact
columns), S)` — deterministic per row, so retries/speculative tasks
produce identical output (rand() would break exactly-once sinks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join fact⋈dim on ``key`` with an S-way salted key.

    The dim side is exploded S× (dim must be the SMALL side — if it fits
    in memory S times it's usually broadcastable and you don't need
    this; the real use is a dim too big to broadcast joining a fact with
    hot keys). Output columns = fact's + dim's minus the duplicate key.

    Only fact-preserving join types are allowed: replicating the dim
    side S× means any join that preserves UNMATCHED dim rows (right,
    full_outer) would emit each such row S times. inner/left/semi/anti
    never surface unmatched dim rows, so replication is invisible.
    """
    normalized = how.lower().replace("_", "")
    if normalized not in {"inner", "left", "leftouter", "leftsemi", "leftanti", "semi", "anti"}:
        raise ValueError(
            f"salted_join(how={how!r}): only inner/left/left_semi/left_anti "
            "are salt-safe — an outer-preserved dim row would duplicate "
            f"{salt}x. Dedup the dim side or use a plain join for outer types."
        )
    fact_salted = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt))
    )
    dim_salted = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = fact_salted.join(dim_salted, on=[key, "_salt"], how=how)
    return out.drop("_salt")
