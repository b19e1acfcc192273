"""Training-sequence packing (concat-then-chunk) over a sharded corpus.

The GPT-style packing pass: within each shard (group), documents
concatenate in a stable order and are cut every `budget` tokens; each
document reports the chunk its first token lands in and whether it
straddles a chunk boundary. The core primitive is a per-group running
token total — a prefix sum.

Two formulations with identical output:

- `pack_chunks`: ONE cumulative-sum window per group. Correct, minimal,
  but the window partition is the whole group: with few groups (the
  `documents` table has 20 sources) the entire corpus funnels into
  n_groups tasks — a guaranteed straggler at 100 TB.
- `pack_chunks_sharded`: the scale path. The group's order column is cut
  into contiguous sub-shards (floor(order / width)); each sub-shard
  cum-sums independently (window keyed (group, sub) — parallelism is
  groups x sub-shards), sub-shard token totals aggregate into one TINY
  frame (one row per sub-shard), a prefix sum over THAT yields each
  sub-shard's global offset, and a broadcast join stitches offset +
  local cumsum into the exact global prefix sum. The only window that
  ever sees corpus-sized input is keyed by (group, sub); the
  group-keyed offset window runs over #sub-shards rows (metadata).

No reference counterpart (north-star extension, BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _with_chunk_columns(
    df: DataFrame,
    cum_col: str,
    tokens_col: str,
    budget: int,
    out_cols: list[str],
) -> DataFrame:
    """Chunk id/straddle from a cumulative token total — via integer
    `div`, never float division: (x / budget).cast('long') rounds once
    cumulative tokens pass 2^53, which a 100 TB corpus reaches.
    `div` truncates toward zero (matching DuckDB `//`); the only
    negative operand is cum-1 == -1 for a zero-token doc opening a
    group, where truncation is the pinned cross-engine behavior."""
    return (
        df.withColumn("_start", F.col(cum_col) - F.col(tokens_col))
        .withColumn("_endm1", F.col(cum_col) - F.lit(1))
        .select(
            *out_cols,
            F.col(tokens_col).cast("long").alias("n_tokens"),
            F.expr(f"_start div {budget}").alias("chunk_id"),
            (
                F.expr(f"_start div {budget}")
                != F.expr(f"_endm1 div {budget}")
            ).alias("spans_chunks"),
        )
    )


def pack_chunks(
    sized: DataFrame,
    *,
    group_col: str = "source",
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 512,
) -> DataFrame:
    """Reference formulation: one cum-sum window per group.

    Use only when groups are plentiful relative to the cluster (real
    shard keys, thousands of shards); for few-group corpora use
    `pack_chunks_sharded`.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sized.withColumn("_cum_after", F.sum(tokens_col).over(w))
    return _with_chunk_columns(
        cum, "_cum_after", tokens_col, budget, [group_col, order_col]
    )


def pack_chunks_sharded(
    sized: DataFrame,
    *,
    group_col: str = "source",
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 512,
    shard_width: int = 4096,
) -> DataFrame:
    """Scale formulation: sub-shard cum-sums + offset stitching.

    `shard_width` bounds the max window partition at the number of rows
    whose `order_col` falls in one [i*width, (i+1)*width) range —
    independent of group count and corpus size. The offset computation
    touches one row per (group, sub-shard): with 100 TB and width
    chosen so sub-shards hold ~1e6 docs, that frame is ~1e5 rows —
    driver-trivial, broadcast-trivial.

    Output is bit-identical to `pack_chunks` (prefix sums associate:
    global cumsum = sub-shard offset + local cumsum, all exact BIGINT
    arithmetic).
    """
    sub = F.floor(F.col(order_col) / shard_width)  # order-preserving cut
    local = sized.withColumn("_sub", sub).withColumn(
        "_lcum",
        F.sum(tokens_col).over(
            Window.partitionBy(group_col, "_sub")
            .orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    totals = (
        sized.withColumn("_sub", sub)
        .groupBy(group_col, "_sub")
        .agg(F.sum(tokens_col).alias("_tot"))
    )
    # Prefix-sum of PRIOR sub-shard totals: a group-keyed window, but
    # over the totals frame (one row per sub-shard) — metadata-sized.
    offsets = totals.withColumn(
        "_off",
        F.coalesce(
            F.sum("_tot").over(
                Window.partitionBy(group_col)
                .orderBy("_sub")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        ),
    ).select(group_col, "_sub", "_off")
    stitched = local.join(F.broadcast(offsets), [group_col, "_sub"]).withColumn(
        "_gcum", F.col("_off") + F.col("_lcum")
    )
    return _with_chunk_columns(
        stitched, "_gcum", tokens_col, budget, [group_col, order_col]
    )


def chunk_token_windows(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Overlapping token-window chunking — the RAG/pretraining splitter.

    Each document becomes ceil(max(n-size, 0)/stride) + 1 chunks of at
    most `size` tokens, consecutive chunks overlapping by `size-stride`
    tokens (the standard sliding-window splitter ahead of embedding or
    context-window packing). Pure expression work: tokenize once
    (let-bound), build the chunk-index sequence, explode, slice — no
    shuffle at all; the plan stays a narrow projection whatever the
    corpus size, and downstream grouping shuffles only (id, chunk) rows.

    Emits one row per chunk: *id_cols, chunk_idx (0-based), chunk_start
    (0-based token offset), chunk_len, chunk_hash (md5 of the
    space-joined window — the dedup/lineage key for chunk-level exact
    dedup). Empty docs yield zero rows, matching the oracle's UNNEST
    semantics. All integer arithmetic; DuckDB replays it bit-for-bit.

    No reference counterpart (north-star extension, BASELINE.json).
    """
    from fb_ads_bigquery_etl_spark.functions.portable import bind, tokens

    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")

    def chunks_of(tok: Column) -> Column:
        n = F.size(tok)
        n_chunks = F.when(
            n > 0,
            (F.greatest(n - size, F.lit(0)) + (stride - 1)) / F.lit(stride)
        ).otherwise(F.lit(0))
        # integer ceil-div via floor on exact ints (values are tiny)
        n_chunks = F.floor(n_chunks).cast("int") + F.when(n > 0, 1).otherwise(0)
        # Guard: sequence(0, -1) is a DESCENDING sequence in Spark, so an
        # empty doc must map to an explicit empty array, not sequence().
        idx = F.when(
            n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx,
            lambda i: F.struct(
                i.cast("long").alias("chunk_idx"),
                (i * stride).cast("long").alias("chunk_start"),
                F.slice(tok, i * stride + 1, size).alias("_w"),
            ),
        )

    exploded = df.select(
        *[F.col(c) for c in id_cols],
        F.explode(bind(tokens(F.col(text_col)), chunks_of)).alias("_c"),
    )
    return exploded.select(
        *id_cols,
        F.col("_c.chunk_idx").alias("chunk_idx"),
        F.col("_c.chunk_start").alias("chunk_start"),
        F.size("_c._w").cast("long").alias("chunk_len"),
        F.md5(F.concat_ws(" ", F.col("_c._w"))).alias("chunk_hash"),
    )
