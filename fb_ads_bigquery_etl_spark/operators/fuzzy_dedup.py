"""Fuzzy / near-duplicate detection operators (LLM-pipeline extensions).

Four families, all shuffle-disciplined for 100 TB:

  * n-gram Jaccard join — exact near-dup pairs via shingle inverted index.
  * MinHash + LSH      — signatures computed per-row (narrow), candidates
                         via band-bucket join, verified with exact Jaccard.
  * SimHash            — 60-bit fingerprints per-row; pairs via pigeonhole
                         banding (EXACT for a Hamming radius, not approx).
  * Embedding cosine   — see operators/similarity.py.

Scale design notes:
  - Signatures/fingerprints are pure projections: zero shuffle until the
    candidate join, whose left/right sides carry only (id, key) pairs.
  - The shingle inverted index drops ultra-frequent shingles (document
    frequency cap) — the classic skew killer for text corpora.
  - Verification joins re-attach the shingle arrays by id, so the wide
    text columns never ride through the candidate-generation shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from fb_ads_bigquery_etl_spark.functions.portable import (
    band_keys,
    bind,
    hash32,
    hash60,
    hamming60,
    minhash_signature,
    simhash60,
    tokens,
    word_shingles,
)

NUM_HASHES = 32
NUM_BANDS = 8
ROWS_PER_BAND = 4


def shared(df: DataFrame) -> DataFrame:
    """Persist a subresult consumed by multiple plan branches.

    Catalyst/AQE do NOT reuse exchanges across the sides of these
    self-joins (verified empirically: the signature pipeline was executed
    once per consumer), so an explicit cache is what makes the expensive
    tokenize->shingle->md5 projection run ONCE over the corpus.
    MEMORY_AND_DISK: columnar in-memory with disk spill — at extreme
    scale swap for DISK_ONLY or accept recompute (narrow, CPU-only).
    Lifecycle: lazy (no-op until an action); lives until session end or
    `unpersist()` — these operators are one-shot pipeline stages, so the
    caller owns cleanup for long-lived sessions.
    """
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def spread(df: DataFrame) -> DataFrame:
    """Ensure compute-heavy projections aren't serialized on few tasks.

    A small single-file parquet scan yields one input partition, which
    would run the whole hash/shingle projection on one core. At real
    scale inputs already have >= cores partitions and this is a no-op.

    EXCHANGE-SAFE: the partition-count probe (`df.rdd`) finalizes the
    AQE plan, which materializes any upstream exchanges — free on a
    scan or a checkpoint-backed frame (no exchanges), but on a
    joined/aggregated frame it would EXECUTE the upstream pipeline
    just to read a number. So the probe only runs when the frame's
    physical plan is EXCHANGE-FREE (a narrow pipeline over a scan or
    localCheckpoint — planning the string costs nothing and runs
    nothing); frames with pending exchanges pass through untouched —
    they already carry the parallelism their producing shuffle chose
    (r13 ADVICE item; the guard closes the footgun for arbitrary
    caller frames reaching score_documents/analyze_documents).
    """
    try:
        plan = df._jdf.queryExecution().sparkPlan().toString()
    except Exception:
        return df
    if "Exchange" in plan:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def with_shingles(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Project (id, shingles: array<string>) — narrow, no shuffle."""
    return spread(df).select(
        F.col(id_col).alias("id"),
        word_shingles(tokens(F.col(text_col)), k).alias("shingles"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """EXACT Jaccard-similar pairs via shingle inverted index.

    explode(shingles) -> self-join on shingle -> count shared shingles per
    pair -> |A∩B| / (|A|+|B|-|A∩B|) >= threshold. Any pair with
    similarity >= threshold shares >= 1 shingle, so the inverted index
    loses nothing (for threshold > 0).

    ``max_doc_freq`` drops shingles appearing in more than that many docs
    — they generate quadratic candidate blowup but can only support
    low-similarity pairs; at corpus scale this cap is what keeps the
    self-join tractable. None = exact (default for oracle parity).
    """
    sh = shared(with_shingles(df, text_col, id_col, k))
    sizes = sh.select("id", F.size("shingles").alias("n_shingles"))
    # Join on a 64-bit hash of the shingle, not the string: the self-join
    # shuffles every posting twice, and an 8-byte key halves-or-better the
    # shuffle bytes vs variable-length shingle text while keeping the pair
    # set exact up to xxhash64 collisions (~1e-9 at 1e5 distinct shingles).
    inv = sh.select("id", F.explode("shingles").alias("s")).select(
        "id", F.xxhash64("s").alias("shingle")
    )
    if max_doc_freq is not None:
        freq = inv.groupBy("shingle").agg(F.count("*").alias("_df"))
        inv = (
            inv.join(F.broadcast(freq.filter(F.col("_df") <= max_doc_freq)), "shingle")
            .drop("_df")
        )
    a = inv.alias("a")
    b = inv.alias("b")
    pair_counts = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        pair_counts.join(sa, F.col("id_a") == F.col("sa.id"))
        .join(sb, F.col("id_b") == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            (
                F.col("n_common")
                / (F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """EXACT Jaccard-similar pairs via PREFIX FILTERING (the
    AllPairs/PPJoin candidate bound, Bayardo et al. 2007 / Xiao et al.
    2008) — same answer as `ngram_jaccard_pairs`, far fewer candidate
    pairs.

    The inverted-index join emits a candidate for EVERY shared shingle;
    hot shingles make that quadratic, and the `max_doc_freq` escape
    hatch buys tractability by LOSING pairs. Prefix filtering keeps
    exactness: order each doc's shingles by global rarity (ascending
    document frequency, shingle-hash tiebreak — one canonical total
    order), and index only each doc's first `n - ceil(t*n) + 1`
    shingles. If Jacc(A,B) >= t then |A∩B| >= ceil(t*|A|), so the
    common shingles cannot all hide in A's last `ceil(t*|A|) - 1`
    positions — the rarity-smallest common shingle sits in BOTH
    prefixes, and the prefix index finds every qualifying pair. Rare-
    first ordering makes surviving postings the LOW-frequency ones, so
    the self-join's per-key fan-out collapses (the 100 TB win: candidate
    volume tracks true-pair volume, not hot-key df^2).

    `ceil(t*n)` uses exact integer arithmetic on threshold's decimal
    fraction — float `ceil(0.6 * 5)` is 4, not 3.

    Verification is one narrow pass per candidate: join the pair back
    to the two hashed-shingle arrays, `size(array_intersect(...))`
    gives |A∩B| exactly (xxhash64 collisions ~1e-9 at 1e5 shingles).
    """
    from fractions import Fraction

    frac = Fraction(str(threshold))
    num, den = frac.numerator, frac.denominator

    sh = shared(
        with_shingles(df, text_col, id_col, k).select(
            "id",
            F.sort_array(
                F.transform("shingles", lambda s: F.xxhash64(s))
            ).alias("toks"),
        )
    )
    postings = sh.select("id", F.explode("toks").alias("tok"))
    dfreq = postings.groupBy("tok").agg(F.count("*").alias("_df"))
    # canonical rare-first order per doc: sort (df, tok) structs — the
    # order is per-doc local, so no global rank materializes
    ordered = (
        postings.join(dfreq, "tok")
        .groupBy("id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_df"), F.col("tok")))
            ).alias("arr")
        )
        .select(
            "id",
            F.transform("arr", lambda s: s["tok"]).alias("by_rarity"),
            F.size("arr").alias("n"),
        )
    )
    prefix_len = (
        F.col("n")
        - ((F.col("n") * num + (den - 1)) / den).cast("long")  # ceil(t*n)
        + 1
    ).cast("int")
    prefix = ordered.select(
        "id", F.explode(F.slice("by_rarity", F.lit(1), prefix_len)).alias("tok")
    )
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = sh.select(F.col("id").alias("id_a"), F.col("toks").alias("_ta"))
    sb = sh.select(F.col("id").alias("id_b"), F.col("toks").alias("_tb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("_ta", "_tb")).alias("_c"),
            F.size("_ta").alias("_na"),
            F.size("_tb").alias("_nb"),
        )
        .select(
            "id_a",
            "id_b",
            (
                F.col("_c") / (F.col("_na") + F.col("_nb") - F.col("_c"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, *, k: int = 3, num_hashes: int = NUM_HASHES
) -> DataFrame:
    """(id, shingles, signature: array<bigint>) — one narrow projection.

    The shingle-hash array is let-bound (portable.bind) before the
    per-permutation min loop: the outer transform in minhash_signature
    re-evaluates its child expression once per permutation, which would
    re-run the tokenize->shingle->md5 pipeline num_hashes times per row
    if the array were an inline expression. No shuffle, no barrier.
    """
    sh = with_shingles(df, text_col, id_col, k)
    return sh.select(
        "id",
        "shingles",
        bind(
            F.transform(F.col("shingles"), lambda s: hash32(s)),
            lambda hs: minhash_signature(hs, num_hashes),
        ).alias("signature"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    k: int = 3,
    threshold: float = 0.5,
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
) -> DataFrame:
    """MinHash-LSH candidate pairs verified with exact Jaccard.

    Candidate generation: explode band keys (num_bands rows per doc, each
    a 32-char key + id — tiny), self-join on band key, distinct pairs.
    Verification: re-attach shingle arrays by id and compute exact
    Jaccard via array_intersect/array_union, keep >= threshold.

    Deterministic end-to-end (md5-derived hashes), hence oracle-matchable.
    """
    rows_per_band = num_hashes // num_bands
    # One cached pass computes signatures + shingles; the band self-join
    # (both sides) and the verification joins all read the cache instead
    # of re-running the md5/minhash pipeline per consumer (4x at worst).
    sigs = shared(minhash_signatures(df, text_col, id_col, k=k, num_hashes=num_hashes))
    banded = sigs.select(
        "id",
        F.explode(band_keys(F.col("signature"), num_bands, rows_per_band)).alias(
            "band_key"
        ),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh = sigs.select("id", "shingles")
    sa = sh.alias("sa")
    sb = sh.alias("sb")
    return (
        cands.join(sa, F.col("id_a") == F.col("sa.id"))
        .join(sb, F.col("id_b") == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect(F.col("sa.shingles"), F.col("sb.shingles")))
                / F.size(F.array_union(F.col("sa.shingles"), F.col("sb.shingles")))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """(id, simhash: bigint) — 60-bit fingerprint, per-row projection.

    Fingerprints k-word SHINGLES, not unigram tokens: with a small
    vocabulary every document contains nearly every token, so token-level
    simhashes collapse onto a few values and hamming-radius search
    degenerates to all-pairs. Shingle sets are (near-)unique per document
    and keep the fingerprint discriminative.
    """
    sh_hashes = F.transform(
        word_shingles(tokens(F.col(text_col)), k), lambda s: hash60(s)
    )
    # bind: simhash60's per-bit filter loop re-evaluates its child 60x per
    # row when it's an inline expression; the let-binding computes the
    # tokenize->shingle->md5 array once. coalesce makes the fingerprint
    # non-nullable, so joins on derived block values can never infer an
    # isnotnull(simhash) predicate that clones the whole pipeline into a
    # pushed-down scan filter (observed 20x slowdown without it).
    fp = F.coalesce(bind(sh_hashes, simhash60), F.lit(0).cast("long"))
    return spread(df).select(F.col(id_col).alias("id"), fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    max_hamming: int = 3,
    bits: int = 60,
) -> DataFrame:
    """All pairs with Hamming(simhash_a, simhash_b) <= max_hamming — EXACT.

    Pigeonhole banding: split the fingerprint into (max_hamming + 1)
    contiguous blocks; any pair within the radius must agree on at least
    one whole block, so joining per-block finds every qualifying pair —
    this is exact recall, not approximation. Join keys are
    (block_id, block_value) ints; the fingerprint table itself is two
    bigints per doc, so this scales to billions of docs.
    """
    n_blocks = max_hamming + 1
    block_bits = bits // n_blocks
    mask = (1 << block_bits) - 1
    # Cached: both sides of the block-key self-join read one materialized
    # fingerprint table ((id, simhash) = 16 B/row), so fingerprinting runs
    # once over the corpus rather than once per join side.
    fp = shared(simhash_fingerprints(df, text_col, id_col))
    blocks = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_id"),
                        F.shiftright(F.col("simhash"), i * block_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("block_val"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("blk"),
    ).select("id", "simhash", "blk.block_id", "blk.block_val")
    a = blocks.alias("a")
    b = blocks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block_id") == F.col("b.block_id"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming60(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
