"""Portable deterministic primitives.

Every fuzzy-dedup / text operator in this engine is built on hashes and
arithmetic that any ANSI-ish engine (here: DuckDB as the correctness
oracle) computes bit-identically. That keeps the operators testable
end-to-end against an independent implementation — and, at 100 TB,
means results are reproducible across engine versions (md5 is stable;
Spark's internal xxhash64/murmur seeds are not a public contract).

All functions return Column expressions — JVM-side, inside
WholeStageCodegen; no Python UDFs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, functions as F


def bind(value: Column, f: Callable[[Column], Column]) -> Column:
    """Let-binding at the expression level: evaluate ``value`` exactly once
    per row and hand it to ``f`` as a bound lambda variable.

    Two Catalyst behaviors make this necessary for expensive subtrees
    (tokenize -> shingle -> md5 pipelines):

    1. Higher-order functions re-evaluate any non-trivial child expression
       on every iteration of an enclosing lambda — ``transform(seq, i ->
       array_min(transform(HS, ...)))`` computes HS once per outer element.
    2. Optimizer rules clone subtrees wholesale: InferFiltersFromConstraints
       + PushDownPredicate will copy a nullable join key's entire defining
       expression into an ``isnotnull`` filter at the scan.

    ``transform`` over a 1-element array turns the subtree into a bound
    variable: evaluated once, and every downstream reference is a cheap
    variable lookup. ``get`` (0-based, null-safe) unwraps the result.
    """
    return F.get(F.transform(F.array(value), f), 0)

# Prime > 2^32 for universal hashing (classic MinHash choice).
MERSENNE_P = 4294967311

# Knuth multiplicative constant; used to derive per-permutation offsets.
KNUTH = 2654435761


def hash32(col: Column) -> Column:
    """First 32 bits of md5 as a non-negative BIGINT in [0, 2^32).

    DuckDB equivalent: ``('0x' || substr(md5(x), 1, 8))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hash60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT (fits in int64).

    DuckDB equivalent: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens, empties removed.

    DuckDB: ``list_filter(string_split_regex(lower(x), '\\s+'), t -> t <> '')``.
    """
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != F.lit(""))


def word_shingles(tok: Column, k: int = 3) -> Column:
    """Distinct k-word shingles from a token array.

    DuckDB: ``list_distinct(list_transform(generate_series(1, len(t)-k+1),
    i -> array_to_string(t[i:i+k-1], ' ')))`` (1-based inclusive slices).
    """
    # Guard: sequence(1, 0) is DESCENDING in Spark ([1, 0]); a token array
    # shorter than k must yield an explicit empty array or slice(t, 0, k)
    # raises INVALID_PARAMETER_VALUE.START.
    n = F.size(tok) - (k - 1)
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok, i, k)))
    return F.array_distinct(sh)


def minhash_permutation(h: Column, i: Column) -> Column:
    """i-th universal-hash permutation of a 32-bit value: (a*h + b) mod P.

    a_i = 2i+1 (odd), b_i = (i * KNUTH) mod P — all integer arithmetic,
    products stay < 2^63. `i` is a Column so one shared lambda covers all
    permutations (an unrolled per-i expression tree makes Catalyst
    analysis/codegen cost dominate small jobs).
    """
    a = i * 2 + F.lit(1)
    b = (i * F.lit(KNUTH)) % F.lit(MERSENNE_P)
    return (h * a + b) % F.lit(MERSENNE_P)


def minhash_signature(shingle_hashes: Column, num_hashes: int) -> Column:
    """Array of num_hashes MinHash values — computed per-row, no shuffle.

    Nested higher-order functions (transform over permutation indices,
    inner transform over shingle hashes) keep the expression tree O(1)
    in num_hashes. Empty shingle set -> array of P (sentinel), so empty
    docs never spuriously collide with real ones except with each other.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.coalesce(
            F.array_min(
                F.transform(shingle_hashes, lambda h: minhash_permutation(h, i))
            ),
            F.lit(MERSENNE_P).cast("long"),
        ),
    )


def band_keys(signature: Column, num_bands: int, rows_per_band: int) -> Column:
    """LSH band keys: md5 over each contiguous signature slice + band id.

    Band id is baked into the key so different bands can never collide.
    The signature column is referenced exactly ONCE (slice inside one
    shared lambda) — per-position element_at references would let
    CollapseProject duplicate the whole signature expression per band.
    Callers should still materialize the signature behind an exchange
    (see minhash_lsh_pairs) before exploding band keys.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda b: F.md5(
            F.concat_ws(
                ",",
                b.cast("string"),
                F.array_join(
                    F.transform(
                        F.slice(signature, b * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string"),
                    ),
                    ",",
                ),
            )
        ),
    )


def winnowing_fingerprints(text: Column, k: int = 5, w: int = 4) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken):
    rolling character k-gram hashes, min per sliding window of w, distinct
    + sorted. The standard plagiarism/near-dup fingerprint — guarantees
    any shared substring of length >= k+w-1 shares a fingerprint.

    Pure per-row expression (narrow, no shuffle); md5-derived gram hashes
    keep it bit-portable (DuckDB twin in __spark_entry__). Both the
    normalized text and the hash array are let-bound (`bind`) — the
    sliding-window transform references them once per row, not once per
    window position.
    """

    norm = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))

    def grams_of(t: Column) -> Column:
        n = F.length(t) - (k - 1)
        return F.when(
            n >= F.lit(1),
            F.transform(
                F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                lambda i: t.substr(i, F.lit(k)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    hs = F.transform(bind(norm, grams_of), hash32)

    def windows_of(h: Column) -> Column:
        m = F.size(h) - (w - 1)
        wins = F.when(
            m >= F.lit(1),
            F.transform(
                F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
                lambda j: F.array_min(F.slice(h, j, w)),
            ),
        ).otherwise(F.array().cast("array<bigint>"))
        return F.array_sort(F.array_distinct(wins))

    return bind(hs, windows_of)


def simhash60(token_hashes: Column) -> Column:
    """60-bit SimHash over (distinct) 60-bit token hashes.

    Bit j of the result is set when more than half the tokens have bit j
    set. Expressed with nested higher-order functions (per-bit transform
    over a shared filter lambda) so the expression tree stays O(1) in the
    bit width — a 60-way unrolled tree makes Catalyst planning dominate.
    All integer arithmetic: bit-exact in any engine.
    """
    n = F.size(token_hashes)
    masks = F.array(*[F.lit(1 << j).cast("long") for j in range(60)])
    bit_values = F.transform(
        masks,
        lambda mask: F.when(
            F.size(F.filter(token_hashes, lambda h: h.bitwiseAND(mask) != F.lit(0)))
            * 2
            > n,
            mask,
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bit_values, F.lit(0).cast("long"), lambda acc, v: acc + v)


def hamming60(a: Column, b: Column) -> Column:
    """Hamming distance between two 60-bit simhashes: bit_count(a XOR b)."""
    return F.bit_count(a.bitwiseXOR(b))


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-order double dot product of two numeric arrays.

    Left-to-right accumulation => bit-identical to any engine that sums a
    zipped product list in index order (DuckDB list_dot_product).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
