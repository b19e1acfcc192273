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

from pyspark.sql import Column, functions as F

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
    idx = F.sequence(F.lit(1), F.greatest(F.size(tok) - (k - 1), F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok, i, k)))
    return F.array_distinct(sh)


def minhash_permutation(h: Column, i: int) -> Column:
    """i-th universal-hash permutation of a 32-bit value: (a*h + b) mod P.

    a_i = 2i+1 (odd), b_i = (i * KNUTH) mod P. Products stay < 2^63.
    """
    a = 2 * i + 1
    b = (i * KNUTH) % MERSENNE_P
    return (h * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)


def minhash_signature(shingle_hashes: Column, num_hashes: int) -> Column:
    """Array of num_hashes MinHash values — computed per-row, no shuffle.

    Empty shingle set -> array of P (sentinel = "no shingles"), so empty
    docs never spuriously collide with real ones except with each other.
    """
    sigs = [
        F.coalesce(
            F.array_min(
                F.transform(shingle_hashes, lambda h, i=i: minhash_permutation(h, i))
            ),
            F.lit(MERSENNE_P).cast("long"),
        )
        for i in range(num_hashes)
    ]
    return F.array(*sigs)


def band_keys(signature: Column, num_bands: int, rows_per_band: int) -> Column:
    """LSH band keys: md5 over each contiguous signature slice + band id.

    Band id is baked into the key so different bands can never collide.
    """
    keys = [
        F.md5(
            F.concat_ws(
                ",",
                F.lit(str(b)),
                *[
                    F.element_at(signature, b * rows_per_band + r + 1).cast("string")
                    for r in range(rows_per_band)
                ],
            )
        )
        for b in range(num_bands)
    ]
    return F.array(*keys)


def simhash60(token_hashes: Column) -> Column:
    """60-bit SimHash over (distinct) 60-bit token hashes.

    Bit j of the result is set when more than half the tokens have bit j
    set. Single pass over the array, all in codegen.
    """
    n = F.size(token_hashes)

    def bit_set_predicate(j: int):
        # single-arg lambda: F.filter passes the element index to 2-arg
        # lambdas, which would clobber a `j=j` default capture
        mask = F.lit(1 << j)
        return lambda h: h.bitwiseAND(mask) != F.lit(0)

    bit_terms = [
        F.when(
            F.size(F.filter(token_hashes, bit_set_predicate(j))) * 2 > n,
            F.lit(1 << j).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for j in range(60)
    ]
    out = bit_terms[0]
    for t in bit_terms[1:]:
        out = out + t
    return out


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
