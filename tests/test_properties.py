"""Property-based checks (SURVEY §5.4): dedup semantics against a
pandas oracle over generated inputs, salted == unsalted equivalence.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from fb_ads_bigquery_etl_spark.operators.dedup import (
    dedup_keep_first,
    salted_dedup_keep_first,
)

KEY = ["campaign_name", "ad_name", "date_start", "publisher_platform"]
COLS = [*KEY, "spend", "_ingest_order"]

_row = st.tuples(
    st.sampled_from(["c1", "c2", "c3"]),
    st.sampled_from(["a1", "a2"]),
    st.sampled_from(["2026-01-01", "2026-01-02"]),
    st.sampled_from(["facebook", "instagram"]),
    st.floats(min_value=0, max_value=100, allow_nan=False),
)


@st.composite
def _datasets(draw):
    rows = draw(st.lists(_row, min_size=1, max_size=30))
    return [(*r, i) for i, r in enumerate(rows)]  # ingest order = position


def _oracle_first(rows: list[tuple]) -> dict[tuple, float]:
    pdf = pd.DataFrame(rows, columns=COLS)
    first = pdf.sort_values("_ingest_order").groupby(KEY, as_index=False).first()
    return {tuple(r[k] for k in KEY): r["spend"] for _, r in first.iterrows()}


_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from fb_ads_bigquery_etl_spark.session import get_spark

        _spark = get_spark("props", master="local[4]", shuffle_partitions=4)
    return _spark


@given(_datasets())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_keep_first_matches_pandas_oracle(rows):
    spark = _get_spark()
    df = spark.createDataFrame(rows, COLS).repartition(3)  # shuffle the arrival
    got = {
        tuple(r[k] for k in KEY): r["spend"] for r in dedup_keep_first(df).collect()
    }
    assert got == _oracle_first(rows)


@given(_datasets())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_salted_equals_unsalted(rows):
    spark = _get_spark()
    df = spark.createDataFrame(rows, COLS).repartition(3)
    plain = {tuple(sorted(map(str, r))) for r in dedup_keep_first(df).collect()}
    salted = {
        tuple(sorted(map(str, r)))
        for r in salted_dedup_keep_first(df, salt_buckets=4).collect()
    }
    assert plain == salted


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["g1", "g2", "g3"]),
            st.integers(min_value=0, max_value=10_000),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[1],  # unique keys: ranks must be total
    ),
    st.sampled_from([1, 3, 64]),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_topk_per_group_matches_pandas_oracle(rows, subshards):
    """Two-phase hash-agg top-k == per-group k-smallest by (hash, key)
    computed driver-side, for arbitrary group/key distributions and
    sub-shard counts."""
    import hashlib

    from fb_ads_bigquery_etl_spark.operators.sampling import (
        topk_per_group_hashrank,
    )

    spark = _get_spark()
    df = spark.createDataFrame(rows, ["g", "k"]).repartition(3)
    got = {
        (r["g"], r["k"], r["rk"])
        for r in topk_per_group_hashrank(
            df, "g", "k", 3, subshards=subshards
        ).collect()
    }

    def h(key):
        return int(hashlib.md5(f"rsv:{key}".encode()).hexdigest()[:8], 16)

    want = set()
    for g in {r[0] for r in rows}:
        members = sorted((h(k), k) for gg, k in rows if gg == g)[:3]
        want |= {(g, k, i + 1) for i, (_, k) in enumerate(members)}
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2"]),
            st.integers(min_value=0, max_value=5_000),
            st.integers(min_value=0, max_value=600),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[1],  # doc ids unique
    ),
    st.sampled_from([1, 16, 10**9]),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_pack_chunks_sharded_matches_pandas_oracle(rows, width):
    """Sub-shard packing == driver-side sequential packing for random
    (group, id, token-count) corpora at several shard widths."""
    from fb_ads_bigquery_etl_spark.operators.packing import pack_chunks_sharded

    spark = _get_spark()
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_tokens"]).repartition(3)
    got = {
        (r["source"], r["doc_id"], r["n_tokens"], r["chunk_id"], r["spans_chunks"])
        for r in pack_chunks_sharded(df, shard_width=width, budget=64).collect()
    }
    def tdiv(a: int, b: int) -> int:
        # Spark's double-division+cast and DuckDB's // both truncate
        # toward zero; Python // floors — matters for (end-1) == -1
        # when a zero-token doc opens a group
        return -((-a) // b) if a < 0 else a // b

    want = set()
    for g in {r[0] for r in rows}:
        cum = 0
        for _, did, n in sorted((r for r in rows if r[0] == g), key=lambda r: r[1]):
            start, end = cum, cum + n
            want.add(
                (g, did, n, tdiv(start, 64), tdiv(start, 64) != tdiv(end - 1, 64))
            )
            cum = end
    assert got == want


@given(
    st.lists(
        st.text(alphabet=" abcde", min_size=0, max_size=120), min_size=1, max_size=12
    ),
    st.tuples(st.integers(2, 8), st.integers(1, 8)).filter(lambda t: t[1] <= t[0]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_chunk_token_windows_matches_python_oracle(texts, size_stride):
    """Sliding-window chunking == a sequential Python splitter for random
    whitespace corpora (incl. empty/whitespace-only docs) across
    size/stride combos — coverage, overlap, bounds, and hashes."""
    import hashlib

    from fb_ads_bigquery_etl_spark.operators.packing import chunk_token_windows

    size, stride = size_stride
    spark = _get_spark()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        (r["doc_id"], r["chunk_idx"], r["chunk_start"], r["chunk_len"], r["chunk_hash"])
        for r in chunk_token_windows(df, size=size, stride=stride).collect()
    }
    want = set()
    for i, t in enumerate(texts):
        tok = [w for w in t.lower().split() if w]
        if not tok:
            continue
        n_chunks = (max(len(tok) - size, 0) + stride - 1) // stride + 1
        for c in range(n_chunks):
            w = tok[c * stride : c * stride + size]
            want.add(
                (
                    i,
                    c,
                    c * stride,
                    len(w),
                    hashlib.md5(" ".join(w).encode()).hexdigest(),
                )
            )
    assert got == want


def test_chunk_token_windows_rejects_bad_args():
    import pytest

    from fb_ads_bigquery_etl_spark.operators.packing import chunk_token_windows

    spark = _get_spark()
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    for size, stride in ((0, 1), (4, 0), (4, 5)):
        with pytest.raises(ValueError):
            chunk_token_windows(df, size=size, stride=stride)


def test_zscore_norms_standardization_property():
    """Sum over vectors of each dim's squared z-score == n (the defining
    property of z-scoring), so sum of znorm^2 == n_dims * n_vectors —
    up to the 1e-12 quantization of the stats accumulators. A constant
    dimension (std == 0) must contribute exactly zero."""
    from fb_ads_bigquery_etl_spark.operators.similarity import zscore_norms

    spark = _get_spark()
    rows = [(i, [float(i), 7.0, float(i % 3) * 2.5]) for i in range(40)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = zscore_norms(df, "vec_id", "embedding").collect()
    assert len(out) == 40
    total = sum(r["znorm"] ** 2 for r in out)
    # dims 0 and 2 vary (each contributes n=40), dim 1 is constant -> 0
    assert abs(total - 80.0) < 1e-6, total


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),   # basket/group id
            st.integers(min_value=0, max_value=12),  # item id
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_pair_supports_matches_bruteforce(rows):
    """Fused basket expansion == itertools.combinations over deduped
    baskets, for arbitrary duplicate-heavy incidence lists."""
    import itertools
    from collections import Counter

    from fb_ads_bigquery_etl_spark.operators.basket import pair_supports

    spark = _get_spark()
    df = spark.createDataFrame(rows, ["g", "item"]).repartition(3)
    got = {
        (r["pa"], r["pb"]): r["support"]
        for r in pair_supports(df, "g", "item").collect()
    }
    baskets = {}
    for g, item in rows:
        baskets.setdefault(g, set()).add(item)
    want = Counter()
    for items in baskets.values():
        for pa, pb in itertools.combinations(sorted(items), 2):
            want[(pa, pb)] += 1
    assert got == dict(want)


@given(
    st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_triangle_stats_matches_bruteforce(raw_edges):
    """Degree-oriented closure == brute-force triangle enumeration on
    random small graphs (self-loops dropped, edges canonicalized)."""
    import itertools

    from fb_ads_bigquery_etl_spark.operators.graph import triangle_stats

    edges = {(min(a, b), max(a, b)) for a, b in raw_edges if a != b}
    if not edges:
        return
    spark = _get_spark()
    df = spark.createDataFrame(sorted(edges), ["pa", "pb"]).repartition(2)
    row = triangle_stats(df).collect()[0]
    nodes = {n for e in edges for n in e}
    want = sum(
        1
        for a, b, c in itertools.combinations(sorted(nodes), 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    )
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # day offset
            st.integers(min_value=0, max_value=6),   # id
        ),
        min_size=1,
        max_size=50,
    ),
    st.sampled_from([1, 3, 7]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_rolling_distinct_matches_bruteforce(rows, win):
    """Scatter + keyed distinct == per-day brute-force lookback over
    the observed day set."""
    import datetime

    from fb_ads_bigquery_etl_spark.operators.temporal import rolling_distinct

    base = datetime.date(2026, 1, 1)
    data = [(base + datetime.timedelta(days=d), i) for d, i in rows]
    spark = _get_spark()
    df = spark.createDataFrame(data, ["day", "id"]).repartition(3)
    got = {
        r["day"]: r["n_distinct"]
        for r in rolling_distinct(df, "day", "id", days=win).collect()
    }
    days = sorted({d for d, _ in data})
    want = {
        day: len(
            {
                i
                for d, i in data
                if 0 <= (day - d).days < win
            }
        )
        for day in days
    }
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["k1", "k2"]),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=25,
    ),
    st.lists(
        st.tuples(
            st.sampled_from(["k1", "k2"]),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=25,
    ),
    st.sampled_from(["backward", "forward"]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_asof_join_matches_pandas_merge_asof(lrows, rrows, direction):
    """Union+keyed-window as-of == pandas merge_asof for both
    directions over generated (key, ts) streams. Right ts values are
    deduped per key (merge_asof's tie handling among equal right ts
    differs from our documented right_order rule, which the unit tests
    pin separately)."""
    from fb_ads_bigquery_etl_spark.operators.temporal import asof_join

    rrows = list({(k, t): None for k, t in rrows})  # dedup (key, ts)
    spark = _get_spark()
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)], ["key", "ts", "lid"]
    ).repartition(3)
    right = spark.createDataFrame(
        [(k, t, t) for k, t in rrows], ["key", "ts", "rts"]
    ).repartition(2)
    got = {
        (r["key"], r["ts"], r["lid"]): r["asof_rts"]
        for r in asof_join(
            left, right, on=["key"], left_ts="ts", right_ts="ts",
            right_cols=["rts"], direction=direction,
        ).collect()
    }
    lpdf = (
        pd.DataFrame([(k, t, i) for i, (k, t) in enumerate(lrows)],
                     columns=["key", "ts", "lid"])
        .sort_values("ts", kind="stable")
    )
    rpdf = (
        pd.DataFrame([(k, t, t) for k, t in rrows],
                     columns=["key", "ts", "rts"])
        .sort_values("ts", kind="stable")
    )
    merged = pd.merge_asof(
        lpdf, rpdf, on="ts", by="key", direction=direction,
        allow_exact_matches=True, suffixes=("", "_r"),
    )
    want = {
        (r["key"], r["ts"], r["lid"]): (None if pd.isna(r["rts"]) else int(r["rts"]))
        for _, r in merged.iterrows()
    }
    assert got == want


_bpe_word = st.text(alphabet="abc", min_size=0, max_size=8)
_bpe_pair = st.tuples(
    st.sampled_from(["a", "b", "c", "ab", "bc", "aa", "abc"]),
    st.sampled_from(["a", "b", "c", "ab", "bc", "aa"]),
)


def _seq_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """The spec: rank order, one greedy leftmost-nonoverlap pass/rank."""
    syms = list(word)
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


@given(
    st.lists(_bpe_word, min_size=1, max_size=12, unique=True),
    st.lists(_bpe_pair, min_size=1, max_size=6),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_bpe_encode_pandas_twin_matches_sequential(words, merges):
    """apply_merges_pandas (the production scale path) == the sequential
    spec on arbitrary words/tables — incl. overlapping-run pairs like
    (a, a) and multi-char ranks consuming earlier ranks' output."""
    from fb_ads_bigquery_etl_spark.operators.bpe import apply_merges_pandas

    spark = _get_spark()
    words = [w for w in words if w]
    if not words:
        return
    df = spark.createDataFrame([(w,) for w in words], ["wid"])
    got = {
        r["wid"]: r["toks"]
        for r in apply_merges_pandas(df, merges).collect()
    }
    assert got == {w: _seq_encode(w, merges) for w in words}


# --- prefix-filtered exact Jaccard join (PPJoin bound) ---

_words = st.sampled_from(
    ["key", "agg", "row", "scan", "slow", "fast", "table", "value"]
)
_doc = st.lists(_words, min_size=1, max_size=12).map(" ".join)


@given(st.lists(_doc, min_size=2, max_size=14), st.sampled_from([0.4, 0.5, 0.6, 0.75]))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_prefix_jaccard_equals_full_inverted_index(texts, threshold):
    """The prefix filter must lose NOTHING: pair set and jaccard values
    equal the full inverted-index join at every threshold."""
    from fb_ads_bigquery_etl_spark.operators.fuzzy_dedup import (
        ngram_jaccard_pairs,
        prefix_jaccard_pairs,
    )

    spark = _get_spark()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    ).repartition(3)
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "text", "doc_id", k=2, threshold=threshold
        ).collect()
    }
    pref = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_jaccard_pairs(
            df, "text", "doc_id", k=2, threshold=threshold
        ).collect()
    }
    assert pref == full


def test_prefix_jaccard_prunes_candidates():
    """The point of the bound: prefix postings (hence candidate volume)
    must be a strict, large reduction vs the full inverted index on a
    corpus with hot shingles."""
    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.fuzzy_dedup import (
        prefix_jaccard_pairs,
        with_shingles,
    )

    spark = _get_spark()
    sf_dir = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = prefix_jaccard_pairs(df, "text", "doc_id", k=3, threshold=0.6)
    n_pairs = pairs.count()
    assert n_pairs >= 1  # the synthetic corpus carries near-dups

    # measure posting reduction: full index postings vs prefix postings
    sh = with_shingles(df, "text", "doc_id", 3).select(
        "id", F.size("shingles").alias("n")
    )
    full_postings = sh.agg(F.sum("n")).head()[0]
    # prefix keeps n - ceil(0.6 n) + 1 of n per doc (~40%)
    prefix_postings = sh.agg(
        F.sum(
            F.col("n") - ((F.col("n") * 3 + 4) / 5).cast("long") + 1
        )
    ).head()[0]
    assert prefix_postings * 2 < full_postings, (
        prefix_postings,
        full_postings,
    )


@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40),
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=200),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_bloom_prune_never_drops_matches(dim_keys, fact_keys):
    """Property: for ANY key sets, bloom_prune(fact) ⋈ dim equals
    fact ⋈ dim — the filter may pass false positives, never drop a
    true match."""
    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.sketch import (
        bloom_bitmap,
        bloom_prune,
    )

    spark = _get_spark()
    dim = spark.createDataFrame([(k,) for k in set(dim_keys)], ["k"])
    fact = spark.createDataFrame(
        [(k, i) for i, k in enumerate(fact_keys)], ["k", "v"]
    ).repartition(3)
    bm = bloom_bitmap(dim, "k", bits=512, k=2)
    pruned = bloom_prune(fact, bm, "k", bits=512, k=2)
    got = sorted((r["k"], r["v"]) for r in pruned.join(dim, "k").collect())
    want = sorted((r["k"], r["v"]) for r in fact.join(dim, "k").collect())
    assert got == want


_ivfpq_tpl = None


def _ivfpq_template(spark):
    """Build the shared sf0.001 IVF-PQ index ONCE per test process and
    collect the driver-side replay inputs (centroids + raw vectors);
    each hypothesis example copies the directory and deletes into the
    copy."""
    global _ivfpq_tpl
    if _ivfpq_tpl is None:
        import os
        import tempfile

        from fb_ads_bigquery_etl_spark.operators import similarity
        from fb_ads_bigquery_etl_spark.operators.pq import (
            build_ivfpq_index,
        )
        from tests.conftest import SF_DIR

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        cents_df = similarity.train_centroids_exact(
            emb, k=4, iters=1
        ).localCheckpoint(eager=True)
        path = os.path.join(tempfile.mkdtemp(prefix="ivfpq_tpl_"), "idx")
        build_ivfpq_index(
            emb, path, in_dim=64, m=4, ksub=8, centroids=cents_df
        )
        cents = [
            (int(r["centroid_id"]), [float(x) for x in r["cvec"]])
            for r in cents_df.collect()
        ]
        vecs = {
            int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for r in emb.collect()
        }
        _ivfpq_tpl = {
            "path": path,
            "cents": cents,
            "vecs": vecs,
            "qvec": vecs[7],
        }
    return _ivfpq_tpl


@given(
    st.sets(st.integers(min_value=0, max_value=499), max_size=40),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_ivfpq_delete_probe_matches_python_oracle(deleted):
    """For ARBITRARY tombstone sets, the persisted-index probe with
    expand covering every candidate must equal a driver-side replay:
    exact cosine ranking over the probed buckets' vectors minus the
    deleted ids (ties to the lowest id) — i.e. logical deletes filter
    BEFORE candidate selection, never producing a deleted id and never
    skipping a live one."""
    import math
    import os
    import shutil

    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators import similarity
    from fb_ads_bigquery_etl_spark.operators.pq import (
        delete_from_ivfpq_index,
        query_ivfpq_index,
    )
    from tests.conftest import SF_DIR

    spark = _get_spark()
    tpl = _ivfpq_template(spark)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qvec = tpl["qvec"]

    work = tpl["path"] + f"_w{abs(hash(frozenset(deleted))) % (1 << 30)}"
    if os.path.exists(work):
        shutil.rmtree(work)
    shutil.copytree(tpl["path"], work)
    for side in ("_centroids", "_codebooks"):
        shutil.copytree(tpl["path"] + side, work + side)
    try:
        if deleted:
            delete_from_ivfpq_index(
                spark,
                emb.filter(F.col("vec_id").isin(sorted(deleted))).select(
                    "vec_id"
                ),
                work,
            )
        k = 5
        got = [
            r["vec_id"]
            for r in query_ivfpq_index(
                spark,
                work,
                qvec,
                k=k,
                nprobe=2,
                expand=200,  # k*expand=1000 >= all 500 rows: no ADC cut
                rerank_src=emb,
            ).collect()
        ]
    finally:
        shutil.rmtree(work, ignore_errors=True)
        for side in ("_centroids", "_codebooks", "_tombstones"):
            shutil.rmtree(work + side, ignore_errors=True)

    # driver-side replay from the raw vectors + the frozen centroids
    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return dot / (na * nb)

    cents = tpl["cents"]  # [(centroid_id, cvec)]
    vecs = tpl["vecs"]  # {vec_id: vector}
    assign = {
        i: min(
            cents, key=lambda c: (-cos(v, c[1]), c[0])
        )[0]
        for i, v in vecs.items()
    }
    probed = {
        c[0]
        for c in sorted(cents, key=lambda c: (-cos(qvec, c[1]), c[0]))[:2]
    }
    cand = [
        i
        for i in vecs
        if assign[i] in probed and i not in deleted
    ]
    want = [
        i
        for i in sorted(cand, key=lambda i: (-cos(vecs[i], qvec), i))[:5]
    ]
    assert got == want, (got, want, sorted(deleted)[:10])


_ivfpq_asgn = None


def _ivfpq_assignment(spark):
    """(id -> bucket) ground truth collected ONCE from the shared
    template's code table (sf0.001, 4 buckets, 500 vectors)."""
    global _ivfpq_asgn
    if _ivfpq_asgn is None:
        tpl = _ivfpq_template(spark)
        _ivfpq_asgn = {
            int(r["id"]): int(r["bucket"])
            for r in spark.read.parquet(tpl["path"])
            .select("id", "bucket")
            .collect()
        }
    return _ivfpq_asgn


@given(
    st.sets(st.integers(min_value=0, max_value=600), max_size=60),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_ivfpq_maintenance_matches_python_replay(deleted):
    """For ARBITRARY delete sets — including PHANTOM ids (> 499) never
    present in the index — the whole maintenance surface must equal a
    driver-side replay over the ground-truth assignment: the pre-compact
    audit (both the read-only manifest path and the exact scan), the set
    of buckets compaction reports (tombstoned AND at least one live
    row), compaction's convergence to [] on the second call, the
    retained tombstones (exactly the fully-dead buckets' ids — applied
    ones released, phantoms pruned), and the post-compact audit."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.pq import (
        _read_tombstones,
        compact_ivfpq_index,
        delete_from_ivfpq_index,
        ivfpq_index_stats,
    )

    spark = _get_spark()
    tpl = _ivfpq_template(spark)
    asgn = _ivfpq_assignment(spark)

    work = tpl["path"] + f"_m{abs(hash(frozenset(deleted))) % (1 << 30)}"
    for side in ("", "_centroids", "_codebooks", "_manifest"):
        if os.path.exists(work + side):
            shutil.rmtree(work + side)
        shutil.copytree(tpl["path"] + side, work + side)
    try:
        if deleted:
            delete_from_ivfpq_index(
                spark,
                spark.createDataFrame(
                    [(int(i),) for i in sorted(deleted)], "vec_id long"
                ),
                work,
            )

        # python replay over the ground-truth assignment
        buckets = sorted(set(asgn.values()))
        total = {b: 0 for b in buckets}
        dead = {b: 0 for b in buckets}
        for i, b in asgn.items():
            total[b] += 1
            if i in deleted:
                dead[b] += 1
        pre = {b: (total[b] - dead[b], dead[b]) for b in buckets}

        for um in (None, False):
            got = {
                int(r["bucket"]): (int(r["n_live"]), int(r["n_deleted"]))
                for r in ivfpq_index_stats(
                    spark, work, use_manifest=um
                ).collect()
            }
            assert got == pre, (um, got, pre)

        want_work = sorted(
            b for b in buckets if dead[b] > 0 and total[b] > dead[b]
        )
        assert compact_ivfpq_index(spark, work) == want_work
        assert compact_ivfpq_index(spark, work) == []  # converges

        tomb = _read_tombstones(spark, work)
        remaining = (
            set()
            if tomb is None
            else {int(r["id"]) for r in tomb.collect()}
        )
        want_remaining = {
            i
            for i, b in asgn.items()
            if i in deleted and total[b] == dead[b]
        }
        assert remaining == want_remaining

        post = {
            b: ((total[b] - dead[b], 0) if total[b] > dead[b] else (0, dead[b]))
            for b in buckets
        }
        got_post = {
            int(r["bucket"]): (int(r["n_live"]), int(r["n_deleted"]))
            for r in ivfpq_index_stats(spark, work).collect()
        }
        assert got_post == post
    finally:
        for side in ("", "_centroids", "_codebooks", "_manifest",
                     "_tombstones"):
            shutil.rmtree(work + side, ignore_errors=True)


@given(
    st.sets(st.integers(min_value=0, max_value=600), max_size=60),
)
@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_ivfpq_merge_after_churn_matches_rebuild(deleted):
    """Extends the maintenance property through the round-13 MERGE
    verb: for ARBITRARY delete sets (phantoms included), delete ->
    compact -> merge-the-2-coldest must either (a) REFUSE when
    compaction retained tombstones (a fully-dead bucket's ids are
    still indexed but absent from the live corpus — the documented
    tombstone/stranded contract; rebuild is the escape), or (b)
    produce a code table EXACTLY equal to a from-scratch build over
    the live corpus at the shrunk centroid set with the same frozen
    codebooks — the rebuild-equality invariant under churn."""
    import os
    import shutil

    import pytest as _pytest
    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.pq import (
        build_ivfpq_index,
        compact_ivfpq_index,
        delete_from_ivfpq_index,
        load_codebooks,
        merge_ivfpq_buckets,
    )
    from tests.conftest import SF_DIR

    spark = _get_spark()
    tpl = _ivfpq_template(spark)
    asgn = _ivfpq_assignment(spark)

    work = tpl["path"] + f"_g{abs(hash(frozenset(deleted))) % (1 << 30)}"
    ref = work + "_rebuild"
    sides = ("", "_centroids", "_codebooks", "_manifest", "_tombstones")
    for side in sides[:4]:
        if os.path.exists(work + side):
            shutil.rmtree(work + side)
        shutil.copytree(tpl["path"] + side, work + side)
    try:
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        live = emb
        if deleted:
            delete_from_ivfpq_index(
                spark,
                spark.createDataFrame(
                    [(int(i),) for i in sorted(deleted)], "vec_id long"
                ),
                work,
            )
            compact_ivfpq_index(spark, work)
            live = emb.filter(
                ~F.col("vec_id").isin([int(i) for i in deleted])
            )

        total: dict[int, int] = {}
        dead: dict[int, int] = {}
        for i, b in asgn.items():
            total[b] = total.get(b, 0) + 1
            if i in deleted:
                dead[b] = dead.get(b, 0) + 1
        fully_dead = any(total[b] == dead.get(b, 0) for b in total)

        if fully_dead:
            with _pytest.raises(
                ValueError, match="pending tombstones|absent from src"
            ):
                merge_ivfpq_buckets(spark, live, work)
            return
        merge_ivfpq_buckets(spark, live, work)
        shrunk = spark.read.parquet(f"{work}_centroids").localCheckpoint(
            eager=True
        )
        cb = load_codebooks(spark, work)
        build_ivfpq_index(
            live, ref, in_dim=64, m=4, ksub=8, centroids=shrunk,
            codebooks=cb,
        )
        got = sorted(
            tuple(r)
            for r in spark.read.parquet(work)
            .select("id", "codes", F.col("bucket").cast("long"))
            .collect()
        )
        want = sorted(
            tuple(r)
            for r in spark.read.parquet(ref)
            .select("id", "codes", F.col("bucket").cast("long"))
            .collect()
        )
        assert got == want
    finally:
        for base in (work, ref):
            for side in sides:
                shutil.rmtree(base + side, ignore_errors=True)
