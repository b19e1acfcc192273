"""Driver contract for the spark-graft builder (PySpark target).

`queries()` is the engine's declared operator inventory (SURVEY.md §2 +
LLM-pipeline extensions); `oracle_sql()` holds the DuckDB-equivalent SQL
for each. Every oracle is written for *bit-exact* parity with the Spark
plan: money/metric sums go through exact DECIMAL accumulation, fuzzy-dedup
hashing is md5-derived (portable), and cosine math uses sequential-order
double accumulation on both sides (see fb_ads_bigquery_etl_spark/
functions/portable.py).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from fb_ads_bigquery_etl_spark.operators import similarity
from fb_ads_bigquery_etl_spark.operators.dedup import exact_content_dedup
from fb_ads_bigquery_etl_spark.operators.fuzzy_dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from fb_ads_bigquery_etl_spark.operators.text import analyze_documents, LANG_MARKERS


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is nanosecond parquet (unsupported natively by Spark);
    read it as raw nanos and truncate to microseconds — exactly what
    DuckDB's µs-precision TIMESTAMP does on the same file."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))


def _dsum(col: Column, alias: str, scale: int = 2) -> Column:
    """Order-independent double sum: exact DECIMAL accumulation, then cast.

    SUM over doubles is order-dependent (shuffle vs single-thread give
    different last bits); casting each element to DECIMAL first makes the
    aggregation exact and associative, hence engine-independent.
    """
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def _dsum_sql(expr: str, alias: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"


# ---------------------------------------------------------------------------
# Reference analytic surface (Q1-Q5 of SURVEY.md §2) + relational coverage
# over the TPC-H-ish tables.
# ---------------------------------------------------------------------------

def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary: scan -> partial/final hash agg."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity"), "sum_qty"),
            _dsum(F.col("l_extendedprice"), "sum_base_price"),
            _dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "sum_disc_price",
                scale=6,
            ),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_freshness(spark, sf_dir):
    """Q2 (docs/DEPLOYMENT.md:448-451): MAX(date) freshness probe."""
    return _t(spark, sf_dir, "orders").agg(F.max("o_orderdate").alias("latest_date"))


def q_daily_rollup(spark, sf_dir):
    """Q3 (docs/DEPLOYMENT.md:453-462): last-7-days rollup, pruned scan."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(
            F.to_date("o_orderdate")
            >= F.date_sub(F.lit("2001-08-01").cast("date"), 7)
        )
        .groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(
            F.count("*").alias("row_count"),
            _dsum(F.col("o_totalprice"), "total_price"),
        )
        .orderBy(F.col("order_date").desc())
    )


def q_freshness_status(spark, sf_dir):
    """Q4 (docs/DEPLOYMENT.md:466-474): OK/MISSING_DATA scalar check."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.max(F.to_date("o_orderdate")).alias("latest_date"),
        F.when(
            F.max(F.to_date("o_orderdate"))
            == F.date_sub(F.lit("2001-08-02").cast("date"), 1),
            F.lit("OK"),
        )
        .otherwise(F.lit("MISSING_DATA"))
        .alias("status"),
    )


def q_count(spark, sf_dir):
    """Q5 (docs/GCP_SETUP.md:362-365): COUNT(*) scan."""
    return _t(spark, sf_dir, "lineitem").agg(F.count("*").alias("row_count"))


def q_distinct(spark, sf_dir):
    """Q1-dedup shape (README.md:383-385): SELECT DISTINCT projection."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
    )


def q_dedup_keepfirst(spark, sf_dir):
    """T1 keep-first dedup: first event per (user_id, event_type) by time.

    The reference's arrival-order set-dedup (main.py:500-515) as a
    row_number window — deterministic under shuffle via total order.
    """
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        e.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


def q_events_pivot(spark, sf_dir):
    """T5 array->wide pivot shape: per-user event_type metric matrix."""
    e = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    pivoted = (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.sum(F.col("value").cast("decimal(18,6)")))
    )
    return pivoted.select(
        "user_id", *[F.col(t).cast("double").alias(t) for t in types]
    )


def q_topk_per_group(spark, sf_dir):
    """Window top-k: 3 highest-value orders per priority class."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_orderpriority", "rank", "o_orderkey", "o_totalprice")
    )


def q_revenue_by_nation(spark, sf_dir):
    """Multi-join + agg: lineitem⋈orders⋈customer⋈nation, broadcast dims."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1996-01-01")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            _dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "revenue",
                scale=6,
            ),
            F.count("*").alias("n_items"),
        )
        .orderBy("n_name")
    )


def q_rollup_region_nation(spark, sf_dir):
    """ROLLUP grouping sets: customer counts by region/nation hierarchy."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]).join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"))
        .orderBy(
            F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first()
        )
    )


def q_sessionize(spark, sf_dir):
    """Stateful sessionization (30-min inactivity gap) via windows."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    us = F.unix_micros(F.col("ts"))
    new_sess = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > 1800 * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.withColumn("_sess", sess)
        .groupBy("user_id")
        .agg(
            F.max("_sess").cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# LLM-pipeline extensions: dedup families, similarity search, text analysis.
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return exact_content_dedup(d, "text", "doc_id").select(
        "doc_id", "source", "n_chars"
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "text", "doc_id", k=3, threshold=0.5)


def q_dedup_minhash_lsh(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "text", "doc_id", k=3, threshold=0.5)


def q_dedup_simhash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return simhash_pairs(d, "text", "doc_id", max_hamming=3)


def q_dedup_embedding(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_pairs(e, threshold=0.4, block_col="label")


def q_ann_brute_force(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return similarity.brute_force_topk(e, list(qvec), k=10)


def q_ann_ivf(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    qvec = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return similarity.ivf_topk(e, list(qvec), k=10, nprobe=2, centroid_mod=50)


def q_text_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return analyze_documents(d).select(
        "doc_id",
        "lang_pred",
        "n_tokens",
        "n_bpe_tokens",
        "stopword_ratio",
        "punct_ratio",
        "quality",
        "fingerprint",
    )


def q_quality_by_source(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    scored = analyze_documents(d)
    return (
        scored.filter(F.col("quality") >= 0.5)
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("total_tokens"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL — shared fragments guarantee the exact same token /
# shingle / hash pipeline as functions/portable.py.
# ---------------------------------------------------------------------------

_TOK = r"list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')"
_SHINGLES = (
    "list_distinct(list_transform(generate_series(1, greatest(len(t)-2, 0)), "
    "i -> array_to_string(t[i:i+2], ' ')))"
)
_P = 4294967311
_KNUTH = 2654435761


def _lang_score_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return f"len(list_filter(t, x -> list_contains([{markers}], x)))"


def _cos_sql(a: str, b: str) -> str:
    dot = (
        f"list_reduce(list_transform(generate_series(1, len({a})), "
        f"i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    )
    na = (
        f"sqrt(list_reduce(list_transform(generate_series(1, len({a})), "
        f"i -> {a}[i] * {a}[i]), (x, y) -> x + y))"
    )
    nb = (
        f"sqrt(list_reduce(list_transform(generate_series(1, len({b})), "
        f"i -> {b}[i] * {b}[i]), (x, y) -> x + y))"
    )
    return f"({dot}) / (({na}) * ({nb}))"


_MINHASH_SIG = (
    f"list_transform(generate_series(0, 31), i -> coalesce("
    f"list_min(list_transform(hs, h -> (h * (2*i+1) + ((i * {_KNUTH}) % {_P})) % {_P})), "
    f"{_P}))"
)

_SIMHASH = (
    "CAST(list_sum(list_transform(generate_series(0, 59), j -> "
    "CASE WHEN 2 * len(list_filter(hs, x -> (x >> j) & 1 = 1)) > len(hs) "
    "THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS BIGINT)"
)

_NORM_TEXT = r"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"


def _oracle() -> dict[str, str]:
    lang_cases = " ".join(
        f"WHEN s_{lang} = g THEN '{lang}'" for lang in sorted(LANG_MARKERS)
    )
    lang_scores = ", ".join(
        f"{_lang_score_sql(lang)} AS s_{lang}" for lang in sorted(LANG_MARKERS)
    )
    greatest = "greatest(" + ", ".join(f"s_{lang}" for lang in sorted(LANG_MARKERS)) + ")"
    bpe = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
    return {
        "pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
                   {_dsum_sql('l_quantity', 'sum_qty')},
                   {_dsum_sql('l_extendedprice', 'sum_base_price')},
                   {_dsum_sql('l_extendedprice * (1.0 - l_discount)', 'sum_disc_price', 6)},
                   COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""",
        "freshness": "SELECT MAX(o_orderdate) AS latest_date FROM orders",
        "daily_rollup": f"""
            SELECT CAST(o_orderdate AS DATE) AS order_date,
                   COUNT(*) AS row_count,
                   {_dsum_sql('o_totalprice', 'total_price')}
            FROM orders
            WHERE CAST(o_orderdate AS DATE) >= DATE '2001-08-01' - INTERVAL 7 DAY
            GROUP BY 1 ORDER BY 1 DESC""",
        "freshness_status": """
            SELECT MAX(CAST(o_orderdate AS DATE)) AS latest_date,
                   CASE WHEN MAX(CAST(o_orderdate AS DATE)) = DATE '2001-08-02' - INTERVAL 1 DAY
                        THEN 'OK' ELSE 'MISSING_DATA' END AS status
            FROM orders""",
        "count_scan": "SELECT COUNT(*) AS row_count FROM lineitem",
        "distinct_projection": (
            "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"
        ),
        "dedup_keepfirst": """
            SELECT user_id, event_type, event_id, ts, value FROM (
              SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) AS rn
              FROM events) WHERE rn = 1""",
        "events_pivot": """
            SELECT user_id,
              CAST(SUM(CASE WHEN event_type='click'    THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS click,
              CAST(SUM(CASE WHEN event_type='error'    THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS error,
              CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS purchase,
              CAST(SUM(CASE WHEN event_type='signup'   THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS signup,
              CAST(SUM(CASE WHEN event_type='view'     THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS view
            FROM events GROUP BY user_id""",
        "topk_per_group": """
            SELECT o_orderpriority, rank, o_orderkey, o_totalprice FROM (
              SELECT o_orderpriority, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
              FROM orders) WHERE rank <= 3""",
        "revenue_by_nation": f"""
            SELECT n_name,
                   {_dsum_sql('l_extendedprice * (1.0 - l_discount)', 'revenue', 6)},
                   COUNT(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey  = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
            GROUP BY n_name ORDER BY n_name""",
        "rollup_region_nation": """
            SELECT r_name, n_name, COUNT(*) AS n_customers
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP (r_name, n_name)
            ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""",
        "sessionize": """
            WITH g AS (
              SELECT user_id, event_id,
                CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                          OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                     THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
            s AS (
              SELECT user_id,
                SUM(new_sess) OVER (PARTITION BY user_id ORDER BY event_id ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
              FROM (SELECT user_id, event_id, new_sess FROM g))
            SELECT user_id, CAST(MAX(sess) AS BIGINT) AS n_sessions,
                   COUNT(*) AS n_events
            FROM s GROUP BY user_id ORDER BY user_id""",
        "dedup_exact": f"""
            SELECT doc_id, source, n_chars FROM documents
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY md5({_NORM_TEXT}) ORDER BY doc_id ASC) = 1""",
        "dedup_ngram_jaccard": f"""
            WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
            shl AS (SELECT doc_id, {_SHINGLES} AS shingles FROM toks),
            sh AS (SELECT doc_id, unnest(shingles) AS s FROM shl),
            sz AS (SELECT doc_id, len(shingles) AS n FROM shl),
            common AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b, c / (sa.n + sb.n - c) AS jaccard
            FROM common
            JOIN sz sa ON id_a = sa.doc_id
            JOIN sz sb ON id_b = sb.doc_id
            WHERE c / (sa.n + sb.n - c) >= 0.5""",
        "dedup_minhash_lsh": f"""
            WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
            shl AS (SELECT doc_id, {_SHINGLES} AS shingles FROM toks),
            hashed AS (SELECT doc_id, shingles,
                list_transform(shingles, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS hs
              FROM shl),
            sigs AS (SELECT doc_id, shingles, {_MINHASH_SIG} AS sig FROM hashed),
            bands AS (
              SELECT doc_id, md5(concat_ws(',', b::VARCHAR,
                       sig[4*b+1]::VARCHAR, sig[4*b+2]::VARCHAR,
                       sig[4*b+3]::VARCHAR, sig[4*b+4]::VARCHAR)) AS band_key
              FROM sigs, (SELECT unnest(generate_series(0, 7)) AS b)),
            cands AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a JOIN bands b
                ON a.band_key = b.band_key AND a.doc_id < b.doc_id)
            SELECT id_a, id_b,
                   len(list_intersect(sa.shingles, sb.shingles)) /
                   (len(sa.shingles) + len(sb.shingles)
                    - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard
            FROM cands
            JOIN sigs sa ON id_a = sa.doc_id
            JOIN sigs sb ON id_b = sb.doc_id
            WHERE len(list_intersect(sa.shingles, sb.shingles)) /
                  (len(sa.shingles) + len(sb.shingles)
                   - len(list_intersect(sa.shingles, sb.shingles))) >= 0.5""",
        "dedup_simhash": f"""
            WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
            hashed AS (SELECT doc_id,
                list_transform({_SHINGLES},
                               x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
              FROM toks),
            fp AS (SELECT doc_id, {_SIMHASH} AS simhash FROM hashed)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
            FROM fp a JOIN fp b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""",
        "dedup_embedding": f"""
            WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
                       FROM embeddings)
            SELECT id_a, id_b, cosine FROM (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     {_cos_sql('a.e', 'b.e')} AS cosine
              FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id)
            WHERE cosine >= 0.4""",
        "ann_brute_force": f"""
            WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                       FROM embeddings),
            q AS (SELECT e AS qe FROM v WHERE vec_id = 0)
            SELECT vec_id, {_cos_sql('e', 'qe')} AS score
            FROM v, q ORDER BY score DESC, vec_id ASC LIMIT 10""",
        "ann_ivf": f"""
            WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                       FROM embeddings),
            q AS (SELECT e AS qe FROM v WHERE vec_id = 0),
            cents AS (SELECT vec_id AS centroid_id, e AS ce FROM v
                      WHERE vec_id % 50 = 0),
            assign AS (
              SELECT vec_id, e, centroid_id AS bucket FROM (
                SELECT v.vec_id, v.e, c.centroid_id,
                       ROW_NUMBER() OVER (PARTITION BY v.vec_id
                         ORDER BY {_cos_sql('v.e', 'c.ce')} DESC, c.centroid_id ASC) AS rn
                FROM v, cents c) WHERE rn = 1),
            probed AS (
              SELECT centroid_id FROM cents, q
              ORDER BY {_cos_sql('ce', 'qe')} DESC, centroid_id ASC LIMIT 2)
            SELECT vec_id, {_cos_sql('e', 'qe')} AS score
            FROM assign JOIN probed ON bucket = centroid_id, q
            ORDER BY score DESC, vec_id ASC LIMIT 10""",
        "text_stats": f"""
            WITH base AS (
              SELECT doc_id, text, {_TOK} AS t FROM documents),
            scored AS (
              SELECT doc_id, text, t, {lang_scores},
                     len(t) AS n_tok,
                     len(regexp_extract_all(text, '{bpe}')) AS n_bpe,
                     len(list_filter(t, x -> list_contains(
                         [{', '.join(repr(m) for m in LANG_MARKERS['en'])}], x))) AS n_stop,
                     len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                     length(text) AS n_chars
              FROM base)
            SELECT doc_id,
                   CASE WHEN {greatest} = 0 THEN 'und' {lang_cases} END AS lang_pred,
                   CAST(n_tok AS BIGINT) AS n_tokens,
                   CAST(n_bpe AS BIGINT) AS n_bpe_tokens,
                   n_stop / greatest(n_tok, 1) AS stopword_ratio,
                   n_punct / greatest(n_chars, 1) AS punct_ratio,
                   (CAST(least(n_tok, 256) AS DOUBLE) / 256.0) * 0.4
                     + least((n_stop / greatest(n_tok, 1)) * 4.0, 1.0) * 0.4
                     + (1.0 - n_punct / greatest(n_chars, 1)) * 0.2 AS quality,
                   md5({_NORM_TEXT}) AS fingerprint
            FROM (SELECT *, g FROM (SELECT *, {greatest} AS g FROM scored))""",
        "quality_by_source": f"""
            WITH base AS (SELECT doc_id, source, text, {_TOK} AS t FROM documents),
            scored AS (
              SELECT source, len(t) AS n_tok,
                     len(list_filter(t, x -> list_contains(
                         [{', '.join(repr(m) for m in LANG_MARKERS['en'])}], x))) AS n_stop,
                     len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                     length(text) AS n_chars
              FROM base)
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(CAST(n_tok AS BIGINT)) AS BIGINT) AS total_tokens
            FROM scored
            WHERE (CAST(least(n_tok, 256) AS DOUBLE) / 256.0) * 0.4
                  + least((n_stop / greatest(n_tok, 1)) * 4.0, 1.0) * 0.4
                  + (1.0 - n_punct / greatest(n_chars, 1)) * 0.2 >= 0.5
            GROUP BY source ORDER BY source""",
    }


_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pricing_summary": q_pricing_summary,
    "freshness": q_freshness,
    "daily_rollup": q_daily_rollup,
    "freshness_status": q_freshness_status,
    "count_scan": q_count,
    "distinct_projection": q_distinct,
    "dedup_keepfirst": q_dedup_keepfirst,
    "events_pivot": q_events_pivot,
    "topk_per_group": q_topk_per_group,
    "revenue_by_nation": q_revenue_by_nation,
    "rollup_region_nation": q_rollup_region_nation,
    "sessionize": q_sessionize,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_embedding": q_dedup_embedding,
    "ann_brute_force": q_ann_brute_force,
    "ann_ivf": q_ann_ivf,
    "text_stats": q_text_stats,
    "quality_by_source": q_quality_by_source,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return _oracle()
