"""Bucketed-table join locality: the pay-the-shuffle-once-at-ingest
layout. The assertions prove the 100 TB claim locally: a join between
two tables bucketed on the join key plans ZERO shuffle exchanges.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fb_ads_bigquery_etl_spark.plans import inspect as PI
from fb_ads_bigquery_etl_spark.sinks import write_bucketed
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # self-heal after an interrupted run: a killed session can leave the
    # managed-table DIRECTORY behind with no catalog entry, and the next
    # saveAsTable fails with LOCATION_ALREADY_EXISTS
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "okey"),
        "orders_b",
        ["okey"],
        n_buckets=8,
        sort_cols=["okey"],
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "okey"),
        "lineitem_b",
        ["okey"],
        n_buckets=8,
        sort_cols=["okey"],
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    # disable auto-broadcast so the join strategy is the bucketed SMJ,
    # which is what a 100 TB fact-fact join would use
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("orders_b")
        li = spark.table("lineitem_b")
        joined = li.join(o, "okey").groupBy("o_orderpriority").agg(
            F.count("*").alias("n")
        )
        nc = PI.node_counts(joined)
        assert nc["SortMergeJoin"] >= 1, nc
        # the ONLY exchange allowed is the one for the final groupBy —
        # the join itself must not shuffle either side
        assert nc["Exchange"] <= 1, nc
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    o = spark.table("orders_b")
    li = spark.table("lineitem_b")
    got = li.join(o, "okey").count()
    want = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF_DIR}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    assert got == want


def test_bucketed_groupby_on_bucket_key_is_shuffle_free(spark, bucketed_tables):
    li = spark.table("lineitem_b")
    agg = li.groupBy("okey").agg(F.sum("l_quantity").alias("q"))
    assert PI.node_counts(agg)["Exchange"] == 0


def test_zorder_write_produces_narrow_file_rectangles(spark, tmp_path):
    """The z-ordered layout must cover a far smaller total (a, b)
    rectangle area per file than an a-sorted write: that area IS the
    parquet min/max pruning surface for filters on either column."""
    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.layout import (
        file_rectangle_stats,
        zorder_write,
    )

    # 64x64 grid, shuffled arrival order
    df = (
        spark.range(4096)
        .select(
            (F.col("id") % 64).alias("a"),
            (F.col("id") / 64).cast("long").alias("b"),
            F.xxhash64("id").alias("noise"),
        )
        .orderBy("noise")
    )
    zpath = str(tmp_path / "zordered")
    spath = str(tmp_path / "asorted")
    zorder_write(df, zpath, ("a", "b"), bits=6, num_files=8)
    (
        df.repartitionByRange(8, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(spath)
    )

    def files_touched(path):
        """Expected #files a point filter on each column must read =
        sum over files of that file's span/domain — THE pruning metric
        parquet min/max skipping realizes."""
        rows = file_rectangle_stats(spark, path, ("a", "b")).collect()
        assert len(rows) >= 4
        ta = sum((r["max_a"] - r["min_a"] + 1) / 64 for r in rows)
        tb = sum((r["max_b"] - r["min_b"] + 1) / 64 for r in rows)
        return ta, tb

    za, zb_ = files_touched(zpath)
    sa, sb = files_touched(spath)
    # a-sorted prunes a perfectly (~1 file) but every file spans ALL of
    # b (~8 files for any b filter); z-order spreads locality across
    # BOTH columns, so its worst column beats the sorted layout's worst
    # column by >= 1.5x (measured ~2x)
    assert max(sa, sb) >= 7.5, (sa, sb)
    assert max(za, zb_) * 1.5 <= max(sa, sb), (za, zb_, sa, sb)


def test_zorder_write_rejects_values_over_bit_budget(spark, tmp_path):
    """Values with set bits above `bits` alias in the Morton key and
    silently destroy the clustering — zorder_write must refuse."""
    import pytest
    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.layout import zorder_write

    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") * 100).alias("b")
    )
    with pytest.raises(ValueError, match="z-order budget"):
        zorder_write(df, str(tmp_path / "z"), ("a", "b"), bits=6)
    # widening the budget fixes it
    zorder_write(df, str(tmp_path / "z2"), ("a", "b"), bits=14, num_files=2)


def test_zorder_write_rejects_negative_values(spark, tmp_path):
    """Negative values pass a max-only check but sign-extend through
    shiftright, corrupting the Morton key — zorder_write must refuse
    them too (the min-side of the budget guard)."""
    import pytest
    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.layout import zorder_write

    df = spark.range(100).select(
        (F.col("id") - 50).alias("a"), F.col("id").alias("b")
    )
    with pytest.raises(ValueError, match="sign-extend"):
        zorder_write(df, str(tmp_path / "z"), ("a", "b"), bits=8)


def test_zorder_three_column_write_clusters_all_columns(spark, tmp_path):
    """N=3 z-order: every file's (min, max) hyper-rectangle must be
    narrow on ALL three columns vs a single-column sort, where two of
    the three span the whole domain in every file."""
    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.layout import (
        file_rectangle_stats,
        zorder_write,
    )

    n = 1 << 12
    df = spark.range(n * 4).select(
        (F.col("id") % 16).alias("a"),
        (F.expr("id div 16") % 16).alias("b"),
        (F.expr("id div 256") % 16).alias("c"),
    )
    zpath = str(tmp_path / "z3")
    spath = str(tmp_path / "s1")
    zorder_write(df, zpath, ("a", "b", "c"), bits=4, num_files=8)
    (
        df.repartitionByRange(8, "a")
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(spath)
    )

    def worst_span(path):
        rows = file_rectangle_stats(spark, path, ("a", "b", "c")).collect()
        assert len(rows) >= 4
        spans = []
        for col in ("a", "b", "c"):
            spans.append(
                sum(
                    (r[f"max_{col}"] - r[f"min_{col}"] + 1) / 16
                    for r in rows
                )
                / len(rows)
            )
        return max(spans)

    # single-column sort: b and c span the full domain in every file
    # (avg span ratio ~1.0); 3-col z-order keeps the WORST column
    # clearly under that. zorder_write's boundaries come from Spark's
    # SAMPLING RangePartitioner (seeded off the rdd id, which varies
    # with ambient session state — measured 0.78..0.87 across suite
    # orderings), so the production path is pinned RELATIVELY only;
    # the absolute clustering claim is pinned below on a deterministic
    # exact-quantile layout instead.
    s_worst = worst_span(spath)
    z_worst = worst_span(zpath)
    assert s_worst >= 0.9, s_worst
    assert z_worst <= s_worst - 0.1, (z_worst, s_worst)

    # exact-quantile boundaries: 8 aligned 512-wide Morton blocks over
    # the 12-bit z-domain free 3 low bits per column -> every file
    # spans EXACTLY 8 of 16 values on every column (ratio 0.5), with
    # no sampling anywhere — the deterministic absolute pin
    from fb_ads_bigquery_etl_spark.operators.layout import zvalue_n

    qpath = str(tmp_path / "zq")
    zq = df.withColumn(
        "_z", zvalue_n((F.col("a"), F.col("b"), F.col("c")), bits=4)
    )
    for f in range(8):
        (
            zq.filter(
                (F.col("_z") >= f * 512) & (F.col("_z") < (f + 1) * 512)
            )
            .drop("_z")
            .coalesce(1)
            .write.mode("append")
            .parquet(qpath)
        )
    q_worst = worst_span(qpath)
    assert abs(q_worst - 0.5) < 1e-12, q_worst


def test_manifest_pruning_skips_files(spark, tmp_path):
    """The manifest lookup must select a strict subset of files for a
    selective range, and the pruned read must equal the full scan."""
    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.manifest import (
        build_file_manifest,
        manifest_pruned_read,
        pruned_files,
    )

    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).alias("v")
    )
    path = str(tmp_path / "t")
    df.repartitionByRange(10, "id").write.parquet(path)
    man = build_file_manifest(spark, path, ("id",))
    n_files = man.count()
    assert n_files == 10
    sel = pruned_files(man, "id", 2000, 2999)
    assert 1 <= len(sel) <= 3, sel  # ~1k of 10k rows -> 1-2 of 10 files
    got = manifest_pruned_read(spark, man, "id", 2000, 2999)
    assert got.count() == 1000
    assert got.agg(F.sum("v")).head()[0] == df.filter(
        F.col("id").between(2000, 2999)
    ).agg(F.sum("v")).head()[0]


def test_manifest_incremental_update_scans_only_new_files(spark, tmp_path):
    """update_file_manifest must (a) produce pruning identical to a
    fresh full rebuild after an append, and (b) open ONLY the appended
    files — proven by deleting an original data file after the initial
    build: if the update touched old files it would crash."""
    import os

    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.manifest import (
        build_file_manifest,
        manifest_pruned_read,
        pruned_files,
        update_file_manifest,
    )

    df = spark.range(6_000).select(F.col("id"), (F.col("id") % 13).alias("v"))
    path = str(tmp_path / "t")
    df.repartitionByRange(6, "id").write.parquet(path)
    original_files = {
        f for f in os.listdir(path) if f.endswith(".parquet")
    }
    man = build_file_manifest(spark, path, ("id",)).localCheckpoint(eager=True)

    extra = spark.range(6_000, 9_000).select(
        F.col("id"), (F.col("id") % 13).alias("v")
    )
    extra.repartitionByRange(3, "id").write.mode("append").parquet(path)

    # equality vs a fresh full build (on the intact dataset)
    man2 = update_file_manifest(spark, path, man, ("id",))
    fresh = build_file_manifest(spark, path, ("id",))
    assert sorted(map(tuple, man2.collect())) == sorted(
        map(tuple, fresh.collect())
    )
    assert man2.count() == 9
    # no-op update: nothing new -> same manifest back
    assert update_file_manifest(spark, path, man2, ("id",)).count() == 9

    # only-new-files proof: remove an ORIGINAL file; update must not
    # open it, and its now-stale manifest row must DROP (a stale row
    # would send a later pruned read to a missing path)
    victim = sorted(original_files)[0]
    os.remove(os.path.join(path, victim))
    man3 = update_file_manifest(spark, path, man, ("id",))
    assert man3.count() == 8  # 5 surviving originals + 3 new
    assert not any(victim in r["file"] for r in man3.select("file").collect())

    # the updated manifest prunes correctly for a range in the APPENDED
    # region (reads only new files, dodging the deleted one)
    got = manifest_pruned_read(spark, man3, "id", 7000, 7999)
    assert got.count() == 1000
    # the 6 original files (including the deleted one, whose stale
    # manifest row would CRASH the read if selected) must all prune
    # away; the RangePartitioner's sampled boundaries decide whether
    # the range touches 1, 2, or all 3 appended files, so 3 is the
    # honest bound (a <= 2 assertion flaked on sampling luck)
    assert len(pruned_files(man3, "id", 7000, 7999)) <= 3


def test_manifest_pruned_read_empty_selection(spark, tmp_path):
    """Zero matching files: with path= returns an empty frame with the
    dataset schema; without it raises ValueError."""
    import pytest
    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.manifest import (
        build_file_manifest,
        manifest_pruned_read,
    )

    df = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    path = str(tmp_path / "t")
    df.write.parquet(path)
    man = build_file_manifest(spark, path, ("id",))
    out = manifest_pruned_read(spark, man, "id", 10_000, 20_000, path=path)
    assert out.count() == 0
    assert set(out.columns) == {"id", "v"}
    with pytest.raises(ValueError, match="zero files"):
        manifest_pruned_read(spark, man, "id", 10_000, 20_000)


def test_bloom_file_index_skips_files_where_minmax_cannot(spark, tmp_path):
    """Hash-clustered keys give every file a full-domain [min, max]
    envelope — manifest pruning reads all files — but the per-file
    Bloom must narrow a point lookup to ~1 file, and the pruned read
    must equal the full-scan filter."""
    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.manifest import (
        build_file_manifest,
        pruned_files,
    )
    from fb_ads_bigquery_etl_spark.operators.sketch import (
        bloom_index_files,
        bloom_index_read,
        build_bloom_file_index,
    )

    df = spark.range(20_000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") % 7).alias("v")
    )
    path = str(tmp_path / "t")
    df.repartition(8, "k").write.parquet(path)

    # min/max is useless on this layout: every file spans ~the domain
    man = build_file_manifest(spark, path, ("k",))
    assert len(pruned_files(man, "k", 42, 42)) == 8

    idx = build_bloom_file_index(spark, path, "k")
    sel = bloom_index_files(idx, 42)
    assert 1 <= len(sel) <= 2, sel  # 1 true file + at most 1 FP
    got = bloom_index_read(spark, idx, "k", 42, path=path)
    assert got.count() == 40
    assert (
        got.agg(F.sum("v")).head()[0]
        == df.filter(F.col("k") == 42).agg(F.sum("v")).head()[0]
    )


def test_bloom_index_read_empty_selection(spark, tmp_path):
    """A key absent from every file's Bloom: with path= a schema-only
    empty frame; without, a typed error."""
    import pytest
    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.sketch import (
        bloom_index_read,
        build_bloom_file_index,
    )

    df = spark.range(1_000).select((F.col("id") % 50).alias("k"))
    path = str(tmp_path / "t")
    df.repartition(4, "k").write.parquet(path)
    idx = build_bloom_file_index(spark, path, "k")

    empty = bloom_index_read(spark, idx, "k", 999_999, path=path)
    assert empty.count() == 0
    assert empty.columns == ["k"]
    with pytest.raises(ValueError, match="zero files"):
        bloom_index_read(spark, idx, "k", 999_999)


def test_zorder_manifest_two_predicate_pruning(spark, tmp_path):
    """The composed layout stack: a manifest over a z-ordered write must
    prune a two-predicate query to a strict minority of files ON BOTH
    DIMENSIONS — where the same manifest over a single-column sort
    cannot (the second column spans every file), and the pruned read
    equals the full filter."""
    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.layout import zorder_write
    from fb_ads_bigquery_etl_spark.operators.manifest import (
        build_file_manifest,
        pruned_files,
    )

    n = 1 << 12
    df = spark.range(n * 4).select(
        (F.col("id") % 64).alias("a"),
        (F.expr("id div 64") % 64).alias("b"),
        F.col("id").alias("v"),
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    zorder_write(df, zpath, ("a", "b"), bits=6, num_files=8)
    (
        df.repartitionByRange(8, "a")
        .sortWithinPartitions("a")
        .write.parquet(spath)
    )

    def two_pred_files(path):
        man = build_file_manifest(spark, path, ("a", "b"))
        fa = set(pruned_files(man, "a", 8, 15))
        fb = set(pruned_files(man, "b", 8, 15))
        return fa & fb, fb

    zsel, zb = two_pred_files(zpath)
    ssel, sb = two_pred_files(spath)
    # z-order: both dims have narrow per-file envelopes -> minority
    assert len(zsel) <= 4, len(zsel)
    # a-sorted: the a-predicate prunes perfectly (it's the sort key)
    # but the b-predicate alone selects EVERY file — the manifest over
    # that layout cannot prune the second dimension, which is exactly
    # what the z-order buys
    assert len(sb) >= 7, len(sb)
    # the z-ordered layout's b-slab lands in a strict minority of files
    # — the RangePartitioner's sampled z-boundaries wobble the exact
    # count by one, so the bound is relative-plus-slack, not a sharp
    # constant (<= 4 flaked at 5 once in ~10 runs)
    assert len(zb) < len(sb), (len(zb), len(sb))
    assert len(zb) <= 6, len(zb)
    got = (
        spark.read.parquet(*sorted(zsel))
        .filter(F.col("a").between(8, 15) & F.col("b").between(8, 15))
        .agg(F.sum("v"))
        .head()[0]
    )
    want = (
        df.filter(F.col("a").between(8, 15) & F.col("b").between(8, 15))
        .agg(F.sum("v"))
        .head()[0]
    )
    assert got == want


def test_unified_manifest_point_and_range_pruning_after_refresh(spark, tmp_path):
    """The unified manifest (one per-file stats row: min/max envelopes
    + Bloom bitmap) must serve BOTH predicate shapes after an
    O(append) refresh: a point lookup on a hash-spread unique key
    skips the non-holding files via the bitmap (envelopes are useless
    for it — every range file passes a key-domain check only where
    the key was the range column; here the key is unique so exactly
    the holding file plus Bloom false positives pass), and a range
    query on the clustered column still prunes via envelopes. The
    refresh must open ONLY appended files — proven by deleting an
    original data file first."""
    import os

    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.manifest import (
        build_unified_manifest,
        manifest_pruned_read,
        pruned_files,
        unified_point_files,
        unified_point_read,
        update_unified_manifest,
    )

    df = spark.range(6_000).select(
        F.col("id"), (F.col("id") * 37 % 6000).alias("k")
    )
    path = str(tmp_path / "t")
    df.repartitionByRange(6, "id").write.parquet(path)
    original_files = {f for f in os.listdir(path) if f.endswith(".parquet")}
    man = build_unified_manifest(
        spark, path, ("id",), "k"
    ).localCheckpoint(eager=True)

    extra = spark.range(6_000, 9_000).select(
        F.col("id"), (F.col("id") * 37 % 6000 + 6000).alias("k")
    )
    extra.repartitionByRange(3, "id").write.mode("append").parquet(path)

    # only-new-files proof: remove an ORIGINAL file; the refresh must
    # not open it
    victim = sorted(original_files)[0]
    os.remove(os.path.join(path, victim))
    man2 = update_unified_manifest(spark, path, man, ("id",), "k")
    # 5 surviving originals + 3 appended; the deleted file's stale row
    # drops so no later pruned read can select a missing path
    assert man2.count() == 8
    assert not any(victim in r["file"] for r in man2.select("file").collect())

    # point pruning: k is unique, so its holding file passes and
    # others pass only at the Bloom fp rate — structurally, far fewer
    # than all 9; the k below lives in the APPENDED region so the
    # lookup only works if the refresh indexed the new files
    key = 6000 + (7500 * 37 % 6000)  # k of appended id=7500
    files = unified_point_files(man2, key)
    assert len(files) <= 3, files  # 1 holder + generous fp allowance
    got = unified_point_read(spark, man2, "k", key, path=path)
    assert got.count() == 1

    # range pruning on the clustered column still works from the SAME
    # manifest (bound structurally: the 6 original files cannot hold
    # appended ids, so at most the 3 appended files are selected)
    assert len(pruned_files(man2, "id", 7000, 7999)) <= 3
    assert manifest_pruned_read(spark, man2, "id", 7000, 7999).count() == 1000


def test_read_snapshot_is_isolated_from_appends(spark, tmp_path):
    """A reader pinning manifest v1 must see the v1 file set even after
    an append lands and v2 publishes — and v2 sees everything. Also:
    read_snapshot refuses an empty manifest."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.manifest import (
        build_file_manifest,
        read_snapshot,
        update_file_manifest,
    )

    df = spark.range(3_000).select(F.col("id"), (F.col("id") % 7).alias("v"))
    path = str(tmp_path / "t")
    df.repartitionByRange(4, "id").write.parquet(path)
    v1 = build_file_manifest(spark, path, ("id",)).localCheckpoint(eager=True)

    spark.range(3_000, 5_000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    ).repartitionByRange(2, "id").write.mode("append").parquet(path)
    v2 = update_file_manifest(spark, path, v1, ("id",))

    assert read_snapshot(spark, v1).count() == 3_000  # pre-append view
    assert read_snapshot(spark, v2).count() == 5_000
    assert spark.read.parquet(path).count() == 5_000  # directory moved on

    with _pytest.raises(ValueError, match="no files"):
        read_snapshot(spark, v1.filter(F.lit(False)))


def test_snapshot_lifecycle_incremental_compact_expire(spark, tmp_path):
    """The snapshot lifecycle verbs must compose: incremental_scan
    reads exactly the rows of files added between two versions;
    compact_files preserves content while replacing the file set;
    expire_snapshot deletes ONLY files no retained manifest lists —
    proven on disk — and every retained (and shared-file historical)
    snapshot still reads intact afterwards."""
    import os

    from pyspark.sql import functions as F

    from fb_ads_bigquery_etl_spark.operators.manifest import (
        build_file_manifest,
        compact_files,
        expire_snapshot,
        incremental_scan,
        read_snapshot,
        snapshot_diff,
        update_file_manifest,
    )

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    path = str(tmp_path / "t")
    df.filter(F.col("k") % 4 != 0).repartition(2).write.parquet(path)
    v1 = build_file_manifest(spark, path, ("k",)).localCheckpoint(
        eager=True
    )
    df.filter(F.col("k") % 4 == 0).repartition(2).write.mode(
        "append"
    ).parquet(path)
    v2 = update_file_manifest(spark, path, v1, ("k",)).localCheckpoint(
        eager=True
    )

    added, removed = snapshot_diff(v1, v2)
    assert len(added) == 2 and removed == []
    delta = incremental_scan(spark, v1, v2)
    assert sorted(
        tuple(r) for r in delta.collect()
    ) == sorted(
        tuple(r) for r in df.filter(F.col("k") % 4 == 0).collect()
    )

    # zero-delta semantics mirror manifest_pruned_read
    assert incremental_scan(spark, v2, v2, path=path).count() == 0
    try:
        incremental_scan(spark, v2, v2)
        raise AssertionError("expected ValueError on zero added files")
    except ValueError:
        pass

    v3 = compact_files(spark, path, v2, added, ("k",)).localCheckpoint(
        eager=True
    )
    # content-identical, file set = v2 minus the 2 originals plus 1
    assert v3.count() == v2.count() - 1
    assert sorted(tuple(r) for r in read_snapshot(spark, v3).collect()) == \
        sorted(tuple(r) for r in df.collect())
    # the compacted originals remain on disk: v2 still time-travels
    assert read_snapshot(spark, v2).count() == 1000

    # expiring v1 against retained [v3] deletes nothing (all shared)
    assert expire_snapshot(spark, v1, [v3]) == []
    # expiring v2 deletes exactly the two pre-compaction originals
    doomed = expire_snapshot(spark, v2, [v3])
    assert sorted(doomed) == sorted(added)
    for f in doomed:
        assert not os.path.exists(f.replace("file:", "").replace("//", "/"))
    # retained snapshot intact; v1 also still readable (shared files)
    assert sorted(tuple(r) for r in read_snapshot(spark, v3).collect()) == \
        sorted(tuple(r) for r in df.collect())
    assert read_snapshot(spark, v1).count() == df.filter(
        F.col("k") % 4 != 0
    ).count()
