"""Distributed connected components — dedup-cluster construction.

Near-dup pair operators (fuzzy_dedup.py) emit an EDGE LIST; turning
edges into dedup groups needs the transitive closure: if A~B and B~C,
then {A,B,C} is one cluster with one canonical survivor. The reference
has no counterpart (its dedup is exact-key, SURVEY.md §2 T1); this is
a north-star LLM-pipeline operator (BASELINE.json).

Algorithm: iterative *hash-to-min* label propagation (Rastogi et al.,
"Finding Connected Components in Map-Reduce in Logarithmic Rounds",
ICDE 2013, simplified). Every node starts labeled with itself; each
round every node takes the min label in its closed neighborhood; stop
when no label changes. Rounds ~ graph diameter (near-dup clusters are
small and dense, so 2-4 rounds in practice).

Scale design:
- Each round is one shuffle (groupBy node) over the edge list — no
  driver-side adjacency, no collect of nodes or edges.
- `localCheckpoint(eager=True)` after each round truncates lineage;
  without it the plan doubles per iteration and Catalyst analysis
  time blows up long before data size matters.
- Convergence test is a single `count()` of changed labels — a scalar
  per round, not a data pull.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, functions as F

logger = logging.getLogger(__name__)


class ConvergenceError(RuntimeError):
    """Label propagation exhausted max_iter with labels still changing —
    the returned components would be silently SPLIT (wrong), so we fail
    instead. A chain-shaped near-dup graph with diameter > max_iter
    triggers this; raise max_iter (rounds ~ diameter)."""


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 25,
    strict: bool = True,
) -> DataFrame:
    """(node, component) with component = min node id reachable.

    ``edges`` is an undirected edge list (each pair once, either
    orientation); isolated nodes don't appear (callers union them in if
    needed — for dedup, docs with no near-dup pair are their own
    cluster and never need the shuffle).

    If the loop exhausts ``max_iter`` without converging the result
    would contain split components; ``strict=True`` (default) raises
    ConvergenceError, ``strict=False`` logs a warning and returns the
    partial labeling (callers that tolerate over-segmented clusters).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)

    # label(u) starts as min(u, min neighbor) — one round for free.
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_nmin"))
        .select(
            F.col("u").alias("node"),
            F.least(F.col("u"), F.col("_nmin")).alias("label"),
        )
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # Closed-neighborhood min: node's own label vs min of neighbors'.
        neighbor_min = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("label").alias("nmin"))
        )
        # the change flag is computed INSIDE the checkpointed frame
        # (old and new label are both in scope right here), so the
        # convergence probe is a narrow count over checkpoint blocks —
        # not the join-back against the previous labels it used to be
        # (one shuffle join per iteration removed, r14)
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["u"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
                (
                    F.coalesce(F.col("nmin"), F.col("label")) < F.col("label")
                ).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("_changed")).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    else:
        msg = (
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing) — components would be "
            "split; raise max_iter (rounds ~ graph diameter)"
        )
        if strict:
            raise ConvergenceError(msg)
        logger.warning(msg)

    return labels.select("node", F.col("label").alias("component"))


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup clusters from a similar-pairs DataFrame.

    Returns (component, n_members, members: sorted array) — one row per
    cluster of size >= 2. Canonical-survivor selection is then
    `F.array_min(members)` (== component) or any caller-chosen rule.
    """
    cc = connected_components(pairs, src=id_a, dst=id_b)
    return (
        cc.groupBy("component")
        .agg(
            F.count("*").alias("n_members"),
            F.array_sort(F.collect_list("node")).alias("members"),
        )
        .orderBy("component")
    )


def pagerank_quantized(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iters: int = 3,
    scale: int = 1_000_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """Integer-exact PageRank with a pinned iteration count — the
    cross-engine-reproducible sibling of float PageRank, same design as
    clustering.kmeans_quantized: every quantity is a non-negative
    integer, every division is truncating integer division (Spark `div`
    == DuckDB `//` on non-negatives), so a SQL oracle replays the
    identical iterations.

    Per iteration: each node sends rank div outdegree along every
    out-edge; r'(v) = (100-d)%*scale + d% of the inbound sum, both via
    integer div 100. Dangling mass (nodes with no out-edges) is dropped
    — the standard simplification; with symmetrized edges (the caller's
    choice) there are no dangling nodes.

    Scale shape per iteration: ranks⋈edges on src (rank table is
    node-sized; Catalyst/AQE picks broadcast while it fits, keyed
    shuffle beyond), one groupBy(dst) partial-aggregated sum, one
    node-sized left join for the teleport floor. Lineage stays linear in
    `iters` (each iteration consumes the previous ranks once); for
    large `iters` add localCheckpoint like connected_components.

    Returns (node, rank_scaled).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("d"))
    ed = e.join(deg, "src").persist()  # edge list annotated with outdeg
    base = (100 - damping_pct) * scale // 100
    ranks = nodes.withColumn("r", F.lit(scale).cast("long"))
    for _ in range(iters):
        inbound = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("r div d").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(
            inbound.withColumnRenamed("dst", "node"), "node", "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.expr(f"{damping_pct} * coalesce(s, 0L) div 100")
            ).cast("long").alias("r"),
        )
    out = ranks.select("node", F.col("r").alias("rank_scaled"))
    # Materialize before releasing the caches the loop depends on:
    # localCheckpoint truncates lineage so `out` no longer references
    # nodes/ed, and the unpersists stop executor storage leaking into
    # long-lived sessions (bench runs 131 queries back to back).
    out = out.localCheckpoint(eager=True)
    nodes.unpersist()
    ed.unpersist()
    return out


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Degree-oriented triangle counting: 1-row (n_edges, n_wedges,
    n_triangles) audit for an undirected edge list `edges(pa, pb)`
    (distinct, pa < pb).

    The classic bound that makes triangle enumeration feasible at
    scale: orient every edge from the (degree, id)-smaller endpoint, so
    each node's out-degree is O(sqrt(m)) and the wedge self-join is
    quadratic only in THAT. No global rank/window anywhere —
    orientation compares (degree, id) structs carried through keyed
    joins, and wedges are emitted already in orientation order
    ((dv, v) tuple comparison), so closing them is a plain two-column
    equality join against the oriented edge list.

    Each reused frame persists (edges feeds degrees + orientation +
    the edge count; the orientation feeds both wedge sides + closure);
    the 1-row result checkpoints eagerly and every cache is released
    before returning.
    """
    e = edges.select("pa", "pb").persist()
    deg = (
        e.select(F.col("pa").alias("node"))
        .unionByName(e.select(F.col("pb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    ea = e.join(
        deg.select(F.col("node").alias("pa"), F.col("d").alias("da")), "pa"
    ).join(deg.select(F.col("node").alias("pb"), F.col("d").alias("db")), "pb")
    a_first = F.struct("da", "pa") < F.struct("db", "pb")
    ori = ea.select(
        F.when(a_first, F.col("pa")).otherwise(F.col("pb")).alias("u"),
        F.when(a_first, F.col("pb")).otherwise(F.col("pa")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    ).persist()
    x, y = ori.alias("x"), ori.alias("y")
    wedges = (
        x.join(y, F.col("x.u") == F.col("y.u"))
        .filter(
            F.struct(F.col("x.dv"), F.col("x.v"))
            < F.struct(F.col("y.dv"), F.col("y.v"))
        )
        .select(F.col("x.v").alias("wa"), F.col("y.v").alias("wb"))
        .persist()
    )
    closed = wedges.join(
        ori.select(F.col("u").alias("wa"), F.col("v").alias("wb")),
        ["wa", "wb"],
    )
    out = (
        e.agg(F.count("*").alias("n_edges"))
        .crossJoin(wedges.agg(F.count("*").alias("n_wedges")))
        .crossJoin(closed.agg(F.count("*").alias("n_triangles")))
        .localCheckpoint(eager=True)
    )
    for df in (e, ori, wedges):
        df.unpersist()
    return out
