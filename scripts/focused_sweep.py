"""Focused x-track sweep for a named subset of registry queries.

Same measurement discipline as scale_experiment.main (build/reuse the
key-offset x2/x4/x8 dirs, System.gc() between queries, warm + min-of-3
with cache clears) but for an explicit query list — the per-round tool
for giving NEW operators scale rows without re-running the full sweep.

    python scripts/focused_sweep.py q1 q2 ...            # x-track
    SPARK_GRAFT_SCALE_DIR=/tmp/scale_exp  (dir reuse across runs)

Prints one markdown table row per query (paste into SCALE.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_experiment import build_perturbed, build_scaled  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    perturbed = "--perturbed" in args
    names = [a for a in args if a != "--perturbed"]
    if not names:
        raise SystemExit(
            "usage: focused_sweep.py [--perturbed] <query> [query ...]"
        )
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    work = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/scale_exp")

    from fb_ads_bigquery_etl_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("focused-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    missing = [n for n in names if n not in queries]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    build = build_perturbed if perturbed else build_scaled
    track = "perturbed (linear output)" if perturbed else "x (verbatim copies)"
    dirs = {1: base}
    for m in (2, 4, 8):
        dirs[m] = build(spark, base, m, work)

    rows = []
    for name in names:
        res = {}
        for m in sorted(dirs):
            q = queries[name]
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            q(spark, dirs[m]).count()  # warm
            spark.catalog.clearCache()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                q(spark, dirs[m]).count()
                best = min(best, time.perf_counter() - t0)
                spark.catalog.clearCache()
            res[m] = round(best, 2)
            print(f"{name} x{m}: {res[m]}s", flush=True)
        ratio = round(res[8] / res[1], 1) if res[1] else float("nan")
        rows.append(
            f"| {name} | {track} | {res[1]} | {res[2]} "
            f"| {res[4]} | {res[8]} | {ratio} |"
        )
    print("\n| query | track | 1 | 2 | 4 | 8 | ratio |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(r)


if __name__ == "__main__":
    main()
