"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (driver-parseable):
  - full per-query timing map is written to bench_full.json next to this
    file (the complete {"metric", "value", "unit", "queries", "sf"} object);
  - stdout's FINAL line is a compact one-line JSON summary (same keys, but
    "queries" holds only the slowest few — the full map is in the file).
    Keeping the last line short matters: the driver captures an output
    tail, and a single ~3 KB line gets truncated mid-line and parses as
    null (this happened in round 1).

Each query is forced with a count() over the final plan (full execution,
no driver-side result materialization beyond the count).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from fb_ads_bigquery_etl_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()

    # Warm each query's codegen/JIT path at the smallest SF first: a fresh
    # JVM spends ~5-15 s per distinct plan shape on first execution
    # (whole-stage codegen compile + C2), which would otherwise dominate
    # the timings and measure the JIT, not the engine. Steady-state is
    # what a long-running cluster actually sees.
    warm_dir = "/root/testdata/sf0.001"
    for name in sorted(queries):
        try:
            queries[name](spark, warm_dir).count()
        except Exception:
            pass  # warmup is best-effort; the timed run surfaces real errors

    # Drop warmup caches so timed queries don't compete with sf0.001
    # leftovers for storage memory, then time each query in isolation
    # (its own cache lifecycle, cleared afterwards).
    spark.catalog.clearCache()

    # min of 3 runs per query: steady-state timing robust to GC /
    # scheduler noise (each run builds and tears down its own caches).
    timings: dict[str, float] = {}
    for name in sorted(queries):
        # Ask the JVM to finish async block/broadcast cleanup from the
        # previous query before timing starts: iterative queries
        # (localCheckpoint loops, mapInPandas fixpoints) otherwise bleed
        # GC pauses into the NEXT query's runs and min-of-N stops being
        # steady-state (observed +25% suite-wide without this). py4j
        # bridge call, harness-only — never used in the engine itself.
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    full = {
        "metric": "headline_query_suite_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_full.json")
    with open(full_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)

    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    summary = {
        "metric": full["metric"],
        "value": full["value"],
        "unit": "sec",
        "n_queries": len(timings),
        "queries": slowest,
        "queries_file": "bench_full.json",
        "sf": full["sf"],
    }
    # Final line = the compact summary (must stay well under the driver's
    # output-tail capture window).
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
