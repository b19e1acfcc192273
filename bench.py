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


def _speed_probe() -> float:
    """Fixed single-core work unit (30M integer adds), in seconds — the
    box-noise probe from SCALE.md's round-8 audit. On this class of
    shared box the same loop has measured 1.33 s (healthy, <~1.6 s)
    to 2.96 s (heavily stolen window); recording it before and after
    the suite makes a slow-window bench run detectable FROM THE
    ARTIFACT ALONE instead of by forensic per-query comparison against
    prior rounds."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(30_000_000):
        acc += i
    # keep `acc` observable so the loop cannot be optimized away
    # (explicit raise, not assert: asserts vanish under `python -O`)
    if acc != 30_000_000 * (30_000_000 - 1) // 2:
        raise RuntimeError("speed probe computed a wrong sum")
    return round(time.perf_counter() - t0, 3)


def _io_probe() -> float:
    """Fixed disk work unit (write 64 MB to the temp filesystem, fsync,
    read it back), in seconds. The CPU probe misses IO-slow windows —
    round 9 measured a run where trivial CPU queries were flat but
    every write-harness query (IVM/streaming/merge tempdir work) drifted
    +25-70% while the CPU probe read healthy; this probe makes that
    failure mode artifact-detectable too."""
    import tempfile

    buf = bytes(range(256)) * (64 * 1024 * 1024 // 256)
    t0 = time.perf_counter()
    with tempfile.NamedTemporaryFile(dir="/tmp", delete=True) as fh:
        fh.write(buf)
        fh.flush()
        os.fsync(fh.fileno())
        fh.seek(0)
        n = 0
        while True:
            chunk = fh.read(8 * 1024 * 1024)
            if not chunk:
                break
            n += len(chunk)
    if n != len(buf):
        raise RuntimeError("io probe read back a truncated buffer")
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    probe_before = _speed_probe()
    io_before = _io_probe()

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

    probe_after = _speed_probe()
    io_after = _io_probe()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    full = {
        "metric": "headline_query_suite_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # scaling observability (r14): the core count the harness was
        # ASKED for ($SPARK_GRAFT_CPUS) and the parallelism the session
        # actually runs with — so a scaling probe can confirm from the
        # artifact alone that the env contract is honored
        "cpus": int(cpus),
        "default_parallelism": spark.sparkContext.defaultParallelism,
        # single-core speed probe (seconds for a fixed 30M-add loop),
        # sampled before warmup and after the timed suite: <~1.6 s is
        # a healthy box; ~2x that means the run landed in a stolen
        # window and the suite total is inflated by box noise
        "probe_before_s": probe_before,
        "probe_after_s": probe_after,
        # disk probe (64 MB write+fsync+read on /tmp): catches IO-slow
        # windows the CPU probe misses (write-harness queries drift
        # while trivial CPU queries stay flat)
        "io_probe_before_s": io_before,
        "io_probe_after_s": io_after,
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
        "cpus": full["cpus"],
        "default_parallelism": full["default_parallelism"],
        "probe_before_s": probe_before,
        "probe_after_s": probe_after,
        "io_probe_before_s": io_before,
        "io_probe_after_s": io_after,
    }
    # Final line = the compact summary (must stay well under the driver's
    # output-tail capture window).
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
