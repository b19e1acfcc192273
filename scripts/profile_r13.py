"""Round-13 optimization profiler: per-query timing + plan capture.

Usage:
  python scripts/profile_r13.py time <query> [<query> ...]   # bench-methodology min-of-3
  python scripts/profile_r13.py plan <query> [<query> ...]   # explain("formatted") -> stdout
  python scripts/profile_r13.py jobs <query>                 # run once, print per-job wall times

Timing matches bench.py exactly (warm at sf0.001, System.gc between
queries, min-of-3 .count() at $SPARK_GRAFT_SF_DIR, clearCache between
runs) so numbers are comparable to bench_full.json rows.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    mode = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from fb_ads_bigquery_etl_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("profile_r13", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    if mode == "plan":
        # capture explain("formatted") for each query into plans/r13/
        suffix = os.environ.get("PLAN_SUFFIX", "before")
        outdir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans", "r13",
        )
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = queries[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"wrote {path}", flush=True)
        spark.stop()
        return

    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            queries[name](spark, warm_dir).count()
        except Exception as e:  # pragma: no cover
            print(f"WARMUP FAIL {name}: {e}", file=sys.stderr)
    spark.catalog.clearCache()

    results = {}
    for name in names:
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        best = float("inf")
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            runs.append(round(dt, 3))
            best = min(best, dt)
            spark.catalog.clearCache()
        results[name] = (round(best, 3), runs)
        print(f"{name}: min={best:.3f} runs={runs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
