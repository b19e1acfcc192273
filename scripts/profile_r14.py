"""Round-14 optimization profiler: per-query timing, plan capture, and
PER-JOB wall-time breakdown (the r13 verdict's missing `jobs` mode).

Usage:
  python scripts/profile_r14.py time <query> [<query> ...]   # bench-methodology min-of-3
  python scripts/profile_r14.py plan <query> [<query> ...]   # explain("formatted") -> plans/r14/
  python scripts/profile_r14.py jobs <query> [<query> ...]   # run once, per-job wall times via UI REST

Timing matches bench.py exactly (warm at sf0.001, System.gc between
queries, min-of-3 .count() at $SPARK_GRAFT_SF_DIR, clearCache between
runs) so numbers are comparable to bench_full.json rows.

`jobs` mode enables the local Spark UI and reads the application's own
REST endpoint (loopback only) after a single warm run: per-job
submission time, duration, description, and stage/task counts — the
serial-floor evidence the 8-vs-32-core scaling block needs.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fetch_jobs(ui_port: int) -> list[dict]:
    base = f"http://127.0.0.1:{ui_port}/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications", timeout=10))
    app_id = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(f"{base}/applications/{app_id}/jobs?status=succeeded", timeout=30)
    )


def main() -> None:
    mode = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from fb_ads_bigquery_etl_spark.session import get_spark

    import __spark_entry__ as entry_mod

    extra = {}
    if mode == "jobs":
        extra = {"spark.ui.enabled": "true", "spark.ui.port": "4049"}
    spark = get_spark(
        "profile_r14", master=f"local[{cpus}]", extra_conf=extra
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    if mode == "plan":
        suffix = os.environ.get("PLAN_SUFFIX", "before")
        outdir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans", "r14",
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

    if mode == "jobs":
        # warm once at the small SF so codegen/JIT noise doesn't drown
        # the per-job numbers, then run once at the target SF and dump
        # every job submitted during that window.
        for name in names:
            try:
                queries[name](spark, "/root/testdata/sf0.001").count()
            except Exception as e:  # pragma: no cover
                print(f"WARMUP FAIL {name}: {e}", file=sys.stderr)
            spark.catalog.clearCache()
            before = {j["jobId"] for j in _fetch_jobs(4049)}
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).count()
            wall = time.perf_counter() - t0
            spark.catalog.clearCache()
            jobs = [j for j in _fetch_jobs(4049) if j["jobId"] not in before]
            jobs.sort(key=lambda j: j["jobId"])
            total = 0.0
            print(f"\n=== {name}: wall={wall:.3f}s, {len(jobs)} jobs ===")
            for j in jobs:
                sub = j.get("submissionTime", "")
                dur = ""
                if j.get("submissionTime") and j.get("completionTime"):
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    t_s = datetime.strptime(j["submissionTime"], fmt)
                    t_e = datetime.strptime(j["completionTime"], fmt)
                    d = (t_e - t_s).total_seconds()
                    total += d
                    dur = f"{d:7.3f}s"
                desc = (j.get("description") or j.get("name") or "")[:100]
                print(
                    f"  job {j['jobId']:>5} {dur} tasks={j.get('numTasks', '?'):>4} {desc}"
                )
            print(f"  sum(job durations)={total:.3f}s  wall={wall:.3f}s  "
                  f"gaps={wall - total:.3f}s")
        spark.stop()
        return

    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            queries[name](spark, warm_dir).count()
        except Exception as e:  # pragma: no cover
            print(f"WARMUP FAIL {name}: {e}", file=sys.stderr)
    spark.catalog.clearCache()

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
        print(f"{name}: min={best:.3f} runs={runs}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
