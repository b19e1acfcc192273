"""Isolated same-box A/B of the streaming_ivfpq_ingest gate — the
round-13 measurement the r12 verdict ordered: the gate regressed x1.35
in a degraded io window after its publish path gained a per-batch
manifest-segment refresh, with no isolated run separating that delta
from box noise (append/compact got exactly this treatment in r12).

Run from a checkout (new code = HEAD, old code = a pre-segment
worktree, e.g. `git worktree add /tmp/ab_old de73c77`):

    python scripts/ab_streaming_ingest.py

Prints one JSON line: cpu/io probes at measurement time, 1 warm-up +
3 timed runs of q_streaming_ivfpq_ingest at $SPARK_GRAFT_SF_DIR, and —
when the checkout's pq module is instrumentable — the per-call
durations of refresh_ivfpq_manifest inside each run (the sink's
per-batch refreshes are the tail entries; build's own refresh is the
first). The per-batch refresh time answers the verdict's threshold
question directly: if it is >= 1 s/batch, batch the refresh across a
micro-batch's buckets or defer folding off the publish path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _io_probe, _speed_probe  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    cpu_probe = _speed_probe()
    io_probe = _io_probe()

    from fb_ads_bigquery_etl_spark.session import get_spark

    import __spark_entry__ as E

    spark = get_spark("ab_streaming_ingest", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    refresh_times: list[float] = []
    try:
        from fb_ads_bigquery_etl_spark.operators import pq

        real = pq.refresh_ivfpq_manifest

        def timed(*a, **k):
            t0 = time.perf_counter()
            out = real(*a, **k)
            refresh_times.append(time.perf_counter() - t0)
            return out

        pq.refresh_ivfpq_manifest = timed
    except Exception:
        pass  # old checkouts without the symbol still time the gate

    # warm-up: codegen/JIT for the plan shapes, not part of the A/B
    E.q_streaming_ivfpq_ingest(spark, sf_dir).count()
    spark.catalog.clearCache()

    runs = []
    for _ in range(3):
        refresh_times.clear()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        t0 = time.perf_counter()
        E.q_streaming_ivfpq_ingest(spark, sf_dir).count()
        total = time.perf_counter() - t0
        runs.append(
            {
                "total_s": round(total, 2),
                "refresh_calls_s": [round(x, 3) for x in refresh_times],
            }
        )
        spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "gate": "streaming_ivfpq_ingest",
                "sf_dir": sf_dir,
                "cpu_probe_s": round(cpu_probe, 2),
                "io_probe_s": round(io_probe, 2),
                "min_total_s": min(r["total_s"] for r in runs),
                "runs": runs,
            }
        )
    )


if __name__ == "__main__":
    main()
