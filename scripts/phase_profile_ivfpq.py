"""Phase-level wall-clock breakdown of the IVF-PQ gate harness
(q_ivfpq_index_query shape): where does the ~6-19 s per gate actually
go? Pure instrumentation — no engine change. Run on a quiet box."""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from fb_ads_bigquery_etl_spark.session import get_spark
    from fb_ads_bigquery_etl_spark.operators import similarity
    from fb_ads_bigquery_etl_spark.operators.pq import (
        build_ivfpq_index,
        query_ivfpq_index,
    )

    spark = get_spark("phase_profile", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = e.count()
    print(f"embeddings rows: {n}")

    def timed(label, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"  {label:35s} {dt:7.3f}s", flush=True)
        return out

    # one warm pass (JIT) then two measured passes
    for rep in range(3):
        print(f"--- pass {rep} ({'warm-up' if rep == 0 else 'measured'})")
        qvec = timed(
            "qvec head()",
            lambda: e.filter(F.col("vec_id") == 3).select("embedding").head()[0],
        )
        tmp = tempfile.mkdtemp(prefix="_phase_ivfpq_")
        try:
            path = os.path.join(tmp, "index")
            cents = timed(
                "train_centroids_exact k=16 it=2",
                lambda: similarity.train_centroids_exact(e, k=16, iters=2),
            )
            timed(
                "build_ivfpq_index",
                lambda: build_ivfpq_index(
                    e, path, in_dim=64, m=4, ksub=8, centroids=cents
                ),
            )
            out = timed(
                "query_ivfpq_index (lazy)",
                lambda: query_ivfpq_index(
                    spark, path, list(qvec), k=10, nprobe=2, expand=10,
                    rerank_src=e,
                ),
            )
            timed("probe localCheckpoint", lambda: out.localCheckpoint(eager=True))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
