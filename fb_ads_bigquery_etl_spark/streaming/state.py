"""Custom stateful streaming operators via applyInPandasWithState.

For semantics the built-in window/session operators can't express
(running per-key accumulators, custom eviction), Spark's arbitrary
stateful API is the scalable tool: state lives in the state store
(RocksDB/HDFS-backed per partition), keyed groups are processed as
Arrow batches, and watermark-driven timeouts bound retention.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value_micros", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("n_vals", T.LongType()),
        T.StructField("total_micros", T.LongType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, total value) across micro-batches.

    Emits the updated running totals for every user seen in each batch;
    state is one (long, long) pair per user — O(distinct keys), not
    O(rows). Value accumulates as floor(value * 1e6) int64 micros:
    integer addition is associative and engine-exact, so the drained
    result hash-matches a batch SQL aggregate regardless of batch
    boundaries or arrival order (a float running sum would drift in the
    last bits per batch split). The equivalent batch query is a plain
    groupBy aggregate, used as the oracle after draining all batches.
    """
    import numpy as np

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, n_vals, total = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            n += len(pdf)  # COUNT(*): NULL-valued rows still count
            v = pdf["value"].to_numpy(dtype=np.float64)
            v = v[~np.isnan(v)]  # SUM skips NULLs; floor(NaN)->int64 is UB
            n_vals += len(v)
            total += int(
                np.floor(v * 1_000_000).astype(np.int64).sum()
            )
        state.update((n, n_vals, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                # SQL SUM over zero non-NULL inputs is NULL, not 0 —
                # emit the same so the batch oracle can't diverge
                "total_value_micros": [total if n_vals else None],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
