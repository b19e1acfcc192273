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


_SESS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("sess_start", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_SESS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def timeout_sessions(
    events: DataFrame, *, gap_minutes: int = 30
) -> DataFrame:
    """Per-user sessions via arbitrary state + EVENT-TIME TIMEOUT — the
    state dimension `running_user_totals` doesn't exercise: a session
    closes either when a same-key event arrives past the gap (in-batch
    split) or when the WATERMARK passes session_end + gap and the state
    store times the key out (`state.hasTimedOut` invocation with no
    input rows). The second path is what bounds state for keys that
    simply stop arriving — without it an abandoned user's open session
    would sit in the store forever.

    Same session semantics as streaming/windows.py's session_window
    gate: a gap of EXACTLY `gap_minutes` starts a new session. Events
    within a batch are sorted (ts, event_id) and split vectorized
    (numpy diff/cumsum) — no per-row Python in the hot loop. Emission
    is append-mode: a session row is final when emitted.

    Timeout flushing requires the watermark to ADVANCE past the last
    session's deadline before the query stops — AvailableNow callers
    must stage far-future sentinel rows (see the registry query).
    """
    import numpy as np

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            s, _, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "sess_start": [pd.Timestamp(s, unit="us")],
                    "n_events": [n],
                }
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        ts_us = rows["ts"].to_numpy(dtype="datetime64[ns]").astype("int64") // 1000
        if state.exists:
            s0, l0, n0 = state.get
            ts_all = np.concatenate([[l0], ts_us])
        else:
            s0, n0 = None, 0
            ts_all = ts_us
        # vectorized gap split: new session where the gap >= gap_us
        new_sess = np.empty(len(ts_all), dtype=bool)
        new_sess[0] = True
        new_sess[1:] = (ts_all[1:] - ts_all[:-1]) >= gap_us
        sess_id = np.cumsum(new_sess) - 1
        starts, counts = [], []
        for sid in range(sess_id[-1] + 1):
            mask = sess_id == sid
            starts.append(int(ts_all[mask][0]))
            counts.append(int(mask.sum()))
        if state.exists:
            # first pseudo-row was the carried last_ts: session 0
            # continues the open session (don't double count the marker)
            starts[0] = s0
            counts[0] += n0 - 1
        closed_starts, closed_counts = starts[:-1], counts[:-1]
        open_start, open_count = starts[-1], counts[-1]
        last_us = int(ts_all[-1])
        state.update((int(open_start), last_us, int(open_count)))
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)
        yield pd.DataFrame(
            {
                "user_id": key[0],
                "sess_start": pd.to_datetime(
                    pd.Series(closed_starts, dtype="int64"), unit="us"
                ),
                "n_events": pd.Series(closed_counts, dtype="int64"),
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_SESS_OUT_SCHEMA,
        stateStructType=_SESS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
