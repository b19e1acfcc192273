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
    (numpy diff/flatnonzero) — no per-row Python in the hot loop.
    Emission is append-mode: a session row is final when emitted.

    Out-of-order ACROSS batches (an event >= the watermark but earlier
    than the carried last_us — legal under watermark semantics) is
    merged against the compressed OPEN-session state: an event inside
    [sess_start, last_us] joins the open session (gaps only shrink —
    count+1, no boundary moves); events before sess_start chain
    backwards — the suffix whose gaps (including the exact gap to the
    open session's real first event, sess_start) stay < gap extends
    the open session earlier, and anything cut off by a >= gap break
    closes as its own earlier session(s).

    LIMITATION (inherent to append mode): merging happens only against
    the still-OPEN session. A legal >= watermark arrival that belongs
    to a session already EMITTED as closed cannot amend that emission
    — it starts (or extends) a session of its own, so output diverges
    from the batch lag() replay in exactly that window. Previously
    emitted rows are final; callers needing full late-event placement
    must either widen the watermark delay (so sessions stay in state
    long enough) or reconcile downstream (e.g. the CDC-upsert sink's
    per-key collapse). The property test
    tests/test_streaming.py::test_timeout_sessions_random_cross_batch
    generates arrivals within this contract and pins batch-oracle
    equality there.

    Timeout flushing requires the watermark to ADVANCE past the last
    session's deadline before the query stops — AvailableNow callers
    must stage far-future sentinel rows (see the registry query).
    """
    import numpy as np

    gap_us = gap_minutes * 60 * 1_000_000

    def split_sessions(arr):
        """(starts, counts) of gap-delimited sessions over a sorted
        int64 array — vectorized, no per-session Python loop."""
        new_sess = np.empty(len(arr), dtype=bool)
        new_sess[0] = True
        new_sess[1:] = np.diff(arr) >= gap_us
        bounds = np.flatnonzero(new_sess)
        starts = arr[bounds]
        counts = np.diff(np.append(bounds, len(arr)))
        return starts, counts

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
        closed_starts: list[int] = []
        closed_counts: list[int] = []
        if state.exists:
            s0, l0, n0 = state.get
            # Late-but-legal arrivals: place them against the compressed
            # open session [s0, l0] (all internal gaps < gap_us by
            # construction, so events inside the span can never split it).
            pre = ts_us[ts_us < s0]
            n0 += int(((ts_us >= s0) & (ts_us <= l0)).sum())
            post = ts_us[ts_us > l0]
            if len(pre):
                starts_p, counts_p = split_sessions(pre)
                if s0 - pre[-1] < gap_us:
                    # last pre-chain connects to the open session's real
                    # first event: extend the session backwards
                    s0 = int(starts_p[-1])
                    n0 += int(counts_p[-1])
                    starts_p, counts_p = starts_p[:-1], counts_p[:-1]
                closed_starts.extend(int(x) for x in starts_p)
                closed_counts.extend(int(x) for x in counts_p)
            # fresh tail: split relative to the carried last event time
            starts_f, counts_f = split_sessions(np.concatenate([[l0], post]))
            starts = [int(x) for x in starts_f]
            counts = [int(x) for x in counts_f]
            # session 0 continues the open session: the l0 element is a
            # marker, not a new event
            starts[0] = s0
            counts[0] += n0 - 1
            last_us = int(post[-1]) if len(post) else l0
        else:
            starts_f, counts_f = split_sessions(ts_us)
            starts = [int(x) for x in starts_f]
            counts = [int(x) for x in counts_f]
            last_us = int(ts_us[-1])
        closed_starts.extend(starts[:-1])
        closed_counts.extend(counts[:-1])
        open_start, open_count = starts[-1], counts[-1]
        state.update((open_start, last_us, open_count))
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
