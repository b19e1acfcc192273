"""Property-based checks (SURVEY §5.4): dedup semantics against a
pandas oracle over generated inputs, salted == unsalted equivalence.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from fb_ads_bigquery_etl_spark.operators.dedup import (
    dedup_keep_first,
    salted_dedup_keep_first,
)

KEY = ["campaign_name", "ad_name", "date_start", "publisher_platform"]
COLS = [*KEY, "spend", "_ingest_order"]

_row = st.tuples(
    st.sampled_from(["c1", "c2", "c3"]),
    st.sampled_from(["a1", "a2"]),
    st.sampled_from(["2026-01-01", "2026-01-02"]),
    st.sampled_from(["facebook", "instagram"]),
    st.floats(min_value=0, max_value=100, allow_nan=False),
)


@st.composite
def _datasets(draw):
    rows = draw(st.lists(_row, min_size=1, max_size=30))
    return [(*r, i) for i, r in enumerate(rows)]  # ingest order = position


def _oracle_first(rows: list[tuple]) -> dict[tuple, float]:
    pdf = pd.DataFrame(rows, columns=COLS)
    first = pdf.sort_values("_ingest_order").groupby(KEY, as_index=False).first()
    return {tuple(r[k] for k in KEY): r["spend"] for _, r in first.iterrows()}


_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from fb_ads_bigquery_etl_spark.session import get_spark

        _spark = get_spark("props", master="local[4]", shuffle_partitions=4)
    return _spark


@given(_datasets())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_keep_first_matches_pandas_oracle(rows):
    spark = _get_spark()
    df = spark.createDataFrame(rows, COLS).repartition(3)  # shuffle the arrival
    got = {
        tuple(r[k] for k in KEY): r["spend"] for r in dedup_keep_first(df).collect()
    }
    assert got == _oracle_first(rows)


@given(_datasets())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_salted_equals_unsalted(rows):
    spark = _get_spark()
    df = spark.createDataFrame(rows, COLS).repartition(3)
    plain = {tuple(sorted(map(str, r))) for r in dedup_keep_first(df).collect()}
    salted = {
        tuple(sorted(map(str, r)))
        for r in salted_dedup_keep_first(df, salt_buckets=4).collect()
    }
    assert plain == salted
