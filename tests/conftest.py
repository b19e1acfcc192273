from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from fb_ads_bigquery_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in out.columns:
        col = out[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            out[c] = col.astype("datetime64[us]").astype(str)
        elif col.dtype == object:
            sample = col.dropna()
            if len(sample) and hasattr(sample.iloc[0], "isoformat"):
                out[c] = col.map(lambda v: None if v is None else v.isoformat())
        elif pd.api.types.is_integer_dtype(col):
            out[c] = col.astype("int64")
        elif pd.api.types.is_float_dtype(col):
            out[c] = col.astype("float64")
    out = out.sort_values(by=list(out.columns), na_position="first").reset_index(
        drop=True
    )
    return out


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    """Order-insensitive, bit-exact comparison (mirrors the driver's
    row-count + schema + value-hash gate, but stricter on floats)."""
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            ok = (av.isna() & bv.isna()) | (
                av.to_numpy().view("int64") == bv.to_numpy().view("int64")
            )
            assert ok.all(), (
                f"{name}.{c}: float mismatch (bitwise) at rows "
                f"{np.where(~ok)[0][:5]}: {av[~ok].head(3).tolist()} vs "
                f"{bv[~ok].head(3).tolist()}"
            )
        else:
            pd.testing.assert_series_equal(
                av, bv, check_dtype=False, check_names=False, obj=f"{name}.{c}"
            )
