"""Local replica of the driver's correctness gate: every queries() entry
must match its oracle_sql() on DuckDB, bit-exactly, at the test SF."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR, assert_frames_match

QUERY_NAMES = sorted(entry_mod.queries())

# Approximate-by-design operators: results are engine-specific sketches,
# so the driver records the weaker rows-only check for these. Must stay
# equal to __spark_entry__._NO_ORACLE_BY_DESIGN — anything else missing
# an oracle is a bug (kmeans_clusters left this set when its quantized
# variant gained a full unrolled-CTE oracle in round 3).
ROWS_ONLY = {"approx_distinct"}


def test_rows_only_set_matches_registry_declaration():
    assert ROWS_ONLY == entry_mod._NO_ORACLE_BY_DESIGN


def test_every_query_has_oracle():
    missing = set(entry_mod.queries()) - set(entry_mod.oracle_sql()) - ROWS_ONLY
    assert not missing, f"queries without oracle SQL: {missing}"


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        pytest.skip(f"{name}: declared non-SQL-expressible (rows-only check)")
    spark_pdf = q(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(sql).df()
    assert_frames_match(spark_pdf, duck_pdf, name)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
