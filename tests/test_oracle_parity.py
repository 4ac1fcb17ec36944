"""Replicates the driver's correctness gate in-repo: every registry query
runs on Spark AND on DuckDB (oracle SQL) over sf0.001; row multisets must
match exactly (sorted-column compare, driver-style)."""

import pytest

from dygiepp_spark.registry import QUERIES

from conftest import SF_DIR, rows_match


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    spec = QUERIES[name]
    df = spec.build(spark, SF_DIR)
    if spec.sql is None:
        assert df.count() >= 0
        return
    rel = duck.sql(spec.sql)
    assert rows_match(df, rel)
