"""Cross-engine parity on EMPTY inputs, for every oracle-gated query.

The sf-scale gate exercises the happy path; empty tables exercise the
null-handling seams where engines genuinely diverge (SUM over nothing is
NULL, 0/0 is NULL in DuckDB but guarded in Spark, standard ROLLUP emits a
grand-total row on empty input while Spark emits none). The first run of
this sweep found 7 real divergences — zero-unsafe metric oracles,
un-coalesced bucket-stat counters, the ROLLUP row — all fixed and pinned
here. A new query whose oracle isn't empty-safe fails this test, not a
future driver round.
"""

import duckdb
import pytest

from dygiepp_spark.plans import cache
from dygiepp_spark.registry import QUERIES
from dygiepp_spark.tables import TABLE_NAMES


@pytest.fixture(scope="module")
def empty_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLE_NAMES:
        (
            spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
            .limit(0)
            .coalesce(1)
            .write.parquet(f"{d}/{t}.parquet")
        )
    return d


@pytest.fixture(scope="module")
def empty_con(empty_dir):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{empty_dir}/{t}.parquet/*.parquet'"
        )
    return con


def test_every_gated_query_is_empty_safe(spark, empty_dir, empty_con):
    failures = {}
    for name, spec in QUERIES.items():
        if spec.sql is None:
            continue
        try:
            with cache.scoped():
                sdf = spec.build(spark, empty_dir).toPandas()
        except Exception as ex:  # noqa: BLE001 — collected, reported below
            failures[name] = f"spark raised {type(ex).__name__}: {str(ex)[:120]}"
            continue
        try:
            odf = empty_con.execute(spec.sql).df()
        except Exception as ex:  # noqa: BLE001
            failures[name] = f"oracle raised {type(ex).__name__}: {str(ex)[:120]}"
            continue
        cols = sorted(sdf.columns)
        if sorted(odf.columns) != cols:
            failures[name] = f"schema {sorted(odf.columns)} != {cols}"
            continue
        if len(sdf) != len(odf):
            failures[name] = f"rows {len(sdf)} != {len(odf)}"
            continue
        a = sdf[cols].sort_values(cols).reset_index(drop=True).astype(str)
        b = odf[cols].sort_values(cols).reset_index(drop=True).astype(str)
        if not a.equals(b):
            diff = [
                (c, list(a[c]), list(b[c])) for c in cols if not a[c].equals(b[c])
            ]
            failures[name] = f"values differ: {str(diff)[:160]}"
    assert not failures, "\n".join(f"{k}: {v}" for k, v in sorted(failures.items()))
