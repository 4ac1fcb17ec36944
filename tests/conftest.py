import math

import duckdb
import pytest

from dygiepp_spark.session import get_spark
from dygiepp_spark.tables import TABLE_NAMES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture()
def tiny_turns(spark):
    """Hand-checked fixture: 2 conversations (FIXTURES.md §2 analogue)."""
    rows = [
        # conv A: entities, predicate between entities, repeated mentions
        ("A", 0, "user", "the customer will join the order table", None),
        ("A", 1, "assistant", "scan the big table then merge row and line", None),
        ("A", 2, "user", "customer again", None),
        # conv B: short turns, event triggers
        ("B", 0, "user", "sort the key", None),
        ("B", 1, "assistant", "a slow query", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    return df


def rows_match(spark_df, duck_rel, float_cols=(), tol=1e-9):
    """Driver-style compare: same row multiset, column order by name."""
    cols = sorted(spark_df.columns)
    a = [tuple(r[c] for c in cols) for r in spark_df.collect()]
    dcols = sorted(duck_rel.columns)
    assert cols == dcols, f"column mismatch: {cols} vs {dcols}"
    idx = [duck_rel.columns.index(c) for c in cols]
    b = [tuple(r[i] for i in idx) for r in duck_rel.fetchall()]
    assert len(a) == len(b), f"row count {len(a)} vs {len(b)}"
    key = lambda t: tuple("~None" if v is None else str(v) for v in t)
    a.sort(key=key)
    b.sort(key=key)
    for ra, rb in zip(a, b):
        for c, va, vb in zip(cols, ra, rb):
            if isinstance(va, float) or isinstance(vb, float):
                assert va is not None and vb is not None and math.isclose(
                    va, vb, rel_tol=0, abs_tol=tol
                ), f"{c}: {va} != {vb}\n{ra}\n{rb}"
            else:
                assert va == vb, f"{c}: {va!r} != {vb!r}\n{ra}\n{rb}"
    return True
