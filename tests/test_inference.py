"""UDF-inference path parity vs the column-expression path (SURVEY.md §5
layers 3-4: numeric parity of the scoring UDF vs the reference decode math;
triple-set P/R target ≥ 0.95 — here exact equality)."""

import pandas as pd

from dygiepp_spark.inference import udf
from dygiepp_spark.inference.batching import pack_by_budget
from dygiepp_spark.operators import extract, metrics
from dygiepp_spark.tables import read_turns

SF_DIR = "/root/testdata/sf0.001"


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_triples_parity_udf_vs_columnar(spark):
    turns = read_turns(spark, sf_dir=SF_DIR)
    tall = udf.infer(turns)
    udf_triples = udf.triples_from(tall)
    col_triples = extract.relation_triples(turns)
    cols = [
        "conv_id", "turn_idx", "subj_start", "subj_end", "subj_surface",
        "pred", "obj_start", "obj_end", "obj_surface", "raw_score", "softmax_score",
    ]
    assert _sorted_rows(udf_triples, cols) == _sorted_rows(col_triples, cols)
    # P/R form of the same statement (the BASELINE.json metric, ≥ 0.95)
    keys = ["conv_id", "turn_idx", "subj_start", "pred", "obj_start"]
    m = metrics.micro_prf(udf_triples, col_triples, keys, task="relation").head()
    assert m["precision"] == 1.0 and m["recall"] == 1.0


def test_mentions_parity_udf_vs_columnar(spark):
    turns = read_turns(spark, sf_dir=SF_DIR)
    udf_m = udf.mentions_from(udf.infer(turns))
    col_m = extract.ner_mentions(turns)
    cols = ["conv_id", "turn_idx", "start", "end", "label", "surface", "raw_score"]
    assert _sorted_rows(udf_m, cols) == _sorted_rows(col_m, cols)


def test_events_parity_udf_vs_columnar(spark):
    turns = read_turns(spark, sf_dir=SF_DIR)
    tall = udf.infer(turns)
    cols_t = ["conv_id", "turn_idx", "trigger_ix", "event_type"]
    assert _sorted_rows(udf.triggers_from(tall), cols_t) == _sorted_rows(
        extract.event_triggers(turns), cols_t
    )
    cols_a = ["conv_id", "turn_idx", "trigger_ix", "arg_start", "role"]
    assert _sorted_rows(udf.arguments_from(tall), cols_a) == _sorted_rows(
        extract.event_arguments(turns), cols_a
    )


def test_failed_batch_isolation(spark):
    """A poison row (NULL text) must flag its batch, not kill the job
    (reference _FAILED_PREDICTION semantics, predictors/dygie.py:57-68)."""
    rows = [
        ("ok", 0, "user", "customer join order", None),
        ("bad", 0, "user", None, None),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    tall = udf.infer(turns)
    failed = udf.failed_from(tall).collect()
    assert any(r["conv_id"] == "bad" for r in failed)
    # the healthy conversation still produced triples
    ok = udf.triples_from(tall).where("conv_id = 'ok'").count()
    assert ok == 1


def test_pack_by_budget():
    lengths = [100, 1, 50, 60, 2, 99]
    batches = pack_by_budget(lengths, max_tokens=120, max_rows=10)
    flat = sorted(i for b in batches for i in b)
    assert flat == list(range(6))  # exact cover
    for b in batches:
        assert sum(max(1, lengths[i]) for i in b) <= 120 or len(b) == 1


def test_microbatch_row_cap():
    lengths = [1] * 10
    batches = pack_by_budget(lengths, max_tokens=1000, max_rows=4)
    assert max(len(b) for b in batches) <= 4
    assert sorted(i for b in batches for i in b) == list(range(10))


def test_model_singleton_keyed_on_config(spark):
    """Two jobs sharing one Python worker with DIFFERENT configs must each
    get a model built from THEIR config — the r2 singleton froze the first
    caller's config in for the life of the worker."""
    from dygiepp_spark.config import PipelineConfig
    from dygiepp_spark.inference.model import get_model

    a = get_model(PipelineConfig(max_pair_distance=5))
    b = get_model(PipelineConfig(max_pair_distance=2))
    assert a.cfg.max_pair_distance == 5
    assert b.cfg.max_pair_distance == 2
    assert a is not b
    # same config → same instance (still a per-worker singleton per config)
    assert get_model(PipelineConfig(max_pair_distance=5)) is a
    assert get_model() is get_model(PipelineConfig())

    # end-to-end: the narrow config must emit strictly fewer far relations
    toks = "alice sent bob and later carol sent dave a report".split()
    wide = a.forward([toks])[0]
    narrow = b.forward([toks])[0]
    assert len(narrow.triples) <= len(wide.triples)


def test_unknown_model_backend_raises():
    import pytest as _pytest

    from dygiepp_spark.config import PipelineConfig
    from dygiepp_spark.inference.model import get_model

    with _pytest.raises(ValueError, match="model_backend"):
        get_model(PipelineConfig(model_backend="nope"))
