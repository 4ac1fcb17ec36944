"""Assembly-layer tests: B1 offsets, B2 round-trip, B5 split, B8 normalize
(reference test models: dygie/tests/data/document_test.py:36-56,
dygie_test.py:12-98)."""

from pyspark.sql import functions as F

from dygiepp_spark.config import PipelineConfig
from dygiepp_spark.operators import assembly


def test_sentence_starts_cumsum(tiny_turns):
    out = {
        (r["conv_id"], r["turn_idx"]): (r["n_tokens"], r["sentence_start"])
        for r in assembly.with_sentence_starts(tiny_turns).collect()
    }
    # conv A lengths: 7, 9, 2 → starts 0, 7, 16 (roll(cumsum,1)[0]=0)
    assert out[("A", 0)] == (7, 0)
    assert out[("A", 1)] == (9, 7)
    assert out[("A", 2)] == (2, 16)
    assert out[("B", 0)] == (3, 0)
    assert out[("B", 1)] == (3, 3)


def test_assemble_documents_golden(tiny_turns):
    docs = {r["doc_key"]: r for r in assembly.assemble_documents(tiny_turns).collect()}
    a = docs["A"]
    assert a["dataset"] == "transcripts"
    assert a["sentences"][0] == ["the", "customer", "will", "join", "the", "order", "table"]
    assert a["sentence_starts"] == [0, 7, 16]
    assert a["roles"] == ["user", "assistant", "user"]


def test_roundtrip_per_turn_text_equality(tiny_turns):
    """The per-row invariant from BASELINE.json: per-turn text equality
    under stable turn ordering."""
    docs = assembly.assemble_documents(tiny_turns)
    back = assembly.explode_documents(docs)
    orig = tiny_turns.select("conv_id", "turn_idx", "text", "role").orderBy(
        "conv_id", "turn_idx"
    )
    got = back.select("conv_id", "turn_idx", "text", "role").orderBy(
        "conv_id", "turn_idx"
    )
    assert orig.collect() == got.collect()
    # exploded sentence_start equals windowed B1 value
    b1 = {
        (r["conv_id"], r["turn_idx"]): r["sentence_start"]
        for r in assembly.with_sentence_starts(tiny_turns).collect()
    }
    for r in back.collect():
        assert b1[(r["conv_id"], r["turn_idx"])] == r["sentence_start"]


def test_normalize_text(spark):
    df = spark.createDataFrame(
        [("X", 0, "u", "done /. sure /?", None)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    out = assembly.normalize_text(df).head()["text"]
    assert out == "done . sure ?"


def test_length_guard(tiny_turns):
    flagged = assembly.length_guard(tiny_turns, max_tokens=8)
    rows = {(r["conv_id"], r["turn_idx"]): r for r in flagged.collect()}
    assert not rows[("A", 0)]["is_single_token"]
    assert rows[("A", 1)]["exceeds_encoder_limit"]  # 9 tokens > 8


def test_split_documents(spark):
    # 5 turns of 4 tokens, cap 8 → chunks by floor(start/8): 0,0,1,1,2
    rows = [("C", i, "u", "a b c d", None) for i in range(5)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    out = assembly.split_documents(df, PipelineConfig(max_tokens_per_doc=8))
    got = {r["turn_idx"]: (r["chunk_id"], r["split_key"]) for r in out.collect()}
    assert [got[i][0] for i in range(5)] == [0, 0, 1, 1, 2]
    assert got[4][1] == "C_SPLIT_2"


def test_locate_spans_drops_cross_turn(tiny_turns, spark):
    # conv A: doc positions turn0=[0,7), turn1=[7,16)
    spans = spark.createDataFrame(
        [("A", 1, 3), ("A", 7, 9), ("A", 6, 8)],  # last crosses turn boundary
        "conv_id string, start long, end long",
    )
    out = assembly.locate_spans(spans, tiny_turns).collect()
    got = {(r["doc_start"], r["doc_end"]): (r["turn_idx"], r["rel_start"], r["rel_end"]) for r in out}
    assert got == {(1, 3): (0, 1, 3), (7, 9): (1, 0, 2)}
