"""Property-based invariants over random turn tables (hypothesis).

Random corpora (arbitrary token strings, ragged turn counts) must satisfy
the structural invariants regardless of content — the reference's
roundtrip/offset laws (FIXTURES.md §5), not just the synthetic grammar.
"""

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dygiepp_spark.config import PipelineConfig
from dygiepp_spark.operators import assembly, extract
from dygiepp_spark.operators.spans import enumerate_spans

token = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6)
turn_text = st.lists(token, min_size=1, max_size=12).map(" ".join)


@st.composite
def turn_tables(draw):
    n_convs = draw(st.integers(1, 4))
    rows = []
    for c in range(n_convs):
        n_turns = draw(st.integers(1, 5))
        for t in range(n_turns):
            rows.append((f"c{c}", t, "user", draw(turn_text), None))
    return rows


_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(rows=turn_tables())
@settings(**_SETTINGS)
def test_roundtrip_and_offsets_hold_for_any_corpus(spark, rows):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    # roundtrip: per-turn text equality
    back = assembly.explode_documents(assembly.assemble_documents(df))
    orig = {(r["conv_id"], r["turn_idx"]): r["text"] for r in df.collect()}
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in back.collect()}
    assert got == orig
    # offsets: sentence_start = sum of preceding turn lengths
    offs = assembly.with_sentence_starts(df).collect()
    by_conv = {}
    for r in sorted(offs, key=lambda r: (r["conv_id"], r["turn_idx"])):
        expect = by_conv.get(r["conv_id"], 0)
        assert r["sentence_start"] == expect
        by_conv[r["conv_id"]] = expect + r["n_tokens"]


@given(rows=turn_tables())
@settings(**_SETTINGS)
def test_span_count_formula_any_corpus(spark, rows):
    cfg = PipelineConfig(max_span_width=8)
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    counts = {
        (r["conv_id"], r["turn_idx"]): r["n"]
        for r in enumerate_spans(df, cfg).groupBy("conv_id", "turn_idx").count()
        .withColumnRenamed("count", "n").collect()
    }
    for conv_id, turn_idx, _, text, _ in rows:
        n, w = len(text.split(" ")), 8
        expect = n * w - w * (w - 1) // 2 if n >= w else n * (n + 1) // 2
        assert counts[(conv_id, turn_idx)] == expect


@given(rows=turn_tables())
@settings(**_SETTINGS)
def test_overlap_merge_produces_disjoint_spans(spark, rows):
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    )
    merged = extract.overlap_merge(extract.ner_mentions(df)).collect()
    per_turn = {}
    for r in merged:
        per_turn.setdefault((r["conv_id"], r["turn_idx"]), []).append((r["start"], r["end"]))
    for spans in per_turn.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 < s2  # pairwise disjoint after merge
