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


@given(seed=st.integers(0, 10_000))
@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_integer_cosine_predicate_matches_float(seed):
    """The all-integer near-dup predicate den²·dot² ≥ num²·n2a·n2b (dot>0)
    must agree with the float cosine comparison for arbitrary quantized
    vectors — pure math law, no Spark needed (overflow-safety is separate:
    operands stay within int64 for |q|≤~1000, dim≤64)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    a = np.floor(rng.uniform(-0.6, 0.6, size=64) * 1000)
    b = np.floor(rng.uniform(-0.6, 0.6, size=64) * 1000)
    dot = float(a @ b)
    n2a, n2b = float(a @ a), float(b @ b)
    if n2a == 0 or n2b == 0:
        return
    for num, den in [(3, 10), (9, 10), (1, 2)]:
        int_pred = dot > 0 and den * den * dot * dot >= num * num * n2a * n2b
        cos = dot / (n2a ** 0.5 * n2b ** 0.5)
        # strict float comparison except within float error of the boundary
        if abs(cos - num / den) > 1e-9:
            assert int_pred == (cos >= num / den)


def test_synth_docs_deterministic_and_planted_dups(spark):
    """synth_docs is bitwise deterministic for a (n, seed) pair and every
    dup_every-th doc is a near-copy of its predecessor (same prefix, one
    perturbed tail token)."""
    from dygiepp_spark.synth import synth_docs

    a = {r["doc_id"]: r["text"] for r in synth_docs(spark, n_docs=60, seed=3).collect()}
    b = {r["doc_id"]: r["text"] for r in synth_docs(spark, n_docs=60, seed=3).collect()}
    assert a == b
    for d in range(1, 60, 10):  # dup_every=10 → doc_ids 1, 11, 21, ...
        src, dup = a[d - 1].split(" "), a[d].split(" ")
        assert dup[-1] == "perturbed" and dup[:-1] == src[: len(dup) - 1]
        assert a[d] != a[d - 1]
