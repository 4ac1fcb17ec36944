"""Deterministic extraction lexicons for the stand-in scoring model.

The sandbox has no trained DyGIE++ weights, so the scoring model is a
deterministic rule system over the synthetic corpus vocabulary (SURVEY.md §7
"hard parts" item 5). It plays the role of the BERT + feedforward heads:
given tokens it produces typed mentions, relation triples, event
trigger/argument structures and coreference links with scores. Crucially it
is expressible BOTH as vectorized column expressions / pandas UDFs (Spark)
and as ANSI SQL (DuckDB oracle), so triple-level P/R parity is measurable
end-to-end exactly like the reference's relation-match criterion
(reference: README.md:419-424 — label + both argument spans).
"""

from __future__ import annotations

# Entity nouns → type labels (reference label namespaces are per-dataset
# string vocabularies with null label '' at index 0, ner.py:49-51).
ENTITY_TYPES: dict[str, str] = {
    "customer": "ACTOR",
    "spark": "ACTOR",
    "table": "ARTIFACT",
    "row": "ARTIFACT",
    "column": "ARTIFACT",
    "line": "ARTIFACT",
    "key": "ARTIFACT",
    "value": "ARTIFACT",
    "vector": "ARTIFACT",
    "data": "ARTIFACT",
    "order": "WORKLOAD",
    "part": "WORKLOAD",
    "batch": "WORKLOAD",
    "group": "WORKLOAD",
    "query": "WORKLOAD",
    "window": "WORKLOAD",
    "stream": "WORKLOAD",
}

# Predicate verbs: relation labels and event trigger types.
PREDICATES: tuple[str, ...] = ("join", "merge", "filter", "scan", "sort", "hash", "agg")

# Modifiers: form 2-token mentions (modifier + entity noun) and feed the
# quality-scoring ops.
MODIFIERS: tuple[str, ...] = ("small", "slow", "big", "fast")

STOPWORDS: tuple[str, ...] = ("a", "the")

NULL_LABEL = ""  # reference null label, index 0 (ner.py:49-51)


def sql_in(values) -> str:
    """Render a python string collection as a SQL IN-list."""
    return "(" + ", ".join(f"'{v}'" for v in values) + ")"


# CASE expression mapping an entity token to its label — identical text is
# valid in Spark SQL and DuckDB.
def entity_label_case(col: str = "token") -> str:
    whens = "\n".join(
        f"    WHEN {col} = '{tok}' THEN '{lab}'" for tok, lab in sorted(ENTITY_TYPES.items())
    )
    return f"CASE\n{whens}\n    ELSE NULL END"
