"""Adversarial property pin for the incremental-merge contract (r5 VERDICT
#3): ``fold(merge_canonical, [canonical(B_i)]) ≡ canonical(∪ B_i)`` for
ARBITRARY K-way partitions of the triple set — not just the one 2-way hash
split exercised by tests/test_iceberg_readiness.py and the driver-gated
`canonical_merge_increment` query. Hypothesis drives the partition shape:
empty batches, singleton batches, all-in-one-batch, K=1..5, duplicate
triples landing in the same or different batches (the support-accumulation
path), and alias-colliding surfaces (two surfaces → one canonical id, so
the merge key is the LINKED id, not the raw surface).

This is the north-star incremental-maintenance claim for the Iceberg MERGE
(sources/iceberg.py:canonical_triples_merge_sql): support counts are
associative, so maintaining the store batch-by-batch reproduces the full
recompute exactly.
"""

from functools import reduce

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from dygiepp_spark.operators import canonicalize

# small alphabets force key collisions (dedup) and alias hits ("row" and
# "line" both link to ENT_RECORD — merges across raw-surface boundaries)
_SURFACES = ["row", "line", "data", "widget", "Gadget Pro"]
_PREDS = ["USES", "MERGE"]

_triple = st.tuples(
    st.sampled_from(_SURFACES),
    st.sampled_from(_PREDS),
    st.sampled_from(_SURFACES),
)


@st.composite
def _partitioned_triples(draw):
    k = draw(st.integers(min_value=1, max_value=5))
    triples = draw(st.lists(_triple, min_size=0, max_size=12))
    # independent batch assignment per triple: empty batches and
    # singleton batches arise naturally, and duplicates can land in the
    # same batch (in-batch dedup) or split across batches (merge accum)
    batches = draw(
        st.lists(
            st.integers(min_value=0, max_value=k - 1),
            min_size=len(triples),
            max_size=len(triples),
        )
    )
    return k, list(zip(triples, batches))


_SCHEMA = "subj_surface string, pred string, obj_surface string, batch int"


@given(_partitioned_triples())
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_merge_canonical_fold_equals_full_recompute(spark, data):
    k, rows = data
    aliases = canonicalize.alias_dict(spark)
    flat = [(s, p, o, b) for (s, p, o), b in rows]
    df = spark.createDataFrame(flat, _SCHEMA) if flat else spark.createDataFrame(
        [], _SCHEMA
    )

    full = canonicalize.canonical_triples(df.drop("batch"), aliases)
    per_batch = [
        canonicalize.canonical_triples(
            df.where(F.col("batch") == i).drop("batch"), aliases
        )
        for i in range(k)
    ]
    merged = reduce(canonicalize.merge_canonical, per_batch)

    key = ("subj_canonical", "pred", "obj_canonical", "n_support")
    got = sorted(tuple(r[c] for c in key) for r in merged.collect())
    want = sorted(tuple(r[c] for c in key) for r in full.collect())
    assert got == want
