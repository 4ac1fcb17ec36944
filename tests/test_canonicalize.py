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


# ---------------------------------------------------------------- fuzzy link

def _fuzzy_map(spark, surfaces):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"surface": surfaces}))
    rows = canonicalize.fuzzy_alias_map(
        df, canonicalize.alias_dict(spark)
    ).collect()
    return {r["surface"]: (r["matched_alias"], r["canonical_id"], r["dist"]) for r in rows}


def test_fuzzy_alias_map_exact_and_distance_one(spark):
    got = _fuzzy_map(
        spark,
        [
            "order",   # exact
            "ordr",    # deletion
            "oorder",  # insertion
            "ardor",   # dist 2 — must NOT match
            "xrder",   # substitution
            "strea",   # deletion of 'stream'
            "xyzzy",   # nothing within dist 1
        ],
    )
    assert got["order"] == ("order", "ENT_ORDER", 0)
    assert got["ordr"] == ("order", "ENT_ORDER", 1)
    assert got["oorder"] == ("order", "ENT_ORDER", 1)
    assert got["xrder"] == ("order", "ENT_ORDER", 1)
    assert got["strea"] == ("stream", "ENT_DATASET", 1)
    assert "ardor" not in got
    assert "xyzzy" not in got


def test_fuzzy_alias_map_tie_breaks_deterministically(spark):
    # dist-0 sorts before dist-1, so an exact hit always beats a fuzzy one
    got = _fuzzy_map(spark, ["data", "rows"])
    assert got["data"] == ("data", "ENT_DATASET", 0)  # exact beats any fuzzy
    assert got["rows"] == ("row", "ENT_RECORD", 1)


def test_fuzzy_alias_map_multi_candidate_min_alias_wins(spark):
    # extend the alias table in-test with a colliding key so a genuine
    # two-candidate tie exists: "lane" and "line" are both dist 1 from
    # "lne"? lne→line insert i =1; lne→lane insert a =1. Tie at dist 1 →
    # min alias surface ("lane" < "line") wins.
    import pandas as pd

    aliases = spark.createDataFrame(
        pd.DataFrame(
            {"surface_form": ["lane", "line"], "canonical_id": ["ENT_LANE", "ENT_RECORD"]}
        )
    )
    df = spark.createDataFrame(pd.DataFrame({"surface": ["lne"]}))
    rows = canonicalize.fuzzy_alias_map(df, aliases).collect()
    assert len(rows) == 1
    assert (rows[0]["matched_alias"], rows[0]["canonical_id"]) == ("lane", "ENT_LANE")


def test_link_surface_fuzzy_fallback_and_repair(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"subj_surface": ["ordr", "widget", "line"]})
    )
    out = canonicalize.link_surface_fuzzy(
        df, "subj_surface", "subj_canonical", canonicalize.alias_dict(spark)
    )
    got = {r["subj_surface"]: r["subj_canonical"] for r in out.collect()}
    assert got == {
        "ordr": "ENT_ORDER",       # repaired typo
        "widget": "ENT_WIDGET",    # fallback
        "line": "ENT_RECORD",      # exact alias
    }


def test_deletion_variants_block_covers_all_distance_one_pairs(spark):
    """Property: any pair at levenshtein distance ≤ 1 shares a deletion
    variant (the completeness claim the blocking join relies on)."""
    import itertools

    import pandas as pd

    words = ["", "a", "ab", "abc", "abcd", "acd", "bc", "xabc", "axbc", "abxc"]
    df = spark.createDataFrame(pd.DataFrame({"surface": words}))
    rows = df.select(
        "surface", canonicalize.deletion_variants(F.col("surface")).alias("v")
    ).collect()
    variants = {r["surface"]: set(r["v"]) for r in rows}

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    for a, b in itertools.combinations(words, 2):
        if lev(a, b) <= 1:
            assert variants[a] & variants[b], (a, b)


# ----------------------------------------------------------- temporal store

_T_SCHEMA = (
    "subj_surface string, pred string, obj_surface string, "
    "conv_id string, turn_idx int, batch int"
)


@given(_partitioned_triples())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_merge_canonical_temporal_fold_equals_full_recompute(spark, data):
    """The temporal variant of the K-way fold property: SUM/MIN/MAX are
    all associative, so incremental maintenance of the valid-time store
    (support + first/last-seen envelope) over any batch split reproduces
    the full recompute. Each triple occurrence is pinned to its own turn
    so duplicates carry DIFFERENT timestamps — the envelope genuinely
    widens across batches."""
    import datetime

    k, rows = data
    aliases = canonicalize.alias_dict(spark)
    flat = [
        (s, p, o, "c0", i, b) for i, ((s, p, o), b) in enumerate(rows)
    ]
    df = (
        spark.createDataFrame(flat, _T_SCHEMA)
        if flat
        else spark.createDataFrame([], _T_SCHEMA)
    )
    base = datetime.datetime(2024, 1, 1)
    times = spark.createDataFrame(
        [("c0", i, base + datetime.timedelta(minutes=i)) for i in range(max(len(flat), 1))],
        "conv_id string, turn_idx int, ts timestamp",
    )

    full = canonicalize.canonical_triples_temporal(df.drop("batch"), times, aliases)
    per_batch = [
        canonicalize.canonical_triples_temporal(
            df.where(F.col("batch") == i).drop("batch"), times, aliases
        )
        for i in range(k)
    ]
    merged = reduce(canonicalize.merge_canonical_temporal, per_batch)

    key = (
        "subj_canonical", "pred", "obj_canonical",
        "n_support", "first_seen_ts", "last_seen_ts",
    )
    got = sorted(tuple(r[c] for c in key) for r in merged.collect())
    want = sorted(tuple(r[c] for c in key) for r in full.collect())
    assert got == want


def test_canonical_triples_asof_exact_support_and_envelope(spark):
    """The as-of snapshot recomputes support and envelope from pre-cutoff
    evidence only — NOT derivable from the accumulated envelope (MIN/MAX
    don't subtract). 'row'/'line' both link to ENT_RECORD, so the
    canonical key aggregates across surfaces; occurrence 3 (ts=03:00)
    falls after the 02:30 cutoff and must drop from support AND shrink
    last_seen back to 02:00."""
    import datetime

    aliases = canonicalize.alias_dict(spark)
    flat = [
        ("row", "USES", "data", "c0", 0, 0),
        ("line", "USES", "data", "c0", 2, 0),   # same canonical key, 02:00
        ("row", "USES", "data", "c0", 3, 0),    # post-cutoff occurrence
        ("widget", "USES", "data", "c0", 3, 0), # entirely post-cutoff key
    ]
    df = spark.createDataFrame(flat, _T_SCHEMA)
    base = datetime.datetime(2024, 1, 1)
    times = spark.createDataFrame(
        [("c0", i, base + datetime.timedelta(hours=i)) for i in range(4)],
        "conv_id string, turn_idx int, ts timestamp",
    )
    snap = canonicalize.canonical_triples_asof(
        df.drop("batch"), times, aliases, "2024-01-01 02:30:00"
    )
    got = {
        (r["subj_canonical"], r["pred"], r["obj_canonical"]): (
            r["n_support"], r["first_seen_ts"], r["last_seen_ts"]
        )
        for r in snap.collect()
    }
    assert got == {
        ("ENT_RECORD", "USES", "ENT_DATASET"): (
            2, base, base + datetime.timedelta(hours=2)
        )
    }
    # full recompute for contrast: support 3, envelope reaches 03:00, and
    # the post-cutoff-only key exists
    full = canonicalize.canonical_triples_temporal(df.drop("batch"), times, aliases)
    fgot = {
        (r["subj_canonical"], r["pred"], r["obj_canonical"]): (
            r["n_support"], r["last_seen_ts"]
        )
        for r in full.collect()
    }
    assert fgot[("ENT_RECORD", "USES", "ENT_DATASET")] == (
        3, base + datetime.timedelta(hours=3)
    )
    assert ("ENT_WIDGET", "USES", "ENT_DATASET") in fgot
