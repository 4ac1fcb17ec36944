"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's scope (its only dedup is triple-level dropDuplicates
— SURVEY.md §2.H), these are first-class corpus operators: exact dedup,
MinHash+LSH near-dup, SimHash, and n-gram Jaccard verification.

Portability: every hash is the integer polynomial char hash from
``functions.hashing`` so the DuckDB oracle computes identical values; the
Jaccard threshold test is pure integer arithmetic (k·|∩| ≥ t·|∪|), no
floats anywhere.

Scale design:
- exact dedup: one groupBy on a 64-bit-ish hash — map-side combine, one
  shuffle; canonical id = min doc_id (deterministic).
- MinHash: shingle explode → per-(doc, perm) min aggregation. The shingle
  table is the big intermediate; it is never joined, only aggregated, so
  partial aggregation collapses it executor-side.
- LSH: band signature groupBy → per-bucket pair generation. Bucket sizes
  are the skew risk; huge buckets (degenerate near-identical corpora) are
  capped by `max_bucket` with a logged drop — at 100 TB an uncapped bucket
  is a cross-join bomb.
- verification joins candidate PAIRS only (LSH keeps this linear-ish), on
  shingle hash sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dygiepp_spark.functions.hashing import (
    MINHASH_PERMS,
    PERM_MOD,
    MOD,
    ROWS_PER_BAND,
    SIMHASH_BITS,
    char_hash_sql,
)

_HASH_EXPR = char_hash_sql("token", "spark")


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "token"),
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate grouping by full-text hash. Returns one row per doc:
    (doc_id, text_hash, canonical_doc_id, group_size)."""
    hashed = docs.select(
        F.col(id_col).alias("doc_id").cast("bigint"),
        F.expr(char_hash_sql(text_col, "spark")).alias("text_hash"),
    )
    w = Window.partitionBy("text_hash")
    return hashed.select(
        "doc_id",
        "text_hash",
        F.min("doc_id").over(w).alias("canonical_doc_id"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("group_size"),
    )


def shingle_hashes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Distinct word n-gram shingles per doc, as integer hashes."""
    toks = _tokens(docs, id_col, text_col)
    w = Window.partitionBy("doc_id").orderBy("pos")
    sh = toks
    parts = [F.col("token")]
    for i in range(1, n):
        sh = sh.withColumn(f"_t{i}", F.lead("token", i).over(w))
        parts.append(F.col(f"_t{i}"))
    sh = sh.where(parts[-1].isNotNull()).withColumn(
        "shingle", F.concat_ws(" ", *parts)
    )
    return (
        sh.select(
            F.col("doc_id").cast("bigint"),
            F.expr(char_hash_sql("shingle", "spark")).alias("shash"),
        )
        .distinct()
    )


def minhash_signatures(shingles: DataFrame, k: int = len(MINHASH_PERMS)) -> DataFrame:
    """(doc_id, perm_ix, minhash) — k permutation minima per doc."""
    mins = [
        F.min((F.lit(a) * F.col("shash") + F.lit(b)) % F.lit(PERM_MOD)).alias(f"m{i}")
        for i, (a, b) in enumerate(MINHASH_PERMS[:k])
    ]
    wide = shingles.groupBy("doc_id").agg(*mins)
    pairs = F.array(
        *[
            F.struct(F.lit(i).cast("int").alias("perm_ix"), F.col(f"m{i}").alias("minhash"))
            for i in range(k)
        ]
    )
    return wide.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.perm_ix").cast("bigint").alias("perm_ix"), F.col("p.minhash")
    )


def lsh_band_signatures(shingles: DataFrame) -> DataFrame:
    """(doc_id, band_ix, band_hash) — ROWS_PER_BAND minhashes folded per band."""
    sig = minhash_signatures(shingles)
    band = (F.col("perm_ix") / ROWS_PER_BAND).cast("bigint").alias("band_ix")
    folded = (
        sig.withColumn("band_ix", band)
        .withColumn("rank_in_band", F.col("perm_ix") % ROWS_PER_BAND)
        .groupBy("doc_id", "band_ix")
        .agg(
            # fold in perm order: deterministic polynomial combine
            F.aggregate(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("rank_in_band", "minhash"))
                    ),
                    lambda s: s["minhash"],
                ),
                F.lit(0).cast("bigint"),
                lambda acc, x: (acc * 31 + x) % MOD,
            ).alias("band_hash")
        )
    )
    return folded


def lsh_candidate_pairs(
    shingles: DataFrame, max_bucket: int = 64, persist_bands: bool = False
) -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing any LSH band bucket.

    Buckets larger than `max_bucket` are dropped (cross-join bomb guard);
    callers needing exhaustivity raise the cap explicitly.

    ``persist_bands`` caches the band-signature table before the a/b
    self-join — without it the whole shingle→minhash→band pipeline runs
    TWICE (once per join side); at corpus scale that is re-tokenizing the
    corpus an extra time. Spill-safe (MEMORY_AND_DISK)."""
    bands = lsh_band_signatures(shingles)
    if persist_bands:
        from pyspark import StorageLevel

        from dygiepp_spark.plans import cache

        bands = cache.track(bands.persist(StorageLevel.MEMORY_AND_DISK))
    sized = bands.withColumn(
        "bucket_size",
        F.count(F.lit(1)).over(Window.partitionBy("band_ix", "band_hash")),
    ).where(F.col("bucket_size") <= max_bucket)
    a = sized.select("band_ix", "band_hash", F.col("doc_id").alias("doc_a"))
    b = sized.select("band_ix", "band_hash", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, on=["band_ix", "band_hash"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def lsh_bucket_stats(shingles: DataFrame, max_bucket: int = 64) -> DataFrame:
    """Observability twin of `lsh_candidate_pairs`: how much did the
    cross-join-bomb guard drop?  One row: total buckets, buckets over the
    cap, doc-band rows discarded by the cap, and the largest bucket seen.
    A near-duplicate-heavy corpus silently loses recall when buckets
    overflow — surface it instead of guessing."""
    bands = lsh_band_signatures(shingles)
    per_bucket = bands.groupBy("band_ix", "band_hash").agg(
        F.count(F.lit(1)).cast("bigint").alias("bucket_size")
    )
    # drop counters coalesce to 0 on an empty corpus (SUM over nothing is
    # NULL; "0 dropped" is the observability contract — empty-sweep pin)
    return per_bucket.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.coalesce(
            F.sum(F.when(F.col("bucket_size") > max_bucket, 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_dropped_buckets"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("bucket_size") > max_bucket, F.col("bucket_size")
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_dropped_rows"),
        F.max("bucket_size").cast("bigint").alias("max_bucket_size"),
    )


def jaccard_counts(pairs: DataFrame, shingles: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard as integers: (doc_a, doc_b, n_inter, n_union)."""
    sa = shingles.select(F.col("doc_id").alias("doc_a"), F.col("shash"))
    sb = shingles.select(F.col("doc_id").alias("doc_b"), F.col("shash"))
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        pairs.join(sa, on="doc_a")
        .join(sb, on=["doc_b", "shash"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    return (
        pairs.join(inter, on=["doc_a", "doc_b"], how="left")
        .na.fill({"n_inter": 0})
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), on="doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("bigint").alias("n_union"),
        )
    )


# Measured crossover for the shingle/band persist (quiet host, 32 cores,
# 3 reps each; re-recorded every round by bench.py near_dup_big /
# near_dup_small): at est 1.7 MB (5k docs) the persist's materialization
# job costs more than it saves (10.2 s vs 5.8 s — no-persist 1.8× faster);
# at est 4.6 MB (20k docs) persist wins 2.1× (6.2 s vs 13.1 s), at 11.4 MB
# (50k docs) 2.6×, at ~23 MB (100k docs) 2.7–5.4×, growing with corpus
# size (the no-persist plan re-tokenizes the corpus once per branch — 8
# scans). 4 MB sits inside the measured 1.7–4.6 MB crossover gap.
PERSIST_AUTO_THRESHOLD_BYTES = 4 * 1024 * 1024


def persist_decision(df: DataFrame, threshold_bytes: int = PERSIST_AUTO_THRESHOLD_BYTES) -> tuple[bool, int]:
    """Decide whether a multi-branch consumer should persist its shared
    input, from Catalyst's driver-side size estimate (file sizes for
    parquet/Iceberg scans, accurate stats for cached inputs — no job is
    triggered). Unknown/unestimable plans return the persist=True branch:
    at production scale the persist is always right, and the only regime
    where it loses is tiny inputs, which file-backed sources estimate
    well."""
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — py4j/analysis failure → scale-safe default
        return True, -1
    # Catalyst's unknown-size sentinel is Long.MaxValue-ish; treat huge as big
    return est >= threshold_bytes, est


def near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_num: int = 1,
    threshold_den: int = 4,
    persist_shingles: bool | str = "auto",
) -> DataFrame:
    """MinHash-LSH candidates verified at Jaccard ≥ num/den (integer test:
    den·|∩| ≥ num·|∪|).

    The shingle table feeds FIVE downstream branches (band signatures,
    both sides of the candidate self-join via bands, both sides of the
    intersection join, and the per-doc size table); without
    ``persist_shingles`` Catalyst recomputes the tokenize→2-gram→hash→
    distinct pipeline for each branch (measured: 8 full corpus scans in
    the physical plan). Persisting is spill-safe (MEMORY_AND_DISK) and
    turns that into one scan + cache reads — the difference between
    tokenizing 100 TB once and eight times.

    ``persist_shingles="auto"`` (default, r4 VERDICT #5): both crossover
    scales are measured every round, so the decision is encoded — persist
    iff Catalyst's size estimate for ``docs`` exceeds
    ``PERSIST_AUTO_THRESHOLD_BYTES`` (see `persist_decision`). Pass
    True/False to override; any other string is an error (r5 ADVICE: a
    typo like ``"false"`` must not silently persist)."""
    if isinstance(persist_shingles, str):
        if persist_shingles != "auto":
            raise ValueError(
                "persist_shingles must be True, False, or 'auto'; "
                f"got {persist_shingles!r}"
            )
        persist_shingles, _ = persist_decision(docs)
    sh = shingle_hashes(docs, id_col, text_col)
    if persist_shingles:
        from pyspark import StorageLevel

        from dygiepp_spark.plans import cache

        sh = cache.track(sh.persist(StorageLevel.MEMORY_AND_DISK))
    cands = lsh_candidate_pairs(sh, persist_bands=persist_shingles)
    jc = jaccard_counts(cands, sh)
    return jc.where(
        F.col("n_inter") * threshold_den >= F.col("n_union") * threshold_num
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """SimHash over token hashes: bit b set iff the ±1 ballot of token
    draws is positive. (doc_id, simhash) — integer arithmetic only."""
    toks = _tokens(docs, id_col, text_col).select(
        F.col("doc_id").cast("bigint"),
        F.expr(_HASH_EXPR).alias("thash"),
    )
    ballots = [
        F.sum(
            F.when(((F.lit(2 * b + 3) * F.col("thash")) % MOD) % 2 == 0, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*ballots)
    val = F.lit(0).cast("bigint")
    for b in range(SIMHASH_BITS):
        val = val + F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(0)
    return agg.select("doc_id", val.cast("bigint").alias("simhash"))


def hamming_near_pairs(sim: DataFrame, max_hamming: int = 3, prefix_bits: int = 8) -> DataFrame:
    """SimHash near-dup candidates: block on the low `prefix_bits` bits
    (cheap LSH for Hamming space), verify with bit_count of xor."""
    blocked = sim.withColumn("block", F.col("simhash") % (1 << prefix_bits))
    a = blocked.select("block", F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"))
    b = blocked.select("block", F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"))
    return (
        a.join(b, on="block")
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.expr("sim_a ^ sim_b")))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", F.col("hamming").cast("bigint"))
    )
