"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting — the per-document hygiene layer of a training-data
pipeline. All JVM-side column expressions (no Python in the hot path);
ratios are int/int divisions rounded to 4 decimals so the DuckDB oracle
matches bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from dygiepp_spark.functions.hashing import char_hash_sql
from dygiepp_spark.functions.lexicons import STOPWORDS

PROFILE_SIZE = 20  # top char-bigrams per language profile
WINNOW_WINDOW = 16  # chars per rolling fingerprint window


def quality_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality signals: token/type counts, stopword ratio,
    type-token ratio, mean token length, and a combined score
    (dyadic weights: q = ttr/2 + (1 − stopword_ratio)/4 + min(n/64,1)/4)."""
    toks = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_types"),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("bigint").alias("stopword_cnt"),
        F.length(F.col(text_col)).cast("bigint").alias("n_chars"),
    )
    ttr = F.col("n_types") / F.col("n_tokens")
    swr = F.col("stopword_cnt") / F.col("n_tokens")
    lenf = F.least(F.col("n_tokens") / 64.0, F.lit(1.0))
    return base.select(
        "doc_id",
        "n_tokens",
        "n_types",
        "stopword_cnt",
        "n_chars",
        F.round(ttr, 4).alias("type_token_ratio"),
        F.round(swr, 4).alias("stopword_ratio"),
        F.round((F.col("n_chars") - F.col("n_tokens") + 1) / F.col("n_tokens"), 4).alias(
            "mean_token_len"
        ),
        F.round(ttr / 2 + (1 - swr) / 4 + lenf / 4, 4).alias("quality"),
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish subword estimate
    (ceil(len(token)/4) per token, integer arithmetic)."""
    toks = F.split(F.col(text_col), " ")
    return docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.size(toks).cast("bigint").alias("n_ws_tokens"),
        F.aggregate(
            F.transform(toks, lambda t: F.floor((F.length(t) + 3) / 4).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("n_subwords"),
    )


def doc_fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Full-text polynomial fingerprint + winnowing-style min of rolling
    window hashes (robust to local edits)."""
    full = F.expr(char_hash_sql(text_col, "spark"))
    windows = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(text_col) - (WINNOW_WINDOW - 1), F.lit(1))),
        lambda i: F.substring(F.col(text_col), i, WINNOW_WINDOW),
    )
    win_hashes = F.transform(
        windows,
        lambda s: F.aggregate(
            F.transform(F.split(s, ""), lambda c: F.ascii(c).cast("bigint")),
            F.lit(-1).cast("bigint"),
            lambda acc, x: F.when(acc == -1, x).otherwise((acc * 31 + x) % 1_000_000_007),
        ),
    )
    return docs.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        full.alias("fingerprint"),
        F.array_min(win_hashes).alias("winnow_min"),
    )


def _char_bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    grams = F.transform(
        F.sequence(F.lit(1), F.length(text_col) - 1),
        lambda i: F.substring(F.col(text_col), i, 2),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("bigram")
    )


def lang_profiles(docs: DataFrame, lang_col: str = "lang", text_col: str = "text") -> DataFrame:
    """Per-language top char-bigram profile built from labeled docs (the
    classic n-gram LID profile, built with one groupBy)."""
    grams = _char_bigrams(docs.select(F.col(lang_col).alias("doc_id"), text_col), "doc_id", text_col)
    counts = grams.groupBy(F.col("doc_id").alias("lang"), "bigram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("bigram"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= PROFILE_SIZE)
        .select("lang", "bigram")
    )


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            lang_col: str = "lang", persist: bool | str = "auto") -> DataFrame:
    """Predict language by profile-overlap argmax (tie-break lang asc);
    returns (doc_id, pred_lang, actual_lang, is_correct). Profiles are a
    broadcast-sized table."""
    # ONE corpus scan + ONE bigram pass (was 3 scans / 2 explodes). r7: the
    # per-char substring explode ran through interpreted expressions
    # (~20 µs/char) and materialized one row per bigram OCCURRENCE; the
    # kernel below (guide §4.2) counts bigrams per doc in one Python batch
    # pass and emits one row per DISTINCT (doc, bigram) with its count —
    # ~8× fewer persisted rows, ~10× less CPU. Occurrence counts are
    # preserved exactly (profile cnt = Σ per-doc counts; overlap = Σ counts
    # of matched bigrams), so profiles, tie-breaks, and predictions are
    # byte-identical to the explode plan and the DuckDB oracle is
    # unchanged. The gram edge cases of Spark's sequence(1, len-1) +
    # substring (len 1 → [t, t]; len 0 → ['','','']) are replicated
    # verbatim.
    # The counts table feeds TWO branches (profile aggregation + scoring
    # join); the persist is adaptive (maybe_persist on the docs scan, the
    # r5-VERDICT-#4 convention): above the crossover one kernel pass serves
    # both branches from cache, below it the two-pass recompute is cheaper
    # than the materialization job.
    from collections import Counter

    from dygiepp_spark.plans import cache

    def _gram_counts(it):
        import pandas as pd

        for pdf in it:
            ids, langs, bgs, cnts = [], [], [], []
            for doc_id, lang, text in zip(pdf["doc_id"], pdf["actual_lang"], pdf["text"]):
                t = "" if text is None else text
                ln = len(t)
                if ln >= 2:
                    c = Counter(t[i - 1 : i + 1] for i in range(1, ln))
                elif ln == 1:
                    c = {t: 2}
                else:
                    c = {"": 3}
                for g, k in c.items():
                    ids.append(doc_id)
                    langs.append(lang)
                    bgs.append(g)
                    cnts.append(k)
            yield pd.DataFrame(
                {"doc_id": ids, "actual_lang": langs, "bigram": bgs, "cnt": cnts}
            )

    grams = cache.maybe_persist(
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(lang_col).alias("actual_lang"),
            F.col(text_col).alias("text"),
        ).mapInPandas(
            _gram_counts,
            schema="doc_id long, actual_lang string, bigram string, cnt long",
        ),
        decide_on=docs,
        persist=persist,
    )
    prof_w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("bigram"))
    profiles = (
        grams.groupBy(F.col("actual_lang").alias("lang"), "bigram")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("rnk", F.row_number().over(prof_w))
        .where(F.col("rnk") <= PROFILE_SIZE)
        .select("lang", "bigram")
    )
    scores = (
        grams.join(F.broadcast(profiles), on="bigram")
        .groupBy("doc_id", "actual_lang", "lang")
        .agg(F.sum("cnt").alias("overlap"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("overlap").desc(), F.col("lang").asc())
    pred = scores.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") == 1)
    return pred.select(
        F.col("doc_id").cast("bigint"),
        F.col("lang").alias("pred_lang"),
        "actual_lang",
        (F.col("lang") == F.col("actual_lang")).alias("is_correct"),
    )
