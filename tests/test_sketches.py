"""Approximate aggregations validated against the exact corpus_stats
query: HLL distinct counts and approximate percentiles within tolerance.
(The exact versions are the oracle-gated `corpus_stats`; the approximate
versions are the 100 TB path, where exact distinct would shuffle every
key.)"""

from pyspark.sql import functions as F

from dygiepp_spark.operators.assembly import with_token_counts
from dygiepp_spark.synth import synth_turns


def test_hll_and_approx_percentile_within_tolerance(spark):
    turns = with_token_counts(synth_turns(spark, n_convs=500, seed=13))
    row = turns.agg(
        F.countDistinct("conv_id").alias("exact_convs"),
        F.approx_count_distinct("conv_id", rsd=0.02).alias("hll_convs"),
        F.expr("percentile(n_tokens, 0.5)").alias("exact_median"),
        F.expr("approx_percentile(n_tokens, 0.5, 1000)").alias("approx_median"),
    ).head()
    assert abs(row["hll_convs"] - row["exact_convs"]) <= 0.05 * row["exact_convs"]
    assert abs(row["approx_median"] - row["exact_median"]) <= 1.0
