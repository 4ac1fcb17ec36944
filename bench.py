#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
 "sf": ..., "turns_per_sec": ...}

Scaling evidence (BASELINE.md §2: efficiency ≥ 0.8 between N and 4N):
run `python scripts/scaling_bench.py`, which invokes this file at two
parallelism levels and writes BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "ner_mentions",
    "relation_triples",
    "triple_dedup",
    "canonical_triples",
    "coref_clusters",
    "prune_topk",
    "event_arguments",
    "span_enum_counts",
    "near_dup_pairs",
    "simhash_values",
    "embedding_dot_topk",
    "lang_id_predict",
    "quality_scores",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from dygiepp_spark.session import get_spark
    from dygiepp_spark.registry import QUERIES
    from dygiepp_spark.tables import read_turns

    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 2, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in QUERIES]
    extra = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if extra:
        names = [n for n in extra.split(",") if n in QUERIES]

    n_turns = read_turns(spark, sf_dir=sf_dir).count()

    # warm-up: JIT/codegen + parquet footer caching, not measured
    QUERIES["span_enum_counts"].build(spark, sf_dir).count()

    per_query: dict[str, float] = {}
    t_total0 = time.perf_counter()
    for name in names:
        t0 = time.perf_counter()
        df = QUERIES[name].build(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        per_query[name] = round(time.perf_counter() - t0, 3)
    total = time.perf_counter() - t_total0

    out = {
        "metric": "headline_query_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns * len(names) / total, 1),
        "cpus": int(cpus),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
