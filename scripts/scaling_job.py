#!/usr/bin/env python
"""One scaling-bench job: end-to-end triple extraction (Arrow-UDF
inference → triple dedup → canonicalization) over a deterministic synthetic
transcript corpus, at the parallelism given by SPARK_GRAFT_CPUS.

Prints one JSON line {cpus, n_convs, n_turns, sec, turns_per_sec}.
Run via scripts/scaling_bench.py, which invokes this at two parallelism
levels and computes the N→4N scaling efficiency (BASELINE.md §2: in-sandbox
stand-in for the two-cluster-size criterion).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_convs = int(os.environ.get("SPARK_GRAFT_SCALING_CONVS", "30000"))

    from dygiepp_spark.session import get_spark
    from dygiepp_spark.synth import synth_turns
    from dygiepp_spark.inference import udf as iudf
    from dygiepp_spark.operators import canonicalize, extract

    spark = get_spark(
        "scaling", master=f"local[{cpus}]", shuffle_partitions=cpus * 2
    )
    spark.sparkContext.setLogLevel("ERROR")

    turns = synth_turns(
        spark, n_convs=n_convs, mega_every=1000, mega_turns=2048, seed=42
    ).repartition(cpus * 2)
    turns.persist()
    n_turns = turns.count()  # materialize input outside the timed section

    def pipeline() -> None:
        tall = iudf.infer(turns)
        triples = iudf.triples_from(tall)
        canonical = canonicalize.canonical_triples(
            triples, canonicalize.alias_dict(spark)
        )
        canonical.write.format("noop").mode("overwrite").save()

    # warm-up run: Python worker spawn + codegen compile are one-time
    # per-process costs, not throughput — a cluster amortizes them over
    # hours; exclude from the measurement
    pipeline()

    n_timed = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "1"))
    sec = min(_timed(pipeline) for _ in range(n_timed))

    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_convs": n_convs,
                "n_turns": n_turns,
                "sec": round(sec, 3),
                "turns_per_sec": round(n_turns / sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
