#!/usr/bin/env python
"""Round-7 optimization profiler (guide §1): per-query noop-sink timing,
physical-plan capture, and REST stage metrics for every headline query.

NOT part of the frozen bench contract — bench.py stays the driver's
measurement tool; this exists to attribute time (jobs, stages, shuffle
bytes, Exchange count) per query so optimizations target the real cost.

Usage:
  python scripts/profile_r07.py plans [suffix]   # write plans/r07/<q>_<suffix>.txt
  python scripts/profile_r07.py time [reps]      # per-query noop timing + job/stage counts
  python scripts/profile_r07.py time [reps] q1,q2  # subset
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

UI_PORT = 4099


def get_session():
    from dygiepp_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "profile_r07",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 2, 8),
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def rest(path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def capture_plans(suffix: str) -> None:
    from dygiepp_spark.registry import QUERIES

    spark = get_session()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(out_dir, exist_ok=True)
    for name in HEADLINE:
        df = QUERIES[name].build(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("FlatMapGroupsInPandas") + plan.count("MapInPandas")
        print(f"{name}: exchanges={n_ex} python_nodes={n_py} -> {path}")
    spark.stop()


def time_queries(reps: int, names: list[str]) -> None:
    from dygiepp_spark.registry import QUERIES
    from dygiepp_spark.plans import cache as _cache
    from dygiepp_spark.tables import read_turns

    spark = get_session()
    sc = spark.sparkContext
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    read_turns(spark, sf_dir=sf_dir).count()  # warm parquet footers
    QUERIES["span_enum_counts"].build(spark, sf_dir).count()  # codegen warm-up

    app_id = sc.applicationId
    results = {}
    for name in names:
        times = []
        jobs_seen = None
        for rep in range(reps):
            sc.setJobGroup(f"q:{name}:{rep}", name)
            t0 = time.perf_counter()
            with _cache.scoped():
                df = QUERIES[name].build(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            sc.setJobGroup(None, None)
        # pull job/stage metrics for the LAST rep via REST
        try:
            jobs = rest(f"applications/{app_id}/jobs")
            group = f"q:{name}:{reps-1}"
            mine = [j for j in jobs if j.get("jobGroup") == group]
            stage_ids = sorted({s for j in mine for s in j["stageIds"]})
            stages = []
            for sid in stage_ids:
                try:
                    for att in rest(f"applications/{app_id}/stages/{sid}"):
                        stages.append(
                            {
                                "stage": sid,
                                "name": att["name"].split("\n")[0][:60],
                                "tasks": att["numCompleteTasks"],
                                "ms": att.get("executorRunTime", 0),
                                "shuffle_read": att.get("shuffleReadBytes", 0),
                                "shuffle_write": att.get("shuffleWriteBytes", 0),
                                "input": att.get("inputBytes", 0),
                            }
                        )
                except Exception:
                    pass
            jobs_seen = {"n_jobs": len(mine), "n_stages": len(stage_ids), "stages": stages}
        except Exception as exc:  # noqa: BLE001
            jobs_seen = {"err": str(exc)}
        results[name] = {"times": times, "min": min(times), **(jobs_seen or {})}
        print(f"{name}: min={min(times)} times={times} jobs={jobs_seen.get('n_jobs')} stages={jobs_seen.get('n_stages')}")
    out_path = "/tmp/profile_r07.json"
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    if mode == "plans":
        capture_plans(sys.argv[2] if len(sys.argv) > 2 else "before")
    else:
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        names = sys.argv[3].split(",") if len(sys.argv) > 3 else HEADLINE
        time_queries(reps, names)
