"""Plan-shape audit of the headline bench queries: execute each one at
sf0.01 (noop sink, AQE on — so the recorded plan is the FINAL adaptive
plan, broadcast conversions included) and record the physical-plan
metrics that matter at 100 TB:

- n_exchange            shuffles (minus AQE ReusedExchange)
- n_broadcast_join      BroadcastHashJoin operators
- n_smj                 SortMergeJoin operators
- n_nested_loop         BroadcastNestedLoopJoin / CartesianProduct (FLAG:
                        a cross product in a headline query is a bug
                        unless the query is an intentional cross join)
- n_scan / n_pushed     FileScans, and how many carry PushedFilters
- n_codegen             WholeStageCodegen spans
- n_python              Arrow/Pandas evaluation operators (mapInPandas
                        etc.) — the deliberate Python islands
- n_sort                Sort operators

Usage: python tools/plan_audit.py [OUT.json] [sf_dir]

The artifact is committed per round (PLAN_AUDIT_r0N.json); diffing two
rounds shows plan regressions (a new shuffle, a lost broadcast, a lost
pushdown) even when wall-clock noise hides them.

Limitation: multi-job queries that materialize intermediates (the
connected-components checkpoint, persisted celled corpora, index
writes) are audited on their FINAL query fragment only — the earlier
jobs' plans are pinned separately by the plan-assertion tests
(test_plans / test_extras_plans).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")

# nested-loop joins that are the QUERY'S POINT, not a planning accident:
# a deliberate broadcast cross of a model/centroid table whose size is a
# small constant (k rows or 1 row), never data-proportional
INTENTIONAL_NESTED_LOOP = {
    "q_kmeans_step": "8-row centroid table broadcast-crossed for the "
                     "oracle-checkable Lloyd assignment",
    "q_tfidf_topk": "1-row corpus-size scalar broadcast",
    "q_nb_classifier": "1-row class-prior scalar broadcast",
}


def audit_plan(plan: str) -> dict:
    # AQE's executedPlan string appends the pre-adaptive plan under an
    # "== Initial Plan ==" banner — cut it off or every operator counts
    # twice
    plan = plan.split("== Initial Plan ==")[0]

    def n(pat):
        return len(re.findall(pat, plan))

    reused = n(r"ReusedExchange")
    return {
        "n_exchange": n(r"\bExchange\b") - reused,
        "n_reused_exchange": reused,
        "n_broadcast_join": n(r"BroadcastHashJoin"),
        "n_smj": n(r"SortMergeJoin"),
        "n_nested_loop": n(r"BroadcastNestedLoopJoin|CartesianProduct"),
        "n_scan": n(r"FileScan|Scan parquet"),
        "n_pushed": n(r"PushedFilters: \[[^\]]"),
        # simple plan strings mark whole-stage-codegen spans as "*(n)"
        "n_codegen": len({m for m in re.findall(r"\*\((\d+)\)", plan)}),
        "n_python": n(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"),
        "n_sort": n(r"\bSort\b"),
    }


def final_plan(df) -> str:
    qe = df._jdf.queryExecution()
    try:
        # after execution, AdaptiveSparkPlan prints isFinalPlan=true
        # with the runtime-replanned operators
        return qe.executedPlan().toString()
    except Exception:
        return qe.toString()


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from bench import BENCH_QUERIES

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("plan-audit")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    result = {}
    flags = []
    for name in BENCH_QUERIES:
        df = qs[name](spark, sf_dir)
        # collect() drives THIS DataFrame's own QueryExecution, so the
        # AdaptiveSparkPlan we stringify afterwards is the final
        # runtime-replanned one (a noop write would execute a separate
        # QueryExecution and leave this one pre-adaptive)
        df.collect()
        m = audit_plan(final_plan(df))
        result[name] = m
        if m["n_nested_loop"] and name not in INTENTIONAL_NESTED_LOOP:
            flags.append(f"{name}: {m['n_nested_loop']} nested-loop/"
                         "cartesian join(s)")
        if m["n_scan"] and not m["n_pushed"] and name.startswith("q0"):
            flags.append(f"{name}: no PushedFilters on any scan")
        print(name, json.dumps(m))
    spark.stop()

    out = {"sf_dir": sf_dir, "queries": result, "flags": flags,
           "intentional_nested_loop": INTENTIONAL_NESTED_LOOP}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", out_path)
    print(json.dumps({"n_queries": len(result), "flags": flags}))


if __name__ == "__main__":
    main()
