"""Plan-shape regression gate over the headline bench queries (r10,
VERDICT r9 next #5): the per-round PLAN_AUDIT artifact counts the
physical-plan metrics that matter at 100 TB, but a human had to diff
two rounds to notice a regression.  This test pins per-query CEILINGS
from the r9 audit (PLAN_AUDIT_r09.json, sf0.01, AQE final plans) so a
new shuffle, a lost broadcast (SMJ appearing), a lost filter pushdown,
a stray cartesian product or ANY Python stage fails the suite at the
commit that introduced it.

Ceiling semantics per query:
- n_python     <= PY_CEILING (0 for every query except the single
                 deliberate Arrow island: q_semantic_decontaminate's
                 flat-plan numpy cell-assignment kernel, routed there
                 in r9 because the literal-path codegen alias lets
                 Catalyst push a cross-side predicate — see
                 similarity.semantic_contaminated_ids.  One
                 MapInPandas, batch-vectorized, never row-at-a-time)
- n_nested_loop <= baseline (non-zero only for the three whitelisted
                 1-row/k-row scalar-subplan broadcast crosses)
- n_smj        <= baseline (0 everywhere: every bench join broadcasts)
- n_exchange   <= baseline (a NEW shuffle is a regression; fewer is
                 fine and should be ratified by regenerating the
                 baseline in the round artifact)
- n_pushed     >= baseline (losing a pushed filter un-prunes a scan)

When a plan legitimately changes (new strategy, new query), regenerate
the committed artifact via tools/plan_audit.py and update BASELINE
here — the update is then visible in review, which is the point.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from plan_audit import audit_plan, final_plan  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

# ceilings from PLAN_AUDIT_r09.json (sf0.01, AQE on, final plans)
BASELINE = {
    "q01_pricing_summary": {"n_exchange": 2, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 1},
    "q03_shipping_priority": {"n_exchange": 1, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 3},
    "q05_local_supplier": {"n_exchange": 2, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 6},
    "q06_forecast_revenue": {"n_exchange": 1, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 1},
    "q08_market_share": {"n_exchange": 2, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 8},
    "q09_product_profit": {"n_exchange": 2, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 5},
    "q13_customer_distribution": {"n_exchange": 3, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 1},
    "q18_large_volume": {"n_exchange": 1, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 4},
    "q21_waiting_supplier": {"n_exchange": 2, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 4},
    "q_agg_in_mutate": {"n_exchange": 1, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 0},
    "q_asof_join": {"n_exchange": 1, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 2},
    "q_cosine_topk": {"n_exchange": 1, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 0},
    "q_dedup_minhash": {"n_exchange": 2, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 0},
    "q_doc_stats": {"n_exchange": 1, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 0},
    "q_dsir_sample": {"n_exchange": 0, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 0},
    "q_interval_join": {"n_exchange": 0, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 2},
    "q_kmeans_step": {"n_exchange": 5, "n_smj": 0, "n_nested_loop": 1, "n_pushed": 0},
    "q_lm_perplexity": {"n_exchange": 5, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 0},
    "q_minhash_index_lookup": {"n_exchange": 1, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 1},
    "q_nb_classifier": {"n_exchange": 4, "n_smj": 0, "n_nested_loop": 1, "n_pushed": 2},
    "q_neardup_corpus": {"n_exchange": 3, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 0},
    "q_packed_batches": {"n_exchange": 2, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 0},
    "q_pq_topk": {"n_exchange": 1, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 0},
    "q_pretrain_pipeline": {"n_exchange": 4, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 0},
    "q_pretrain_pipeline_scored": {"n_exchange": 4, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 0},
    # ratified r10: the r9 cross-side-predicate fix (49afbe7 area)
    # collects the capped benchmark side to the driver (one scan fewer,
    # its pushed filter with it) and routes assignment through the
    # Arrow numpy kernel (the PY_CEILING island below)
    "q_semantic_decontaminate": {"n_exchange": 3, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 2},
    "q_semdedup": {"n_exchange": 3, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 0},
    "q_semdedup_kprop": {"n_exchange": 3, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 0},
    "q_sessionize": {"n_exchange": 2, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 0},
    "q_substring_dedup": {"n_exchange": 3, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 0},
    "q_temperature_mix": {"n_exchange": 3, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 1},
    "q_tfidf_topk": {"n_exchange": 7, "n_smj": 0, "n_nested_loop": 1, "n_pushed": 1},
    "q_tumbling_agg": {"n_exchange": 1, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 0},
    "q_window_ops": {"n_exchange": 1, "n_smj": 0, "n_nested_loop": 0, "n_pushed": 0},
}


def _bench_queries():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import BENCH_QUERIES

    return BENCH_QUERIES


def test_every_bench_query_has_a_baseline():
    """A new bench query must ship with its plan ceiling — otherwise
    the gate silently stops covering the headline set."""
    missing = [q for q in _bench_queries() if q not in BASELINE]
    assert not missing, (
        f"bench queries without a plan-audit baseline: {missing} — run "
        "tools/plan_audit.py and add their ceilings to BASELINE")


@pytest.fixture(scope="module")
def audited(spark):
    """One execution per bench query, final adaptive plans audited."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out = {}
    for name in _bench_queries():
        if name not in BASELINE:
            continue
        df = qs[name](spark, SF_DIR)
        df.collect()
        out[name] = audit_plan(final_plan(df))
    return out


# the single deliberate Arrow island in the bench set (see module doc)
PY_CEILING = {"q_semantic_decontaminate": 1}


def test_no_python_stages(audited):
    bad = {q: m["n_python"] for q, m in audited.items()
           if m["n_python"] > PY_CEILING.get(q, 0)}
    assert not bad, (
        f"Python stages beyond the Arrow-island whitelist appeared in "
        f"bench plans: {bad}")


def test_nested_loop_only_whitelisted(audited):
    bad = {q: m["n_nested_loop"] for q, m in audited.items()
           if m["n_nested_loop"] > BASELINE[q]["n_nested_loop"]}
    assert not bad, (
        f"nested-loop/cartesian joins beyond the scalar-subplan "
        f"whitelist: {bad}")


def test_no_new_shuffles(audited):
    bad = {q: (m["n_exchange"], BASELINE[q]["n_exchange"])
           for q, m in audited.items()
           if m["n_exchange"] > BASELINE[q]["n_exchange"]}
    assert not bad, f"new shuffles (got, ceiling): {bad}"


def test_no_lost_broadcasts(audited):
    bad = {q: (m["n_smj"], BASELINE[q]["n_smj"])
           for q, m in audited.items()
           if m["n_smj"] > BASELINE[q]["n_smj"]}
    assert not bad, f"SortMergeJoin appeared (lost broadcast): {bad}"


def test_no_lost_pushdowns(audited):
    bad = {q: (m["n_pushed"], BASELINE[q]["n_pushed"])
           for q, m in audited.items()
           if m["n_pushed"] < BASELINE[q]["n_pushed"]}
    assert not bad, f"pushed-filter scans lost (got, floor): {bad}"
