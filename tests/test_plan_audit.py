"""Plan-shape regression gate over the headline bench queries (r10,
VERDICT r9 next #5): the per-round PLAN_AUDIT artifact counts the
physical-plan metrics that matter at 100 TB, but a human had to diff
two rounds to notice a regression.  This test pins per-query CEILINGS
from the NEWEST COMMITTED artifact (PLAN_AUDIT_r{N}.json, sf0.01, AQE
final plans) — r11 change: the baseline is READ from the artifact
instead of hand-copied, so the committed evidence and the test gate
cannot drift (VERDICT r10 wrong #3 / next #5).  A new shuffle, a lost
broadcast (SMJ appearing), a lost filter pushdown, a stray cartesian
product or ANY Python stage fails the suite at the commit that
introduced it.

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
the committed artifact via tools/plan_audit.py (the baseline follows
it automatically) or, when the artifact cannot be regenerated mid-
round, add a RATIFIED override below with a comment — either way the
change is visible in review, which is the point.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from plan_audit import audit_plan, final_plan  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

GATED = ("n_exchange", "n_smj", "n_nested_loop", "n_pushed")

# deliberate plan changes made AFTER the newest committed artifact —
# each entry overrides that query's artifact row and must say why.
# Emptied each round when the new PLAN_AUDIT artifact lands.
RATIFIED: dict[str, dict[str, int]] = {}


def _latest_artifact() -> tuple[str, dict]:
    paths = glob.glob(os.path.join(REPO, "PLAN_AUDIT_r*.json"))
    assert paths, "no committed PLAN_AUDIT_r*.json artifact found"
    latest = max(paths, key=lambda p: int(
        re.search(r"PLAN_AUDIT_r(\d+)\.json$", p).group(1)))
    with open(latest) as f:
        return os.path.basename(latest), json.load(f)


_ARTIFACT_NAME, _ARTIFACT = _latest_artifact()

# ceilings come straight from the newest committed audit artifact
# (sf0.01, AQE on, final plans), so artifact and gate cannot drift
BASELINE = {
    q: {**{k: m[k] for k in GATED}, **RATIFIED.get(q, {})}
    for q, m in _ARTIFACT["queries"].items()
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
        f"bench queries without a plan-audit baseline: {missing} — "
        f"regenerate the committed artifact (tools/plan_audit.py; "
        f"gate currently reads {_ARTIFACT_NAME}) or add a RATIFIED "
        f"override")


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
