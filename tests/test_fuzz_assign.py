"""Hypothesis differential fuzz of assign_cells' three physical
strategies (r8 verdict #5, contract narrowed per r8 VERDICT finding
#1): on the guaranteed-agreement domain (finite vectors, |v| < 1e150,
unique ids, winning margin ABOVE the direct formulation's rounding
error) literal, numpy and join must return ONE answer — including
NULL vectors, duplicate-distance ties (values drawn from a tiny grid
to force them), and duplicate centroids.  When the winning margin is
below a few ulps of the largest squared term, the direct Σ(x−c)²
forms (literal/join) legitimately see a tie the dot-trick (numpy)
still resolves — exact cross-strategy equality is mathematically
unsatisfiable there, so the test only requires every strategy's
answer to sit in the near-tied cell set.  The documented
strategy-DEPENDENT edges (NaN / ±Inf / overflow magnitudes / null
components — see the assign_cells docstring's edge-input contract)
are pinned by fixture tests instead.

Spark jobs per example are the cost ceiling: examples are capped and
deadlines disabled (same posture as test_properties.py)."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pydiverse_transform_spark.extras import similarity as sim

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)

DIM = 3

# a tiny value grid forces equal-distance ties constantly — the exact
# regime where a tie-contract bug (argmax vs array_min vs min-struct
# resolution order) would surface
grid_component = st.sampled_from([-1.0, -0.5, 0.0, 0.5, 1.0])
wide_component = st.floats(-1e6, 1e6, allow_nan=False,
                           allow_infinity=False)
vector = st.one_of(
    st.none(),
    st.lists(grid_component, min_size=DIM, max_size=DIM),
    st.lists(wide_component, min_size=DIM, max_size=DIM),
)
vectors_strategy = st.lists(vector, min_size=1, max_size=12)
centroids_strategy = st.lists(
    st.lists(grid_component, min_size=DIM, max_size=DIM),
    min_size=1, max_size=6,
)


def _assign(spark, rows, centroids, method):
    df = spark.createDataFrame(
        rows, f"vec_id int, embedding array<double>")
    kw = {"id_col": "vec_id"} if method == "join" else {}
    out = sim.assign_cells(df, centroids, method=method, **kw)
    return [(r["vec_id"], r["__cell"])
            for r in out.select("vec_id", "__cell")
            .orderBy("vec_id").collect()]


def _reference(rows, centroids):
    """Pure-Python argmin twin: ties to the lowest cid."""
    ref = []
    for vid, v in rows:
        if v is None:
            ref.append((vid, None))
            continue
        best, best_d = None, None
        for ci, c in enumerate(centroids):
            d = sum((x - y) ** 2 for x, y in zip(v, c))
            if best_d is None or d < best_d:
                best, best_d = ci, d
        ref.append((vid, best))
    return ref


def _near_tied_cells(v, centroids):
    """Cells whose true Σ(x−c)² distance is within the direct
    formulation's rounding error of the minimum.  Below that margin the
    strategies may legitimately disagree — the direct forms see a tie
    the numpy dot-trick still resolves (the more accurate formulation;
    see the assign_cells docstring) — so agreement can only be required
    when this set is a singleton."""
    import numpy as np

    dists = [math.fsum((x - y) ** 2 for x, y in zip(v, c))
             for c in centroids]
    peak = (max(abs(x) for x in v)
            + max(abs(y) for c in centroids for y in c)) ** 2
    tol = 4 * len(v) * np.spacing(max(peak, 1.0))
    dmin = min(dists)
    return {ci for ci, d in enumerate(dists) if d <= dmin + tol}


@given(vectors=vectors_strategy, centroids=centroids_strategy)
@settings(**SETTINGS)
def test_three_strategies_one_answer(spark, vectors, centroids):
    rows = [(i, v) for i, v in enumerate(vectors)]
    lit = _assign(spark, rows, centroids, "literal")
    npy = _assign(spark, rows, centroids, "numpy")
    jn = _assign(spark, rows, centroids, "join")
    for (vid, v), (_, cl), (_, cn), (_, cj) in zip(rows, lit, npy, jn):
        if v is None:
            assert cl is None and cn is None and cj is None, vid
            continue
        near = _near_tied_cells(v, centroids)
        if len(near) == 1:
            want = next(iter(near))
            assert cl == cn == cj == want, (vid, cl, cn, cj, near)
        else:
            # sub-ulp margin (or an exact tie): every strategy must
            # still land on a near-tied cell, but they may differ
            assert cl in near and cn in near and cj in near, \
                (vid, cl, cn, cj, near)
    # grid-valued inputs are exact in binary64, so ALL strategies must
    # match the pure-Python twin exactly (ties to the lowest cid)
    if all(v is None or all(abs(x) in (0.0, 0.5, 1.0) for x in v)
           for v in vectors):
        ref = _reference(rows, centroids)
        assert lit == npy == jn == ref


@given(vectors=st.lists(st.lists(grid_component, min_size=DIM,
                                 max_size=DIM),
                        min_size=1, max_size=8),
       n_dup=st.integers(2, 4))
@settings(**SETTINGS)
def test_duplicate_centroids_tie_to_lowest(spark, vectors, n_dup):
    # every centroid duplicated n_dup times: ALL winning distances are
    # exact ties across the duplicate group -> the lowest copy wins
    base = [[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]
    centroids = [c for c in base for _ in range(n_dup)]
    rows = [(i, v) for i, v in enumerate(vectors)]
    for method, kw in (("literal", {}), ("numpy", {}),
                       ("join", {"id_col": "vec_id"})):
        got = _assign(spark, rows, centroids, method)
        assert all(c % n_dup == 0 for _, c in got), (method, got)


# ---------------------------------------------------------------------------
# pinned fixtures for the documented strategy-dependent edges
# ---------------------------------------------------------------------------

def _all(spark, rows, centroids):
    return {m: _assign(spark, rows, centroids, m)
            for m in ("literal", "numpy", "join")}


def test_nan_component_assigns_lowest_cid_everywhere(spark):
    nan = float("nan")
    rows = [(1, [nan, 0.0, 0.0]), (2, [0.0, nan, nan])]
    got = _all(spark, rows, [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    for m, res in got.items():
        assert res == [(1, 0), (2, 0)], m


def test_dim_mismatch_and_empty_are_null_everywhere(spark):
    rows = [(1, [1.0, 0.0]), (2, []), (3, [1.0, 0.0, 0.0, 0.0]),
            (4, [0.9, 0.1, 0.0])]
    got = _all(spark, rows, [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    for m, res in got.items():
        assert res == [(1, None), (2, None), (3, None), (4, 0)], m


def test_null_component_contract(spark):
    # literal/join null-propagate; numpy sees Arrow-converted NaN and
    # follows the NaN contract (documented divergence)
    rows = [(1, [None, 0.0, 0.0])]
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    got = _all(spark, rows, cents)
    assert got["literal"] == [(1, None)]
    assert got["join"] == [(1, None)]
    assert got["numpy"] == [(1, 0)]


def test_infinity_is_strategy_dependent_as_documented(spark):
    # literal/join: ||x-c||^2 = +Inf for every centroid -> lowest cid;
    # numpy: x.c keeps the sign of the infinity -> resolves by
    # direction (here: towards centroid 1)
    inf = float("inf")
    rows = [(1, [inf, 0.0, 0.0])]
    cents = [[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]]
    got = _all(spark, rows, cents)
    assert got["literal"] == [(1, 0)]
    assert got["join"] == [(1, 0)]
    assert got["numpy"] == [(1, 1)]


def test_overflow_magnitude_is_strategy_dependent_as_documented(spark):
    # |v| ~ 1e200: the squared distance overflows to +Inf (literal/join
    # collapse to the lowest cid) while the dot product stays finite
    # (numpy picks the genuinely nearer centroid 1)
    rows = [(1, [1e200, 0.0, 0.0])]
    cents = [[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0]]
    got = _all(spark, rows, cents)
    assert got["literal"] == [(1, 0)]
    assert got["join"] == [(1, 0)]
    assert got["numpy"] == [(1, 1)]
