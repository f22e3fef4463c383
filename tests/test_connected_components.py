"""connected_components must label every node with its component's
minimum id — chains (worst-case diameter), separate components, and the
end-to-end neardup_dedup canonical-keep behavior."""

import pytest
from pyspark.sql import functions as F

from pydiverse_transform_spark.extras.dedup import (
    connected_components,
    neardup_dedup,
)


def _cc(spark, edges):
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(pairs)
    return {r.node: r.comp for r in out.collect()}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11), (12, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_chain_diameter(spark):
    # a 9-hop chain exercises multi-round propagation
    got = _cc(spark, [(i, i + 1) for i in range(1, 10)])
    assert got == {i: 1 for i in range(1, 11)}


def test_reversed_ids(spark):
    # min id appears on the right side of the pair
    got = _cc(spark, [(5, 4), (4, 3), (9, 8)])
    assert got == {3: 3, 4: 3, 5: 3, 8: 8, 9: 8}


def test_neardup_dedup_keeps_canonical(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again"),
            (2, "the quick brown fox jumps over the lazy dog again!"),
            (3, "completely different text about spark physical plans"),
        ],
        "doc_id long, text string",
    )
    kept = neardup_dedup(docs, "text", "doc_id", k=3, threshold=0.3)
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert 3 in ids and 1 in ids and 2 not in ids


def test_star_matches_hashmin_on_random_graphs(spark):
    """large-star/small-star and hash-min must produce identical
    (node, comp) labelings on random sparse graphs."""
    import random

    from pydiverse_transform_spark.extras.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    for trial in range(3):
        edges = [(rng.randint(0, 60), rng.randint(0, 60))
                 for _ in range(40)]
        edges = [(u, v) for u, v in edges if u != v]
        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        hm = {(r.node, r.comp)
              for r in connected_components(pairs).collect()}
        st = {(r.node, r.comp)
              for r in connected_components_star(pairs).collect()}
        assert hm == st, (trial, hm ^ st)


def test_star_chain_rounds_independent_of_diameter(spark):
    """A 4096-node chain (diameter 4095) must converge in O(log^2 n)
    star rounds — hash-min would need ~4095 rounds.  Also proves the
    labeling: every node joins component 0."""
    from pydiverse_transform_spark.extras.dedup import (
        connected_components_star,
    )

    n = 4096
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"])
    rounds = []
    cc = connected_components_star(pairs, _rounds_out=rounds)
    comps = {r.comp for r in cc.collect()}
    assert comps == {0}
    assert cc.count() == n
    assert rounds[0] <= 15, rounds


def test_pointer_jumping_log_rounds_on_chain(spark):
    """r6: hash-min with pointer jumping must converge in O(log d)
    rounds — a 32-hop chain needs <= 7, where 1-hop propagation
    needed ~32."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 33)], "id_a long, id_b long")
    rounds = []
    out = connected_components(pairs, strategy="distributed",
                               _rounds_out=rounds)
    got = {r.node: r.comp for r in out.collect()}
    assert got == {i: 1 for i in range(1, 34)}
    assert rounds[0] <= 7, rounds


def test_driver_and_distributed_strategies_agree(spark):
    """r6: the auto/driver union-find path and the distributed
    pointer-jumping loop must label identically on random graphs."""
    import random

    rng = random.Random(99)
    for trial in range(3):
        n = rng.randint(5, 40)
        edges = [(rng.randint(1, n), rng.randint(1, n))
                 for _ in range(rng.randint(3, 60))]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        drv = {(r.node, r.comp) for r in
               connected_components(pairs, strategy="driver").collect()}
        dist = {(r.node, r.comp) for r in
                connected_components(pairs, strategy="distributed")
                .collect()}
        assert drv == dist, (trial, sorted(drv ^ dist))


def test_auto_switches_to_distributed_over_cap(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 20)], "id_a long, id_b long")
    rounds = []
    out = connected_components(pairs, driver_max_pairs=5,
                               _rounds_out=rounds)
    got = {r.node: r.comp for r in out.collect()}
    assert got == {i: 1 for i in range(1, 21)}
    assert rounds[0] > 0  # the distributed loop ran
    import pytest as _pytest
    with _pytest.raises(ValueError, match="driver_max_pairs"):
        connected_components(pairs, strategy="driver",
                             driver_max_pairs=5)
