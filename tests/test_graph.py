"""Connected components (operators/graph.py — alternating large-star /
small-star, Kiveris et al. SoCC'14) vs a pure-python union-find on
adversarial and random graphs, plus the near_dup_clusters query shape."""

import random

import pandas as pd
import pytest

from abwcf_spark.operators.graph import connected_components


def _spark_components(spark, edges):
    pdf = pd.DataFrame(edges, columns=["a", "b"])
    out = connected_components(spark.createDataFrame(pdf), a="a", b="b")
    return {int(r.node): int(r.component) for r in out.collect()}


def _expected(edges):
    nodes = sorted({x for e in edges for x in e})
    idx = {x: i for i, x in enumerate(nodes)}
    parent = list(range(len(nodes)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(idx[a]), find(idx[b])
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    # component label = min ORIGINAL id in the component
    groups: dict[int, list[int]] = {}
    for x in nodes:
        groups.setdefault(find(idx[x]), []).append(x)
    label = {}
    for members in groups.values():
        m = min(members)
        for x in members:
            label[x] = m
    return label


@pytest.mark.parametrize("edges", [
    [(1, 2)],                                     # single pair
    [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)],     # long chain
    [(10, 1), (10, 2), (10, 3), (10, 4)],         # star centered high
    [(1, 2), (2, 3), (3, 1)],                     # triangle
    [(1, 2), (3, 4), (5, 6), (6, 7), (2, 7)],     # merge across groups
    [(5, 5), (1, 2), (2, 1)],                     # self-loop + dup both ways
    [(100, 1), (2, 99), (99, 100)],               # descending chain ids
])
def test_cc_small_graphs(spark, edges):
    assert _spark_components(spark, edges) == _expected(edges)


def test_cc_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    for trial in range(4):
        n = rng.randint(10, 60)
        m = rng.randint(5, 90)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        if not edges:
            continue
        assert _spark_components(spark, edges) == _expected(edges), (
            f"trial {trial}: {edges}"
        )


def test_cc_long_path_converges_logarithmically(spark):
    """A 64-node path is the adversarial diameter case — the alternating
    algorithm must still converge (O(log n) iterations, far below the
    max_iter guard) and label every node with the path minimum."""
    edges = [(i, i + 1) for i in range(63)]
    got = _spark_components(spark, edges)
    assert got == {i: 0 for i in range(64)}


def test_near_dup_clusters_matches_fixture(spark):
    """The gate entry's semantics end-to-end at sf0.01: every document
    labeled, representatives are component minima, sizes consistent."""
    from abwcf_spark.oracle_fixtures import build_near_dup_clusters
    from abwcf_spark.queries import near_dup_clusters

    got = (
        near_dup_clusters(spark, "/root/testdata/sf0.01")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    exp = (
        build_near_dup_clusters()
        .sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype(exp.dtypes.to_dict()), exp
    )
