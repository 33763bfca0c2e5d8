"""Connected-components correctness vs a local union-find oracle."""

from __future__ import annotations

import numpy as np

from iscc_specs_spark.operators.cluster import assign_clusters, connected_components


def _uf_oracle(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # representative = min node id in component
    comp = {}
    for x in range(n_nodes):
        comp.setdefault(find(x), []).append(x)
    return {x: min(members) for root, members in comp.items() for x in members}


def _run(spark, n_nodes, edges):
    names = [f"n{idx:05d}" for idx in range(n_nodes)]
    pairs = spark.createDataFrame(
        [(names[a], names[b]) for a, b in edges], ["url_a", "url_b"]
    )
    urls = spark.createDataFrame([(u,) for u in names], ["url"])
    got = {
        r["url"]: r["cluster_id"]
        for r in assign_clusters(urls, pairs).collect()
    }
    want = _uf_oracle(n_nodes, edges)
    for idx in range(n_nodes):
        assert got[names[idx]] == names[want[idx]], f"node {idx}"


def test_cc_path_graph(spark):
    # worst case for naive label propagation; log-round for star algorithm
    _run(spark, 60, [(i, i + 1) for i in range(59)])


def test_cc_star_and_random(spark):
    rng = np.random.default_rng(11)
    edges = [(0, i) for i in range(1, 30)]  # hot hub
    edges += [(int(a), int(b)) for a, b in rng.integers(30, 200, size=(120, 2)) if a != b]
    _run(spark, 200, edges)


def test_cc_two_components_and_singletons(spark):
    _run(spark, 20, [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10)])
