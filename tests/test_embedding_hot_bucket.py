"""Skew-path regression for embedding_neardup_lsh: a template farm of k
near-identical embeddings lands in the same (t, h) bucket in every table;
with a bucket_cap the farm must flow hub-and-spoke (O(k) edges) while
(a) staying one connected component and (b) leaving cold-bucket pairs
bit-identical to the uncapped run. Mirrors tests/test_lsh_hot_bucket.py
for the ISCC track (operators/lsh.py:192-246)."""

from __future__ import annotations

import math

import pytest

from iscc_specs_spark.operators import dedup_variants as D

DIM = 16
FARM = 30          # farm size — every farm bucket exceeds CAP
CAP = 8
THRESHOLD = 0.9


def _vec(seed: int, scale: float = 1.0) -> list[float]:
    # deterministic pseudo-random unit-ish vector (no random() — invariant)
    return [
        scale * math.sin(0.7 * seed + 1.3 * j + 0.1) for j in range(DIM)
    ]


@pytest.fixture(scope="module")
def emb(spark):
    rows = []
    base = _vec(999)
    for i in range(FARM):  # template farm: base + tiny per-doc nudge
        v = list(base)
        v[i % DIM] += 1e-4 * (i + 1)
        rows.append((i, v))
    rows.append((100, _vec(5)))            # near-dup pair in a cold bucket
    v2 = [x + 1e-3 for x in _vec(5)]
    rows.append((101, v2))
    for i in range(102, 120):              # background singletons
        rows.append((i, _vec(i)))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).localCheckpoint(eager=True)


def _pairs(df):
    return {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in df.select("vec_a", "vec_b", "cosine").collect()
    }


def _components(pairs, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_farm_bucket_exceeds_cap(emb):
    # the fixture must actually trigger the hot path: FARM near-identical
    # vectors share a sign pattern in every table, FARM > CAP
    assert FARM > CAP


def test_capped_farm_stays_connected(emb):
    got = D.embedding_neardup_lsh(
        emb, threshold=THRESHOLD, nbits=4, ntables=8, dim=DIM, bucket_cap=CAP
    )
    pairs = _pairs(got)
    nodes = set(range(FARM)) | {100, 101}
    scoped = {p for p in pairs if p[0] in nodes and p[1] in nodes}
    comp = _components(scoped, nodes)
    farm_roots = {comp[i] for i in range(FARM)}
    assert farm_roots == {0}, "hub-and-spoke must keep the farm connected"
    assert (100, 101) in pairs, "cold-bucket near-dup must survive the cap"


def test_capped_edge_count_is_linear(emb):
    capped = D.embedding_neardup_lsh(
        emb, threshold=THRESHOLD, nbits=4, ntables=8, dim=DIM, bucket_cap=CAP
    )
    farm_edges = [
        p for p in _pairs(capped) if p[0] < FARM and p[1] < FARM
    ]
    # hub-and-spoke: ≤ FARM-1 farm edges (one hub per bucket, same hub in
    # every table here since min vec_id wins), never the C(FARM,2) clique
    assert len(farm_edges) <= FARM - 1


def test_cold_pairs_identical_to_uncapped(emb):
    capped = _pairs(D.embedding_neardup_lsh(
        emb, threshold=THRESHOLD, nbits=4, ntables=8, dim=DIM, bucket_cap=CAP
    ))
    uncapped = _pairs(D.embedding_neardup_lsh(
        emb, threshold=THRESHOLD, nbits=4, ntables=8, dim=DIM,
        bucket_cap=1 << 30,
    ))
    cold_capped = {p: c for p, c in capped.items() if p[0] >= FARM}
    cold_uncapped = {p: c for p, c in uncapped.items() if p[0] >= FARM}
    assert cold_capped == cold_uncapped
