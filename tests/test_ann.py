from __future__ import annotations

import numpy as np
import pytest

from iscc_specs_spark.operators import ann


@pytest.fixture(scope="module")
def emb(spark):
    # clustered vectors (20 centers, small noise): realistic near-dup shape
    rng = np.random.RandomState(3)
    centers = rng.randn(20, 16)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.vstack(
        [c + 0.15 * rng.randn(6, 16) for c in centers]
    ).astype("float32")
    rows = [(i, v.tolist(), int(i // 6)) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    return df, vecs


def _numpy_topk(vecs, qids, k):
    out = {}
    v = vecs.astype("float64")
    norms = np.linalg.norm(v, axis=1)
    for q in qids:
        cos = (v @ v[q]) / (norms * norms[q])
        cos = np.round(cos, 6)
        order = sorted(
            (i for i in range(len(v)) if i != q),
            key=lambda i: (-cos[i], i),
        )
        out[q] = [(i, cos[i]) for i in order[:k]]
    return out


def test_brute_force_topk_matches_numpy(emb):
    df, vecs = emb
    qids = [0, 1, 2]
    res = ann.brute_force_topk(
        df, df.where(df.vec_id.isin(qids)), k=5
    ).collect()
    want = _numpy_topk(vecs, qids, 5)
    got = {}
    for r in res:
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cosine"])
        )
    for q in qids:
        ranked = [x[1:] for x in sorted(got[q])]
        assert [n for n, _ in ranked] == [n for n, _ in want[q]]
        for (_, c_got), (_, c_want) in zip(ranked, want[q]):
            assert c_got == pytest.approx(c_want, abs=1e-6)


def test_rhp_lsh_recall(emb):
    df, vecs = emb
    qids = [0, 1, 2, 3, 4]
    qdf = df.where(df.vec_id.isin(qids))
    exact = ann.brute_force_topk(df, qdf, k=5).collect()
    approx = ann.rhp_lsh_topk(
        df, qdf, k=5, nbits=8, ntables=8, multiprobe_bits=1, dim=16
    ).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact}
    got = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.8  # multi-table LSH on clustered vectors


def test_rhp_signature_deterministic(emb):
    df, _ = emb
    a = ann.rhp_lsh_topk(df, df.where(df.vec_id < 2), k=3, dim=16).collect()
    b = ann.rhp_lsh_topk(df, df.where(df.vec_id < 2), k=3, dim=16).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_rhp_lsh_requires_dim(emb):
    df, _ = emb
    with pytest.raises(ValueError, match="dim"):
        ann.rhp_lsh_topk(df, df.where(df.vec_id < 2), k=3)
