"""DSIR importance resampling (operators/dsir.py): model fit, exact
integer weights, Gumbel-top-k determinism, and a brute-force NumPy-free
recomputation of the whole chain on a tiny corpus."""

from __future__ import annotations

import math

import pytest

from iscc_specs_spark.operators import dsir

B = 64


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


RAW = [
    (1, "the cat sat on the mat"),
    (2, "stock market prices fell sharply today"),
    (3, "the dog sat on the log"),
    (4, "buy cheap pills online now cheap pills"),
    (5, ""),
    (6, "quantum mechanics describes the behavior of matter"),
]
TARGET = [
    (101, "the cat sat quietly"),
    (102, "the dog and the cat sat together"),
]


def _py_bucket(feat: str, buckets: int) -> int:
    import hashlib

    return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % buckets


def _py_feats(text: str, buckets: int) -> dict[int, int]:
    toks = text.lower().strip().split()
    if not toks or toks == [""]:
        return {}
    feats: dict[int, int] = {}
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    for g in grams:
        j = _py_bucket(g, buckets)
        feats[j] = feats.get(j, 0) + 1
    return feats


def _py_model(raw, target, buckets):
    c_raw, c_tgt = [0] * buckets, [0] * buckets
    for _, t in raw:
        for j, c in _py_feats(t, buckets).items():
            c_raw[j] += c
    for _, t in target:
        for j, c in _py_feats(t, buckets).items():
            c_tgt[j] += c
    t_raw, t_tgt = sum(c_raw) + buckets, sum(c_tgt) + buckets
    return [
        int(
            math.floor(
                (
                    (math.log(c_tgt[j] + 1) - math.log(t_tgt))
                    - (math.log(c_raw[j] + 1) - math.log(t_raw))
                )
                * dsir.MICRO
                + 0.5
            )
        )
        for j in range(buckets)
    ]


@pytest.fixture(scope="module")
def model(spark):
    return dsir.dsir_model(
        spark, _df(spark, RAW), _df(spark, TARGET), buckets=B, hash_fn="md5"
    )


def test_model_matches_brute_force(spark, model):
    got = {r["j"]: r["llr_micro"] for r in model.collect()}
    want = _py_model(RAW, TARGET, B)
    assert len(got) == B
    for j in range(B):
        assert got[j] == want[j], f"bucket {j}"


def test_weights_exact_integers(spark, model):
    w = {
        r["doc_id"]: (r["n_grams"], r["logw_micro"])
        for r in dsir.importance_weights(
            _df(spark, RAW), model, buckets=B, hash_fn="md5"
        ).collect()
    }
    llr = _py_model(RAW, TARGET, B)
    assert set(w) == {d for d, _ in RAW}
    for doc_id, text in RAW:
        feats = _py_feats(text, B)
        want = sum(c * llr[j] for j, c in feats.items())
        assert w[doc_id] == (sum(feats.values()), want), doc_id


def test_empty_doc_zero_weight(spark, model):
    w = dict(
        (r["doc_id"], r["logw_micro"])
        for r in dsir.importance_weights(
            _df(spark, RAW), model, buckets=B, hash_fn="md5"
        ).collect()
    )
    assert w[5] == 0


def test_target_like_docs_rank_higher(spark, model):
    """Docs sharing the target's vocabulary ('the cat/dog sat') must
    outweigh the spam/off-domain docs."""
    w = {
        r["doc_id"]: r["logw_micro"]
        for r in dsir.importance_weights(
            _df(spark, RAW), model, buckets=B, hash_fn="md5"
        ).collect()
    }
    assert min(w[1], w[3]) > max(w[2], w[4]), w


def test_gumbel_topk_deterministic_and_k(spark, model):
    s1 = dsir.dsir_sample(
        _df(spark, RAW), model, k=3, buckets=B, hash_fn="md5"
    ).collect()
    # re-run on a different partitioning of the same input
    s2 = dsir.dsir_sample(
        _df(spark, RAW).repartition(7), model, k=3, buckets=B, hash_fn="md5"
    ).collect()
    assert len(s1) == 3
    assert sorted(r["doc_id"] for r in s1) == sorted(r["doc_id"] for r in s2)


def test_xxh64_production_track(spark):
    """Production hash: same contract (exact ints, determinism), different
    bucketing — weights need not match md5's, but the chain must run and
    re-running must reproduce itself."""
    m = dsir.dsir_model(
        spark, _df(spark, RAW), _df(spark, TARGET), buckets=B, hash_fn="xxh64"
    )
    w1 = sorted(
        (r["doc_id"], r["logw_micro"])
        for r in dsir.importance_weights(
            _df(spark, RAW), m, buckets=B, hash_fn="xxh64"
        ).collect()
    )
    w2 = sorted(
        (r["doc_id"], r["logw_micro"])
        for r in dsir.importance_weights(
            _df(spark, RAW).repartition(5), m, buckets=B, hash_fn="xxh64"
        ).collect()
    )
    assert w1 == w2 and len(w1) == len(RAW)
