from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iscc_specs_spark.operators.sampling import sample_report, stratified_sample


@pytest.fixture(scope="module")
def corpus(spark):
    langs = ["en", "de", "fr", "es"]
    rows = [(i, f"text {i}", langs[i % 4]) for i in range(2000)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).localCheckpoint(eager=True)


def test_sample_deterministic_and_partition_invariant(corpus, spark):
    fr = {"en": 0.5, "de": 0.25}
    a = {r["doc_id"] for r in stratified_sample(corpus, fr).collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(corpus.repartition(17), fr).collect()
    }
    assert a == b and a  # layout-independent, non-empty


def test_sample_rates_and_default_fraction(corpus):
    fr = {"en": 0.5, "de": 0.25}
    out = stratified_sample(corpus, fr, default_fraction=0.0)
    rep = {
        r["lang"]: r
        for r in sample_report(corpus, out).collect()
    }
    # 500 docs per lang; hash-threshold rate concentrates near the target
    assert abs(rep["en"]["rate"] - 0.5) < 0.08
    assert abs(rep["de"]["rate"] - 0.25) < 0.08
    assert rep["fr"]["n_sampled"] == 0 and rep["es"]["n_sampled"] == 0
    assert rep["en"]["n_in"] == 500


def test_samples_are_nested_across_fractions(corpus):
    """f1 < f2 ⇒ sample(f1) ⊆ sample(f2) — the scaling-ladder property."""
    small = {
        r["doc_id"]
        for r in stratified_sample(corpus, {"en": 0.2}).collect()
    }
    big = {
        r["doc_id"]
        for r in stratified_sample(corpus, {"en": 0.6}).collect()
    }
    assert small < big


def test_sample_plan_is_shuffle_free(corpus):
    out = stratified_sample(corpus, {"en": 0.5, "de": 0.25})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # executedPlan renders whole-stage-codegen spans as "*(n)" prefixes
    assert "*(1)" in plan, plan


def test_sample_md5_bucket_matches_duckdb(corpus, spark):
    """The md5 bucket must be byte-identical to the oracle expression
    (('0x'||substr(md5(doc_id::VARCHAR),1,8))::UBIGINT % denom)."""
    import duckdb

    got = {
        r["doc_id"]: r["sample_bucket"]
        for r in stratified_sample(
            corpus.limit(64), {"en": 1.0, "de": 1.0, "fr": 1.0, "es": 1.0},
            hash_fn="md5",
        ).collect()
    }
    con = duckdb.connect()
    for doc_id, bucket in got.items():
        want = con.execute(
            "SELECT ('0x' || substr(md5($1::BIGINT::VARCHAR), 1, 8))"
            "::UBIGINT % 1000000",
            [doc_id],
        ).fetchone()[0]
        assert bucket == want, doc_id


def test_sample_validates_fractions(corpus):
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(corpus, {"en": 1.5})
    with pytest.raises(ValueError, match="default_fraction"):
        stratified_sample(corpus, {"en": 0.5}, default_fraction=-0.1)
    with pytest.raises(ValueError, match="hash_fn"):
        stratified_sample(corpus, {"en": 0.5}, hash_fn="sha1")
