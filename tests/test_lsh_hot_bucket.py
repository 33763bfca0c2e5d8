"""Skew-path regression: the broadcast-routed hot-bucket branch of
verified_bucket_pairs must agree with the legacy candidate_pairs +
verify_pairs route, and capping must not change cluster assignments on a
template-farm fixture (hub-and-spoke preserves connectivity; every hub
edge between near-identical farm members survives verification)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iscc_specs_spark.operators import lsh
from iscc_specs_spark.operators.cluster import assign_clusters
from iscc_specs_spark.operators.codegen import compute_codes
from iscc_specs_spark.sources.pages import generate_pages

N_DOCS = 1200  # ~12 farm docs (doc_id % 101 == 100) land in one hot bucket
CAP = 4


@pytest.fixture(scope="module")
def codes(spark):
    pages = generate_pages(spark, N_DOCS, partitions=8)
    return compute_codes(pages, ("text", "data")).localCheckpoint(eager=True)


def _pair_set(df):
    return {(r["url_a"], r["url_b"]) for r in df.select("url_a", "url_b").collect()}


def test_hot_path_is_exercised(codes):
    slim = lsh.rep_codes(codes)
    bands = lsh.minhash_bands(slim).union(lsh.simhash_bands(slim))
    max_bucket = (
        bands.groupBy("band_id", "band_hash")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_bucket > CAP, "fixture must contain a bucket above the cap"


def test_capped_dup_pairs_match_legacy_route(codes):
    """verified_bucket_pairs' split (inline-verified cold buckets +
    residual-verified hub edges) == candidate_pairs → verify_pairs with the
    same cap."""
    slim = lsh.rep_codes(codes).localCheckpoint(eager=True)
    new = lsh.dup_pairs(codes, bucket_cap=CAP, compute_jaccard=False)

    bands = lsh.minhash_bands(slim).union(lsh.simhash_bands(slim))
    cand = lsh.candidate_pairs(bands, bucket_cap=CAP)
    legacy = lsh.verify_pairs(cand, slim).unionByName(
        lsh.exact_pairs(codes, slim).select(
            "url_a", "url_b", "src",
            F.lit(0).alias("cid_hamming"), F.lit(0).alias("simhash_hamming"),
            F.lit(1.0).alias("jaccard_est"), F.lit(True).alias("exact_dup"),
        )
    )
    assert _pair_set(new) == _pair_set(legacy)


def test_capping_preserves_farm_cluster(spark, codes):
    """Cluster assignments with an aggressive cap equal the uncapped ones on
    this fixture: hub-and-spoke keeps every hot bucket connected and the
    farm members are mutually near-identical, so hub edges verify."""
    uncapped = assign_clusters(
        codes.select("url"), lsh.dup_pairs(codes, bucket_cap=1 << 30)
    )
    capped = assign_clusters(
        codes.select("url"), lsh.dup_pairs(codes, bucket_cap=CAP)
    )
    a = {r["url"]: r["cluster_id"] for r in uncapped.collect()}
    b = {r["url"]: r["cluster_id"] for r in capped.collect()}
    assert a == b
