from __future__ import annotations

import hashlib

import pytest

from iscc_specs_spark.operators import multimodal as M


def test_decode_stubs_raise():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\xff\xd8fakejpeg")
    with pytest.raises(NotImplementedError):
        M.sample_frames(b"fakevideo")


def test_fake_features_deterministic():
    a, b = M.fake_features(b"payload"), M.fake_features(b"payload")
    assert a == b
    assert a["sha256"] == hashlib.sha256(b"payload").hexdigest()
    assert a["n_bytes"] == 7
    assert len(a["histogram"]) == 256 and sum(a["histogram"]) == 7
    assert len(a["thumb"]) == 64
    empty = M.fake_features(b"")
    assert empty["n_bytes"] == 0 and empty["byte_entropy"] == 0.0


def test_extract_features_schema_and_batching(spark):
    assets = M.synthetic_assets(spark, n=32, partitions=4)
    feats = M.extract_features(assets)
    assert feats.schema.simpleString() == (
        "struct<asset_id:bigint,kind:string,n_bytes:bigint,sha256:string,"
        "payload_fp:string,"
        "byte_entropy:double,histogram:array<int>,thumb:array<double>>"
    )
    rows = feats.collect()
    assert len(rows) == 32
    # distributed result equals local recompute (Arrow round-trip fidelity)
    payloads = {r["asset_id"]: bytes(r["payload"]) for r in assets.collect()}
    for r in rows:
        want = M.fake_features(payloads[r["asset_id"]])
        assert r["sha256"] == want["sha256"]
        assert r["n_bytes"] == want["n_bytes"]
        assert list(r["histogram"]) == want["histogram"]
