from __future__ import annotations

import hashlib

import pytest

from iscc_specs_spark.operators import multimodal as M


def test_decode_stubs_raise():
    with pytest.raises(ValueError):
        M.decode_image(b"\xff\xd8\xff\xe0fakejpeg")  # corrupt JPEG stream
    with pytest.raises(NotImplementedError):
        M.sample_frames(b"fakevideo")


def test_decode_image_real_jpeg():
    """Progressive JPEG decodes bit-identically to the PIL-produced golden
    vector (the formerly-descoped conformance cases)."""
    import json
    import os

    import numpy as np

    from iscc_specs_spark.kernel.images import image_normalize

    fx = os.path.join(os.path.dirname(__file__), "fixtures")
    data = open(os.path.join(fx, "file_image_cat.jpg"), "rb").read()
    want = json.load(open(os.path.join(fx, "test_data.json")))[
        "image_normalize"
    ]["test_001_file_image_cat_jpg"]["outputs"]
    assert image_normalize(data) == want


def test_decode_image_real_png():
    import numpy as np

    from iscc_specs_spark.kernel.imagecodec import encode_png_gray

    mat = ((np.arange(24 * 16).reshape(16, 24) * 3) % 256).astype(np.uint8)
    assert (M.decode_image(encode_png_gray(mat)) == mat).all()


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


def test_image_codes_distributed_matches_local(spark):
    """Distributed image track == local kernel per asset (Arrow parity)."""
    import iscc_specs_spark.operators.multimodal as M
    from iscc_specs_spark.kernel.images import content_id_image

    assets = M.synthetic_assets(spark, n=24)
    got = {r["asset_id"]: r for r in M.image_codes(assets).collect()}
    # image assets are real PNGs: the local twin runs the full reference
    # path (decode → normalize → DCT hash) via content_id_image(bytes)
    local = {
        r["asset_id"]: content_id_image(bytes(r["payload"]))
        for r in assets.where("kind = 'image'").collect()
    }
    assert set(got) == set(local) and len(got) == 8  # every 3rd of 24
    for aid, want in local.items():
        assert got[aid]["image_cid"] == want
        assert want.startswith("CY")  # HEAD_CID_I header chars
    # distinct patterns → mostly distinct codes
    assert len({r["image_cid"] for r in got.values()}) > 1


def test_image_codes_corrupt_payload_yields_null(spark):
    """Truncated PNG must produce NULL codes (measurable corrupt rate), not
    fail the job or fall back to a fake hash."""
    import numpy as np

    import iscc_specs_spark.operators.multimodal as M
    from iscc_specs_spark.kernel.imagecodec import encode_png_gray

    ok = encode_png_gray(np.zeros((8, 8), dtype=np.uint8))
    rows = [
        (0, "image", bytes(ok)),
        (1, "image", bytes(ok[:30])),            # truncated PNG
        (2, "image", None),                      # NULL payload
        (3, "image", b"\xff\xd8\xff\xe0jpeg.."),  # truncated JPEG stream
        (4, "image", open(
            __file__.rsplit("/", 1)[0] + "/fixtures/file_image_cat.jpg", "rb"
        ).read()),                                # real progressive JPEG
    ]
    df = spark.createDataFrame(rows, "asset_id long, kind string, payload binary")
    got = {r["asset_id"]: r for r in M.image_codes(df).collect()}
    assert got[0]["image_cid"] is not None and got[0]["decode_status"] == "ok"
    assert got[4]["image_cid"] is not None and got[4]["decode_status"] == "ok"
    for aid, status in ((1, "corrupt"), (2, "null_payload"), (3, "corrupt")):
        assert got[aid]["image_cid"] is None and got[aid]["hash_body"] is None
        assert got[aid]["decode_status"] == status, aid


def test_synthetic_assets_exercise_all_three_codecs(spark):
    """The driver-row fixture rotates image payloads across PNG, GIF and
    JPEG, and every one must decode 'ok' through the distributed
    mapInPandas path — each codec's distributed run is pinned, not just
    its unit tests. GIF/PNG are lossless siblings of the same pixel
    matrix, so their hashes must agree pairwise when the pattern matches;
    determinism is pinned via a local recompute."""
    import iscc_specs_spark.operators.multimodal as M
    from iscc_specs_spark.kernel.images import content_id_image

    assets = M.synthetic_assets(spark, n=64).localCheckpoint(eager=True)
    got = {r["asset_id"]: r for r in M.image_codes(assets).collect()}
    by_kind = {}
    for r in got.values():
        by_kind.setdefault(r["payload_kind"], []).append(r)
    assert set(by_kind) == {"png", "gif", "jpeg"}, set(by_kind)
    for kind, rows in by_kind.items():
        assert len(rows) >= 7, (kind, len(rows))
        assert all(r["decode_status"] == "ok" for r in rows), kind
        assert all(r["image_cid"] for r in rows), kind
    # distributed == local kernel for every payload, all codecs
    local = {
        r["asset_id"]: content_id_image(bytes(r["payload"]))
        for r in assets.where("kind = 'image'").collect()
    }
    assert {a: r["image_cid"] for a, r in got.items()} == local
