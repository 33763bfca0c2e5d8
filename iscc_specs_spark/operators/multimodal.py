"""Multimodal (image/audio/video) column plumbing.

Assets are opaque ``binary`` payloads with typed metadata — the Spark-side
contract (schema, partitioning, Arrow batch shape, UDF signatures) is real
and tested. PNG/GIF/JPEG decode is REAL (pure-stdlib deterministic
decoders: kernel/imagecodec.py, kernel/jpegcodec.py — golden-vector
conformant); compressed audio/video codecs remain honest env-blocked stubs.

Design (mirrors the text tracks in operators/codegen.py): one
``mapInPandas`` pass per asset batch, Arrow-transported, producing
fixed-width feature columns. Byte-level features (length, sha256
fingerprint, 256-bin histogram, coarse 8×8 "thumbnail" of byte energy)
depend only on the raw bytes, so every asset kind exercises the full
distributed plumbing regardless of codec availability.

Reference parity: the reference's image track (content_id_image,
/root/reference/src/iscc/iscc.py:81-96) runs end-to-end for PNG/GIF
payloads — decode → image_normalize → DCT hash, all golden-vector
conformant (tests/test_images.py, tests/test_conformance.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, kind string, payload binary, media_type string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "asset_id long, kind string, n_bytes long, sha256 string, "
    "payload_fp string, "
    "byte_entropy double, histogram array<int>, thumb array<double>"
)


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an encoded image to a grayscale pixel matrix.

    PNG, GIF and JPEG decode for real via the pure-stdlib deterministic
    decoders in kernel/imagecodec.py + kernel/jpegcodec.py (zlib inflate +
    unfilter / LZW / progressive Huffman + integer islow IDCT) —
    bit-identical to the PIL-produced golden vectors for all three
    formats.
    """
    from iscc_specs_spark.kernel.imagecodec import decode_image as _dec
    from iscc_specs_spark.kernel.images import to_grayscale

    mode, pixels, palette = _dec(payload)
    return to_grayscale(mode, pixels, palette)


def fake_decode_image(payload: bytes, side: int = 32) -> "np.ndarray":
    """Deterministic stand-in for decode+normalize: tile the payload bytes
    into a ``side``×``side`` grayscale matrix.  Lets the *real* image-hash
    kernel (kernel/images.py — DCT pHash, golden-vector conformant) run
    distributed over binary asset columns while the codec itself is absent;
    swapping in a real decoder is a one-function change."""
    buf = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    reps = -(-(side * side) // buf.size)  # ceil
    return np.tile(buf, reps)[: side * side].reshape(side, side)


def sample_frames(payload: bytes, every_ms: int = 1000) -> list[bytes]:
    """Sample video frames every ``every_ms``. STUB (no video codec)."""
    raise NotImplementedError("video decoding unavailable in this environment")


def fake_features(payload: bytes) -> dict:
    """Deterministic byte-level features (real computation, no codec).

    Used as the stand-in 'decode + feature extract' so the distributed
    pipeline (schema, batching, partitioning) is fully exercised.
    """
    buf = np.frombuffer(payload or b"", dtype=np.uint8)
    hist = np.bincount(buf, minlength=256) if buf.size else np.zeros(256, int)
    p = hist / max(buf.size, 1)
    nz = p[p > 0]
    entropy = float(-(nz * np.log2(nz)).sum()) if nz.size else 0.0
    # 8x8 "thumbnail": mean byte value over 64 equal slices
    if buf.size:
        cells = np.array_split(buf.astype(np.float64), 64)
        thumb = [float(c.mean()) if c.size else 0.0 for c in cells]
    else:
        thumb = [0.0] * 64
    return {
        "n_bytes": int(buf.size),
        "sha256": hashlib.sha256(payload or b"").hexdigest(),
        # fingerprint of the lowercase-hex payload: equivalent integrity
        # check that the DuckDB oracle can recompute (its sha256() only
        # accepts VARCHAR, so raw-byte digests are not cross-checkable)
        "payload_fp": hashlib.sha256((payload or b"").hex().encode()).hexdigest(),
        "byte_entropy": entropy,
        "histogram": hist.astype("int32").tolist(),
        "thumb": thumb,
    }


def extract_features(assets: DataFrame) -> DataFrame:
    """assets → per-asset feature rows via Arrow-batched mapInPandas.

    Narrow (no shuffle); at scale the only knobs are Arrow batch size
    (bounded memory with large payloads) and input split size.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "sha256": [f["sha256"] for f in feats],
                    "payload_fp": [f["payload_fp"] for f in feats],
                    "byte_entropy": [f["byte_entropy"] for f in feats],
                    "histogram": [f["histogram"] for f in feats],
                    "thumb": [f["thumb"] for f in feats],
                }
            )

    cols = [c for c in ("asset_id", "kind", "payload") if c in assets.columns]
    return assets.select(*cols).mapInPandas(run, schema=FEATURE_SCHEMA)


def image_codes(assets: DataFrame) -> DataFrame:
    """Content-ID-Image per image asset — the reference's image track
    (iscc.py:81-96) run distributed: one Arrow-batched ``mapInPandas`` pass
    decodes and DCT-hashes each payload with the conformant kernel
    (kernel/images.py + kernel/imagecodec.py). PNG/GIF payloads run the
    REAL decode → image_normalize → hash path; payloads that are not a
    recognized image (synthetic byte blobs) fall back to the deterministic
    byte-tiled stand-in so the plumbing stays exercised either way.

    Narrow map, no shuffle; returns (asset_id, payload_kind, image_cid,
    image_hash_hex, hash_body, decode_status) — hash_body is the signed-64
    digest for SQL-side re-derivation of the encoded forms; payload_kind is
    the sniffed container format ('png'/'gif'/'jpeg'/'unknown'), so per-codec
    decode/status rates are a queryable column; decode_status separates
    real decodes ('ok') from stand-ins and the NULL-code failure classes
    ('null_payload' / 'unsupported' / 'too_large' / 'corrupt').
    """
    from iscc_specs_spark.kernel.imagecodec import sniff
    from iscc_specs_spark.kernel.images import image_hash, image_normalize

    from iscc_specs_spark.kernel.codec import encode
    from iscc_specs_spark.kernel.constants import HEAD_CID_I

    def one(payload: bytes):
        # a 100 TB crawl WILL contain NULL, truncated, corrupt and
        # policy-descoped payloads; each failure class gets NULL codes plus
        # a distinct decode_status (measurable rates, never a fake hash for
        # bytes that claimed to be a real image, never a failed job)
        if payload is None:
            return ("unknown", None, None, None, "null_payload")
        raw = bytes(payload)
        kind = sniff(raw)
        try:
            if kind in ("png", "gif", "jpeg"):
                pixels, status = image_normalize(raw), "ok"
            else:
                # unrecognized bytes: deterministic byte-tiled stand-in so
                # synthetic/opaque payloads still exercise the plumbing
                pixels, status = fake_decode_image(raw), "stand_in"
        except NotImplementedError as e:
            from iscc_specs_spark.kernel.imagecodec import ImageTooLarge

            if isinstance(e, ImageTooLarge):
                # over the decode-size guard: classified so an executor
                # task never stalls minutes inside one image's sequential
                # filter pass (rates measurable per-corpus)
                return (kind, None, None, None, "too_large")
            # well-formed but unsupported variant (16-bit PNG,
            # transparent offset GIF sub-frame, exotic JPEG process)
            return (kind, None, None, None, "unsupported")
        except Exception:
            return (kind, None, None, None, "corrupt")
        digest = image_hash(pixels)  # both branches yield normalized 32×32
        return (
            kind,
            encode(HEAD_CID_I + digest),
            digest.hex(),
            int.from_bytes(digest, "big", signed=True),
            status,
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload_kind": [r[0] for r in res],
                    "image_cid": [r[1] for r in res],
                    "image_hash_hex": [r[2] for r in res],
                    "hash_body": [r[3] for r in res],
                    "decode_status": [r[4] for r in res],
                }
            )

    imgs = assets.where(F.col("kind") == "image").select("asset_id", "payload")
    return imgs.mapInPandas(
        run,
        schema=(
            "asset_id long, payload_kind string, image_cid string, "
            "image_hash_hex string, hash_body long, decode_status string"
        ),
    )


def synthetic_assets(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake asset table for tests/benchmarks.

    Image-kind assets carry REAL decodable payloads rotating across all
    three supported codecs — PNG, GIF, JPEG (pure functions of the asset
    id: kernel/imagecodec.py:encode_png_gray / encode_gif_gray,
    kernel/jpegcodec.py:encode_jpeg_gray) — so every decoder runs through
    the distributed mapInPandas path, not just its unit tests; audio/video
    payloads stay opaque byte blobs."""
    from iscc_specs_spark.kernel.imagecodec import encode_gif_gray, encode_png_gray
    from iscc_specs_spark.kernel.jpegcodec import encode_jpeg_gray

    encoders = {
        "png": encode_png_gray,
        "gif": encode_gif_gray,
        "jpeg": encode_jpeg_gray,
    }

    def _image_payload(i: int) -> bytes:
        # 48×32 deterministic gradient-plus-texture pattern per asset,
        # encoded with the codec chosen by the image's ordinal (i//3)
        y, x = np.mgrid[0:32, 0:48]
        mat = ((x * (3 + i % 7) + y * (5 + i % 11) + (x * y) // (1 + i % 4)) % 256)
        fmt = ("png", "gif", "jpeg")[(i // 3) % 3]
        return encoders[fmt](mat.astype(np.uint8))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].astype(int)
            kinds = [("image", "audio", "video")[i % 3] for i in ids]
            payloads = [
                _image_payload(i)
                if k == "image"
                else bytes(
                    np.frombuffer(
                        hashlib.sha256(f"asset-{i}".encode()).digest() * (8 + i % 5),
                        dtype=np.uint8,
                    )
                )
                for i, k in zip(ids, kinds)
            ]
            media = [
                f"image/{('png', 'gif', 'jpeg')[(i // 3) % 3]}"
                if k == "image"
                else f"application/x-fake-{k}"
                for i, k in zip(ids, kinds)
            ]
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "kind": kinds,
                    "payload": payloads,
                    "media_type": media,
                    "width": [0] * len(ids),
                    "height": [0] * len(ids),
                    "duration_ms": [0] * len(ids),
                }
            )

    return spark.range(0, n, numPartitions=partitions).mapInPandas(
        gen, schema=ASSET_SCHEMA
    )
