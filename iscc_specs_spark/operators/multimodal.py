"""Multimodal (image/audio/video) column plumbing.

Assets are opaque ``binary`` payloads with typed metadata — the Spark-side
contract (schema, partitioning, Arrow batch shape, UDF signatures) is real
and tested. PNG/GIF/JPEG image decode is REAL (pure-stdlib deterministic
decoders: kernel/imagecodec.py, kernel/jpegcodec.py — golden-vector
conformant), and so is uncompressed A/V sampling (WAV PCM windows —
kernel/wavcodec.py; animated-GIF frame sampling — decode_gif_frames).
Only compressed A/V codecs (MP3/AAC/MP4/H.264/...) remain env-blocked:
they classify as 'unsupported' in the operators layer, never crash a job.

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


def sample_frames(
    payload: bytes, every_ms: int = 1000, max_samples: int = 64
) -> tuple[list[tuple[int, "np.ndarray"]], int]:
    """Sample animation frames on an ``every_ms`` grid →
    ([(ts_ms, gray)], total_duration_ms).

    ``total_duration_ms`` is the decoded timeline's true length (sum of
    per-frame delays), independent of the sampling grid and of the
    ``max_samples`` cap — callers reporting duration must use it, not the
    last sample's timestamp.

    REAL for the uncompressed container this environment can decode:
    animated (and still) GIF via kernel/imagecodec.py:decode_gif_frames —
    the timeline is rebuilt from per-frame delays (a delay of 0, the
    wild-GIF "as fast as possible" convention, is normalized to 100 ms,
    the de-facto browser default), each sample instant takes the canvas
    frame covering it, and palette indices map to ITU-R 601-2 luma through
    the global color table. Compressed video codecs (MP4/H.264/VP9/...)
    raise NotImplementedError — no codec libraries in this environment;
    the operators layer classifies them as 'unsupported', never crashes.
    """
    from iscc_specs_spark.kernel.imagecodec import sniff
    from iscc_specs_spark.kernel.images import to_grayscale

    raw = bytes(payload)
    if sniff(raw) != "gif":
        raise NotImplementedError(
            "compressed video codecs unavailable in this environment "
            "(only GIF animations decode)"
        )
    from iscc_specs_spark.kernel.imagecodec import decode_gif_frames

    frames, palette, delays = decode_gif_frames(raw)
    delays = [d if d > 0 else 100 for d in delays]
    starts = [0]
    for d in delays[:-1]:
        starts.append(starts[-1] + d)
    total = starts[-1] + delays[-1]
    out: list[tuple[int, np.ndarray]] = []
    t, idx = 0, 0
    while t < total and len(out) < max_samples:
        while idx + 1 < len(starts) and starts[idx + 1] <= t:
            idx += 1
        gray = to_grayscale("P", frames[idx], palette)
        out.append((t, gray))
        t += every_ms
    return out, total


def sample_audio_windows(
    payload: bytes, window_ms: int = 1000, max_windows: int = 4096
) -> tuple[int, int, list[tuple[int, int, int, int]]]:
    """WAV PCM → (sample_rate, duration_ms, [(ts_ms, mean_abs, peak_abs,
    zero_crossings)]) — one feature row per ``window_ms`` window.

    All integer math (channel downmix = floor mean, mean_abs = floor mean
    of |x|, zero crossings = sign-bit changes), so the features are a pure
    function of the payload bytes with no float rounding to drift across
    NumPy versions. Compressed audio (MP3/AAC/...) raises
    NotImplementedError via decode_wav's container check.
    """
    from iscc_specs_spark.kernel.wavcodec import decode_wav

    rate, samples = decode_wav(bytes(payload))
    n, ch = samples.shape
    duration_ms = n * 1000 // rate
    mono = (samples.astype(np.int64).sum(axis=1) // ch) if ch > 1 else (
        samples[:, 0].astype(np.int64)
    )
    fpw = max(rate * window_ms // 1000, 1)
    nonneg = mono >= 0
    flips = np.zeros(n, dtype=np.int64)
    if n > 1:
        flips[1:] = (nonneg[1:] != nonneg[:-1]).astype(np.int64)
    out: list[tuple[int, int, int, int]] = []
    for w in range(min(-(-n // fpw), max_windows)):
        lo, hi = w * fpw, min((w + 1) * fpw, n)
        seg = np.abs(mono[lo:hi])
        out.append(
            (
                w * window_ms,
                int(seg.sum() // (hi - lo)),
                int(seg.max()),
                # flips[i] marks a sign change between samples i-1 and i
                # (flips[0] ≡ 0): a crossing on a window boundary counts in
                # the later window, so window totals sum to the signal total
                int(flips[lo:hi].sum()),
            )
        )
    return rate, duration_ms, out


def audio_fp(mono: "np.ndarray") -> bytes:
    """64-bit energy-envelope fingerprint of a mono PCM signal.

    Engine-defined (the ISCC v1.0 spec reserves the audio content type but
    defines no algorithm — reference docs/specification.md:205-206): the
    signal is cut into 64 contiguous equal slices and bit i is set iff
    slice i's mean |amplitude| exceeds the whole signal's mean |amplitude|
    (exact integer cross-multiplication, no division). Amplitude-scale
    changes that preserve the envelope shape preserve the fingerprint.
    """
    x = np.abs(np.asarray(mono, dtype=np.int64))
    n = x.size
    if n == 0:
        raise ValueError("audio_fp needs at least one sample")
    csum = np.concatenate(([0], np.cumsum(x)))
    bounds = (np.arange(65, dtype=np.int64) * n) // 64
    ssum = csum[bounds[1:]] - csum[bounds[:-1]]
    slen = bounds[1:] - bounds[:-1]
    total = int(csum[-1])
    bits = (ssum * n > total * slen).astype(np.uint8)
    return np.packbits(bits).tobytes()


def video_fp(frames: "list[np.ndarray]") -> bytes:
    """64-bit fingerprint of sampled frames: per-frame 32×32 bicubic
    normalize → DCT perceptual hash (the conformant image kernel), then
    SimHash-aggregated across frames — the same aggregate the ISCC spec
    family uses for multi-signature content (engine-defined body; the v1.0
    spec reserves the video type, docs/specification.md:205-206)."""
    from iscc_specs_spark.kernel.images import image_hash, resize_bicubic
    from iscc_specs_spark.kernel.sketches import similarity_hash

    if not frames:
        raise ValueError("video_fp needs at least one frame")
    digests = [image_hash(resize_bicubic(f)) for f in frames]
    return similarity_hash(digests)


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


AV_SCHEMA = (
    "asset_id long, kind string, container string, duration_ms long, "
    "n_samples int, av_code string, av_hex string, fp_body long, "
    "decode_status string"
)


def av_codes(
    assets: DataFrame, every_ms: int = 250, window_ms: int = 250
) -> DataFrame:
    """Engine-defined audio/video fingerprint codes, distributed.

    The A/V sibling of :func:`image_codes`: one Arrow-batched
    ``mapInPandas`` pass over audio/video assets decodes each payload with
    the uncompressed-container kernels (WAV PCM — kernel/wavcodec.py; GIF
    animation — kernel/imagecodec.py:decode_gif_frames), samples it
    (``window_ms`` audio windows / ``every_ms`` frame grid) and emits a
    64-bit fingerprint (:func:`audio_fp` energy envelope /
    :func:`video_fp` SimHash over per-frame DCT hashes) encoded under the
    spec's reserved CID-A / CID-V header bytes (the v1.0 spec reserves
    these content types but defines no algorithm — reference
    docs/specification.md:128-131,205-206 — so the body is engine-defined
    and pinned by self-vectors, not golden vectors).

    Narrow map, no shuffle. A 100 TB crawl WILL contain NULL, truncated,
    compressed-codec and corrupt payloads: each class gets NULL codes plus
    a distinct decode_status ('null_payload' / 'unsupported' /
    'too_large' / 'corrupt'), measurable per-corpus, never a failed job.
    """
    from iscc_specs_spark.kernel.codec import encode
    from iscc_specs_spark.kernel.constants import HEAD_CID_A, HEAD_CID_V
    from iscc_specs_spark.kernel.imagecodec import ImageTooLarge, sniff
    from iscc_specs_spark.kernel.wavcodec import AudioTooLarge, decode_wav

    def one(kind: str, payload: bytes):
        if payload is None:
            return ("unknown", None, None, None, None, None, "null_payload")
        raw = bytes(payload)
        sniffed = sniff(raw)
        container = sniffed if sniffed != "unknown" else (
            "wav" if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE" else "unknown"
        )
        try:
            if kind == "audio":
                if container != "wav":
                    # not even a RIFF/WAVE container: a compressed codec
                    # (MP3/AAC/...) this environment can't decode, not a
                    # corrupt WAV — mirror the video path's NotImplemented
                    return (container, None, None, None, None, None, "unsupported")
                rate, samples = decode_wav(raw)
                n, ch = samples.shape
                if n == 0:
                    return (container, None, None, None, None, None, "corrupt")
                mono = (
                    samples.astype(np.int64).sum(axis=1) // ch
                    if ch > 1
                    else samples[:, 0].astype(np.int64)
                )
                fpw = max(rate * window_ms // 1000, 1)
                fp = audio_fp(mono)
                head, dur, nsamp = HEAD_CID_A, n * 1000 // rate, -(-n // fpw)
            elif kind == "video":
                sampled, total_ms = sample_frames(raw, every_ms=every_ms)
                fp = video_fp([f for _, f in sampled])
                head, dur, nsamp = HEAD_CID_V, total_ms, len(sampled)
            else:
                return (container, None, None, None, None, None, "unsupported")
        except NotImplementedError as e:
            if isinstance(e, (ImageTooLarge, AudioTooLarge)):
                return (container, None, None, None, None, None, "too_large")
            return (container, None, None, None, None, None, "unsupported")
        except Exception:
            return (container, None, None, None, None, None, "corrupt")
        return (
            container,
            dur,
            nsamp,
            encode(head + fp),
            fp.hex(),
            int.from_bytes(fp, "big", signed=True),
            "ok",
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = [one(k, p) for k, p in zip(pdf["kind"], pdf["payload"])]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "container": [r[0] for r in res],
                    # nullable Int64, NOT plain lists: None entries would
                    # coerce int columns to float64 and round the 64-bit
                    # fingerprint body's low bits
                    "duration_ms": pd.array([r[1] for r in res], dtype="Int64"),
                    "n_samples": pd.array([r[2] for r in res], dtype="Int64"),
                    "av_code": [r[3] for r in res],
                    "av_hex": [r[4] for r in res],
                    "fp_body": pd.array([r[5] for r in res], dtype="Int64"),
                    "decode_status": [r[6] for r in res],
                }
            )

    av = assets.where(F.col("kind").isin("audio", "video")).select(
        "asset_id", "kind", "payload"
    )
    return av.mapInPandas(run, schema=AV_SCHEMA)


def synthetic_assets(
    spark,
    n: int = 64,
    partitions: int = 4,
    kinds: tuple = ("image", "audio", "video"),
) -> DataFrame:
    """Deterministic fake asset table for tests/benchmarks.

    Image-kind assets carry REAL decodable payloads rotating across all
    three supported codecs — PNG, GIF, JPEG (pure functions of the asset
    id: kernel/imagecodec.py:encode_png_gray / encode_gif_gray,
    kernel/jpegcodec.py:encode_jpeg_gray) — so every decoder runs through
    the distributed mapInPandas path, not just its unit tests. Audio and
    video assets likewise carry REAL uncompressed payloads (WAV PCM with
    varying rate, 1-3 channels and 8/16-bit depth; animated GIF with
    varying frame count and delay), except every 5th of each, which stays
    an opaque byte blob —
    standing in for the compressed codecs this environment cannot decode,
    so the 'unsupported' failure class is always exercised and its rate is
    pinned by the driver oracle.

    ``kinds`` narrows which kinds get real payloads (the others carry NULL
    payloads at zero cost) — benchmarks that consume a single kind pass it
    so payload synthesis for the unconsumed kinds isn't billed to the
    measured query; the asset-id ↔ kind rotation itself never changes."""
    from iscc_specs_spark.kernel.imagecodec import (
        encode_gif_gray,
        encode_gif_gray_frames,
        encode_png_gray,
    )
    from iscc_specs_spark.kernel.jpegcodec import encode_jpeg_gray
    from iscc_specs_spark.kernel.wavcodec import encode_wav_pcm8, encode_wav_pcm16

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

    def _blob(i: int) -> bytes:
        return bytes(
            np.frombuffer(
                hashlib.sha256(f"asset-{i}".encode()).digest() * (8 + i % 5),
                dtype=np.uint8,
            )
        )

    def _audio_payload(i: int) -> tuple[bytes, int]:
        # integer sawtooth mixture — a pure function of the asset id.
        # Rate, channel count (1-3) AND sample depth (8/16-bit) all rotate
        # with the ordinal so every decode_wav branch runs through the
        # distributed mapInPandas path, not just its unit tests.
        rate = (4000, 8000)[i % 2]
        # key the shape rotation off the per-kind ordinal i//3 (asset ids of
        # one kind are ≡ const mod 3, so i-keyed cycles would alias)
        channels = 1 + (i // 3) % 3
        n = rate * (500 + 250 * ((i // 3) % 3)) // 1000  # 0.5-1.0 s
        t = np.arange(n, dtype=np.int64)
        p1, p2 = 29 + (i % 13), 61 + (i % 17)
        sig = ((t % p1) * 500 - (t % p2) * 311).astype(np.int16)
        mat = np.stack(
            [sig if c % 2 == 0 else np.roll(sig, c * 7) for c in range(channels)],
            axis=1,
        )
        if (i // 6) % 2 == 1:  # 8-bit unsigned PCM flavor
            return encode_wav_pcm8(
                ((mat.astype(np.int32) >> 8) + 128).astype(np.uint8), rate
            ), n * 1000 // rate
        return encode_wav_pcm16(mat, rate), n * 1000 // rate

    def _video_payload(i: int) -> tuple[bytes, int]:
        nf = 3 + (i % 4)
        delay = 80 + 10 * (i % 5)
        y, x = np.mgrid[0:24, 0:32]
        frames = [
            ((x * (2 + f) + y * (3 + i % 5) + f * 31) % 256).astype(np.uint8)
            for f in range(nf)
        ]
        return encode_gif_gray_frames(frames, delay_ms=delay), nf * (delay // 10) * 10

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].astype(int)
            row_kinds = [("image", "audio", "video")[i % 3] for i in ids]
            payloads, media, durations = [], [], []
            for i, k in zip(ids, row_kinds):
                if k not in kinds:
                    payloads.append(None)
                    media.append("application/x-null")
                    durations.append(0)
                elif k == "image":
                    payloads.append(_image_payload(i))
                    media.append(f"image/{('png', 'gif', 'jpeg')[(i // 3) % 3]}")
                    durations.append(0)
                elif (i // 3) % 5 == 4:  # compressed-codec stand-in blob
                    payloads.append(_blob(i))
                    media.append(f"application/x-fake-{k}")
                    durations.append(0)
                elif k == "audio":
                    p, d = _audio_payload(i)
                    payloads.append(p)
                    media.append("audio/x-wav")
                    durations.append(d)
                else:
                    p, d = _video_payload(i)
                    payloads.append(p)
                    media.append("image/gif")
                    durations.append(d)
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "kind": row_kinds,
                    "payload": payloads,
                    "media_type": media,
                    "width": [0] * len(ids),
                    "height": [0] * len(ids),
                    "duration_ms": durations,
                }
            )

    return spark.range(0, n, numPartitions=partitions).mapInPandas(
        gen, schema=ASSET_SCHEMA
    )
