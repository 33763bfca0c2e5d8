"""Uncompressed A/V sampling track: WAV PCM codec, multi-frame GIF,
frame/window sampling operators and the distributed av_codes path.

Reference scope note: the reference (iscc/iscc-specs v1.0.5) defines the
CID-A/CID-V header bytes (docs/specification.md:128-131) but leaves the
audio/video content types "to be defined in a later version"
(docs/specification.md:205-206) — there are no golden vectors to match, so
this track is pinned by round-trip self-vectors and hand-computed values.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from iscc_specs_spark.kernel.imagecodec import (
    decode_gif,
    decode_gif_frames,
    encode_gif_gray,
    encode_gif_gray_frames,
)
from iscc_specs_spark.kernel.wavcodec import (
    decode_wav,
    encode_wav_pcm8,
    encode_wav_pcm16,
)


# ---------------------------------------------------------------------------
# WAV PCM codec
# ---------------------------------------------------------------------------


def _tone(n: int, period: int, amp: int = 12000) -> np.ndarray:
    """Deterministic integer sawtooth — no float DSP anywhere."""
    t = np.arange(n, dtype=np.int64)
    return ((t % period) * (2 * amp) // max(period - 1, 1) - amp).astype(np.int16)


def test_wav_roundtrip_mono_16bit():
    sig = _tone(4000, 37)
    data = encode_wav_pcm16(sig, 8000)
    rate, out = decode_wav(data)
    assert rate == 8000
    assert out.shape == (4000, 1)
    assert np.array_equal(out[:, 0], sig)


def test_wav_roundtrip_stereo_16bit():
    left, right = _tone(1000, 23), _tone(1000, 41, amp=7000)
    data = encode_wav_pcm16(np.stack([left, right], axis=1), 44100)
    rate, out = decode_wav(data)
    assert rate == 44100
    assert out.shape == (1000, 2)
    assert np.array_equal(out[:, 0], left)
    assert np.array_equal(out[:, 1], right)


def _wav_8bit(raw: bytes, channels: int = 1, rate: int = 8000) -> bytes:
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels, channels, 8)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )


def test_wav_8bit_widens_to_int16():
    # 8-bit PCM is unsigned with midpoint 128; decode widens (x-128)<<8
    raw = bytes([0, 128, 255, 64])
    rate, out = decode_wav(_wav_8bit(raw))
    assert rate == 8000
    assert out.dtype == np.int16
    assert out[:, 0].tolist() == [-32768, 0, 32512, -16384]


def test_wav_roundtrip_8bit_encoder():
    # encode_wav_pcm8 writes unsigned bytes; decode widens (x-128)<<8,
    # so the round-trip is exact up to that documented widening
    raw = np.array([[0, 10], [128, 200], [255, 90]], dtype=np.uint8)
    rate, out = decode_wav(encode_wav_pcm8(raw, 4000))
    assert rate == 4000
    assert out.shape == (3, 2)
    assert np.array_equal(out, (raw.astype(np.int16) - 128) << 8)


def test_wav_truncated_data_decodes_complete_frames():
    # a crawl WILL contain cut-off files: complete frames decode, the
    # ragged tail byte is dropped
    sig = _tone(100, 11)
    data = encode_wav_pcm16(np.stack([sig, sig], axis=1), 8000)
    rate, out = decode_wav(data[:-5])  # drop 5 bytes = 1 frame + 1 byte
    assert out.shape == (98, 2)
    assert np.array_equal(out[:, 0], sig[:98])


def test_wav_structural_errors():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxABCD")  # not WAVE
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + b"\x00" * 40)  # wrong container entirely
    # data chunk but no fmt chunk
    bad = b"RIFF" + struct.pack("<I", 12) + b"WAVE" + b"data" + struct.pack("<I", 2) + b"ab"
    with pytest.raises(ValueError):
        decode_wav(bad)


def test_wav_non_pcm_unsupported():
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    data = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError):
        decode_wav(data)


def test_wav_skips_leading_extra_chunks():
    # LIST/INFO chunks before fmt/data are routine in the wild
    sig = _tone(50, 7)
    canonical = encode_wav_pcm16(sig, 8000)
    body = canonical[12:]
    junk = b"LIST" + struct.pack("<I", 6) + b"INFOab"
    data = (
        b"RIFF" + struct.pack("<I", 4 + len(junk) + len(body)) + b"WAVE"
        + junk + body
    )
    rate, out = decode_wav(data)
    assert np.array_equal(out[:, 0], sig)


# ---------------------------------------------------------------------------
# multi-frame GIF
# ---------------------------------------------------------------------------


def _frames(n: int, h: int = 16, w: int = 24) -> list[np.ndarray]:
    y, x = np.mgrid[0:h, 0:w]
    return [((x * (3 + i) + y * (5 + 2 * i)) % 256).astype(np.uint8) for i in range(n)]


def test_gif_frames_roundtrip():
    frames = _frames(4)
    data = encode_gif_gray_frames(frames, delay_ms=120)
    out, palette, delays = decode_gif_frames(data)
    assert len(out) == 4
    # encoder palette is identity grayscale, so indices == pixel values
    for got, want in zip(out, frames):
        assert np.array_equal(got, want)
    assert np.array_equal(palette[:, 0], np.arange(256))
    assert delays == [120, 120, 120, 120]  # centisecond grid: 120 survives


def test_gif_frames_delay_centisecond_grid():
    data = encode_gif_gray_frames(_frames(2), delay_ms=37)
    _, _, delays = decode_gif_frames(data)
    assert delays == [30, 30]  # 37 // 10 = 3 cs


def test_gif_single_frame_still_decodes_as_animation():
    mat = _frames(1)[0]
    out, _, delays = decode_gif_frames(encode_gif_gray(mat))
    assert len(out) == 1
    assert np.array_equal(out[0], mat)
    assert delays == [0]  # plain still: no GCE → delay 0


def test_gif_frames_agrees_with_single_frame_decoder():
    frames = _frames(3)
    data = encode_gif_gray_frames(frames, delay_ms=100)
    first_multi = decode_gif_frames(data)[0][0]
    mode, pixels, palette = decode_gif(data)
    gray_first = np.asarray(palette)[pixels][:, :, 0]
    assert np.array_equal(first_multi, gray_first)


def test_gif_disposal_background_restores_rect():
    frames = _frames(2)
    data = bytearray(encode_gif_gray_frames(frames, delay_ms=100))
    # flip both GCE disposal fields from 1 (keep) to 2 (restore bg):
    # GCE is 21 f9 04 <packed> ...
    n = 0
    for i in range(len(data) - 3):
        if data[i] == 0x21 and data[i + 1] == 0xF9 and data[i + 2] == 0x04:
            assert data[i + 3] & 0x1C == 0x04
            data[i + 3] = (data[i + 3] & ~0x1C) | 0x08
            n += 1
    assert n == 2
    out, _, _ = decode_gif_frames(bytes(data))
    # each frame still snapshots its own pixels (restore happens after)
    assert np.array_equal(out[0], frames[0])
    assert np.array_equal(out[1], frames[1])


def test_gif_frames_max_frames_cap():
    data = encode_gif_gray_frames(_frames(6), delay_ms=100)
    out, _, _ = decode_gif_frames(data, max_frames=3)
    assert len(out) == 3


def test_gif_frames_rejects_unsupported_features():
    data = bytearray(encode_gif_gray_frames(_frames(2), delay_ms=100))
    for i in range(len(data) - 3):
        if data[i] == 0x21 and data[i + 1] == 0xF9 and data[i + 2] == 0x04:
            data[i + 3] |= 0x01  # transparency flag
            break
    with pytest.raises(NotImplementedError):
        decode_gif_frames(bytes(data))


# ---------------------------------------------------------------------------
# sampling operators (kernel level, no Spark)
# ---------------------------------------------------------------------------


def test_sample_frames_grid():
    from iscc_specs_spark.operators.multimodal import sample_frames

    frames = _frames(3)
    data = encode_gif_gray_frames(frames, delay_ms=100)  # timeline 0/100/200
    out, total = sample_frames(data, every_ms=100)
    assert total == 300  # true timeline, independent of the grid
    assert [t for t, _ in out] == [0, 100, 200]
    for (_, got), want in zip(out, frames):
        assert np.array_equal(got, want)
    # coarser grid skips the middle frame; duration unchanged
    out, total = sample_frames(data, every_ms=250)
    assert total == 300
    assert [t for t, _ in out] == [0, 250]
    assert np.array_equal(out[1][1], frames[2])


def test_sample_frames_rejects_compressed():
    from iscc_specs_spark.operators.multimodal import sample_frames

    with pytest.raises(NotImplementedError):
        sample_frames(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 64)


def test_sample_audio_windows_exact():
    from iscc_specs_spark.operators.multimodal import sample_audio_windows

    # 8000 Hz, 1.5 s; constant block then louder block → hand-checkable
    sig = np.concatenate(
        [np.full(8000, 100, np.int16), np.full(4000, -400, np.int16)]
    )
    rate, dur, windows = sample_audio_windows(
        encode_wav_pcm16(sig, 8000), window_ms=500
    )
    assert (rate, dur) == (8000, 1500)
    assert [w[0] for w in windows] == [0, 500, 1000]
    assert [w[1] for w in windows] == [100, 100, 400]  # mean |x|
    assert [w[2] for w in windows] == [100, 100, 400]  # peak
    # the single sign flip sits on the 8000-sample boundary -> counts in
    # the later window (window totals sum to the signal total)
    assert [w[3] for w in windows] == [0, 0, 1]


def test_sample_audio_window_flip_semantics():
    # pin exactly where a boundary flip is counted: flips[i] marks the
    # change between samples i-1 and i; window [lo,hi) counts
    # flips[lo:hi], so a flip AT a window boundary belongs to the later
    # window and per-window counts conserve the signal total
    from iscc_specs_spark.operators.multimodal import sample_audio_windows

    sig = np.array([10, -10, 10, -10], dtype=np.int16)
    _, _, windows = sample_audio_windows(
        encode_wav_pcm16(sig, 2), window_ms=1000
    )  # two 2-sample windows at 2 Hz
    assert [w[3] for w in windows] == [1, 2]


def test_audio_fp_properties():
    from iscc_specs_spark.operators.multimodal import audio_fp

    quiet, loud = np.full(320, 10, np.int64), np.full(320, 1000, np.int64)
    sig = np.concatenate([quiet, loud])
    fp = audio_fp(sig)
    assert len(fp) == 8
    bits = np.unpackbits(np.frombuffer(fp, np.uint8))
    assert bits[:32].sum() == 0 and bits[32:].sum() == 64 - 32
    # scale invariance (envelope shape preserved)
    assert audio_fp(sig * 7) == fp


def test_video_fp_single_frame_is_its_image_hash():
    from iscc_specs_spark.kernel.images import image_hash, resize_bicubic
    from iscc_specs_spark.operators.multimodal import video_fp

    f = _frames(1)[0]
    assert video_fp([f]) == image_hash(resize_bicubic(f))


# ---------------------------------------------------------------------------
# distributed av_codes
# ---------------------------------------------------------------------------


def test_av_codes_distributed_matches_local(spark):
    from iscc_specs_spark.operators.multimodal import (
        audio_fp,
        av_codes,
        sample_frames,
        synthetic_assets,
        video_fp,
    )
    from iscc_specs_spark.kernel.wavcodec import decode_wav

    assets = synthetic_assets(spark, n=60)
    rows = {r["asset_id"]: r for r in av_codes(assets).collect()}
    local = {r["asset_id"]: r for r in assets.collect()}
    assert len(rows) == 40  # 20 audio + 20 video of 60
    n_ok = 0
    seen_shapes = set()  # (bits_inferred_by_channels, channels) coverage
    for aid, r in rows.items():
        payload = bytes(local[aid]["payload"])
        kind = local[aid]["kind"]
        if r["decode_status"] == "unsupported":
            assert (aid // 3) % 5 == 4
            assert r["av_code"] is None and r["fp_body"] is None
            continue
        assert r["decode_status"] == "ok"
        n_ok += 1
        if kind == "audio":
            rate, samples = decode_wav(payload)
            n, ch = samples.shape
            # canonical encode layout: fmt chunk starts at byte 20, bits
            # field at offset 14 within it
            seen_shapes.add((payload[34], ch))
            mono = (
                samples.astype(np.int64).sum(axis=1) // ch
                if ch > 1
                else samples[:, 0].astype(np.int64)
            )
            want = audio_fp(mono)
            assert r["duration_ms"] == local[aid]["duration_ms"]
        else:
            sampled, total_ms = sample_frames(payload, every_ms=250)
            want = video_fp([f for _, f in sampled])
            assert r["duration_ms"] == total_ms
        assert r["av_hex"] == want.hex()
        assert r["fp_body"] == int.from_bytes(want, "big", signed=True)
        assert r["av_code"] is not None and len(r["av_code"]) == 13
    assert n_ok == 32  # 4 of every 5 per kind decode
    # the payload rotation must exercise BOTH PCM depths and all 1-3
    # channel counts through the distributed path (round-5 advice: the
    # 8-bit/multi-channel decode branches were unit-test-only)
    assert {b for b, _ in seen_shapes} == {8, 16}, seen_shapes
    assert {c for _, c in seen_shapes} == {1, 2, 3}, seen_shapes


def test_av_codes_failure_classes(spark):
    import pandas as pd
    from iscc_specs_spark.operators.multimodal import av_codes

    wav_trunc = encode_wav_pcm16(_tone(100, 9), 8000)[:20]  # fmt cut off
    pdf = pd.DataFrame(
        {
            "asset_id": [1, 2, 3],
            "kind": ["audio", "video", "audio"],
            "payload": [None, b"\x1a\x45\xdf\xa3" + b"\x00" * 32, wav_trunc],
        }
    )
    df = spark.createDataFrame(pdf)
    got = {r["asset_id"]: r["decode_status"] for r in av_codes(df).collect()}
    assert got == {1: "null_payload", 2: "unsupported", 3: "corrupt"}


def test_wav_size_guard_classifies_too_large():
    # over the decode-size guard the codec must classify (AudioTooLarge
    # is a NotImplementedError subclass, so av_codes maps it to the
    # 'too_large' status), never allocate the giant buffer
    import iscc_specs_spark.kernel.wavcodec as wc

    old = wc.MAX_DECODE_SAMPLES
    wc.MAX_DECODE_SAMPLES = 100
    try:
        with pytest.raises(wc.AudioTooLarge):
            wc.decode_wav(encode_wav_pcm16(_tone(4000, 37), 8000))
    finally:
        wc.MAX_DECODE_SAMPLES = old


def test_synthetic_assets_kinds_narrowing(spark):
    # benches pass kinds= so unconsumed kinds cost no payload synthesis;
    # the asset_id ↔ kind rotation itself must never change
    from iscc_specs_spark.operators.multimodal import synthetic_assets

    rows = {r["asset_id"]: r for r in synthetic_assets(
        spark, n=12, kinds=("image",)
    ).collect()}
    full = {r["asset_id"]: r for r in synthetic_assets(spark, n=12).collect()}
    assert {i: r["kind"] for i, r in rows.items()} == {
        i: r["kind"] for i, r in full.items()
    }
    for i, r in rows.items():
        if r["kind"] == "image":
            assert bytes(r["payload"]) == bytes(full[i]["payload"])
        else:
            assert r["payload"] is None
