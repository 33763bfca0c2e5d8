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
