"""Deterministic WAV (RIFF PCM) codec — pure stdlib+NumPy.

The uncompressed-audio sibling of the image codecs (imagecodec.py,
jpegcodec.py): a from-scratch RIFF/WAVE parser for linear PCM (format tag
1, 8-bit unsigned / 16-bit signed little-endian, any channel count) plus a
matching writer used to synthesize real decodable payloads. Everything is
a pure function of the input bytes — no resampling, no float DSP — so the
audio sampling track carries the same determinism guarantee as the image
track. Compressed codecs (MP3/AAC/...) are out of scope here and classify
as unsupported in the operators layer (no codec libraries in this
environment).

Reference scope note: the reference (iscc/iscc-specs) delegates all media
decode to external libraries (PIL for images; audio/video are not in its
v1.0.5 code at all) — this module exists for the engine's multimodal
training-data surface, not for ISCC conformance.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_DECODE_SAMPLES = 64_000_000  # frames × channels guard (≈128 MB int16)


class AudioTooLarge(NotImplementedError):
    """Payload exceeds MAX_DECODE_SAMPLES — classified, never decoded
    (the audio sibling of imagecodec.ImageTooLarge)."""


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """bytes → (sample_rate, samples (n_frames, channels) int16).

    8-bit PCM (unsigned) is widened to int16 ((x − 128) << 8) so callers
    see one dtype; 16-bit is returned as stored. Truncated data chunks
    decode the complete frames present (a crawl WILL contain cut-off
    files); structural corruption raises ValueError.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            payload = body
            break  # data is the last chunk we need; trailing chunks ignored
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, channels, rate, _byte_rate, _block_align, bits = fmt
    if tag != 1:
        raise NotImplementedError(f"WAV format tag {tag} (only PCM=1)")
    if channels < 1 or rate < 1:
        raise ValueError("WAV fmt declares zero channels or rate")
    if bits == 16:
        n = len(payload) // (2 * channels)
        if n * channels > MAX_DECODE_SAMPLES:
            raise AudioTooLarge("WAV exceeds decode-size guard")
        samples = np.frombuffer(
            payload, dtype="<i2", count=n * channels
        ).reshape(n, channels).astype(np.int16)
    elif bits == 8:
        n = len(payload) // channels
        if n * channels > MAX_DECODE_SAMPLES:
            raise AudioTooLarge("WAV exceeds decode-size guard")
        raw = np.frombuffer(payload, dtype=np.uint8, count=n * channels)
        samples = (
            (raw.astype(np.int16) - 128) << 8
        ).reshape(n, channels)
    else:
        raise NotImplementedError(f"WAV {bits}-bit PCM (only 8/16)")
    return rate, samples


def encode_wav_pcm8(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames,) or (n_frames, channels) uint8 → canonical RIFF bytes
    (unsigned 8-bit PCM, the historical WAV convention decode_wav widens
    to int16 as ((x − 128) << 8)) — a pure function of the inputs."""
    mat = np.asarray(samples, dtype=np.uint8)
    if mat.ndim == 1:
        mat = mat[:, None]
    if mat.ndim != 2:
        raise ValueError("encode_wav_pcm8 expects (n,) or (n, channels)")
    n, channels = mat.shape
    body = mat.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels, channels, 8,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames,) or (n_frames, channels) int16 → canonical RIFF bytes
    (fmt + data, no extra chunks) — a pure function of the inputs."""
    mat = np.asarray(samples, dtype="<i2")
    if mat.ndim == 1:
        mat = mat[:, None]
    if mat.ndim != 2:
        raise ValueError("encode_wav_pcm16 expects (n,) or (n, channels)")
    n, channels = mat.shape
    body = mat.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
