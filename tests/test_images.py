"""Image-track kernel conformance: dct / image_hash / content_id_image.

This module predates the from-scratch decoders (the decode/resize track is
now fully closed — see tests/test_conformance.py, 43/43); it still pins the
array-math core of the track two ways:

  * constant matrices — a 1×1 transparent/black PNG normalizes to all-zero
    pixels, a white one to all-255 (PIL 'L' + bicubic of a constant is
    constant), and the ``content_id_image`` vectors for those files are
    reproduced exactly;
  * the ``image_normalize`` vectors' *outputs* are real 32×32 matrices for
    the cat test images, and the ``content_id_image`` vectors for the same
    files pin the downstream hash bit-for-bit.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pytest

from iscc_specs_spark.kernel.images import content_id_image, dct, image_hash

_DATA = os.path.join(os.path.dirname(__file__), "fixtures", "test_data.json")


def _vectors():
    with open(_DATA) as f:
        return json.load(f)


def _matrix(outputs):
    return outputs[0] if isinstance(outputs[0][0], list) else outputs


def test_content_id_image_constant_vectors():
    d = _vectors()["content_id_image"]
    zero = [[0] * 32 for _ in range(32)]
    white = [[255] * 32 for _ in range(32)]
    assert content_id_image(zero) == d["test_001_file_image_pixel_png_transp_png"]["outputs"]
    assert content_id_image(zero) == d["test_003_file_image_pixel_png_black_png"]["outputs"]
    assert content_id_image(white) == d["test_002_file_image_pixel_png_white_png"]["outputs"]


@pytest.mark.parametrize(
    "img", ["file_image_cat_jpg", "file_image_cat_png", "file_image_cat_gif"]
)
def test_content_id_image_cat_vectors(img):
    v = _vectors()
    idx = {"file_image_cat_jpg": 1, "file_image_cat_png": 2, "file_image_cat_gif": 3}[img]
    pixels = _matrix(v["image_normalize"][f"test_00{idx}_{img}"]["outputs"])
    want = v["content_id_image"][f"test_00{idx + 3}_{img}"]["outputs"]
    assert content_id_image(pixels) == want


def test_dct_matches_direct_formula():
    """Unscaled DCT-II: X_k = sum_n x_n cos(pi/N (n+0.5) k)."""
    rng = np.random.RandomState(3)
    for n in (2, 4, 8, 32):
        x = rng.rand(n)
        got = np.array(dct(x))
        k = np.arange(n)[:, None]
        nn = np.arange(n)[None, :]
        direct = (np.cos(np.pi / n * (nn + 0.5) * k) * x[None, :]).sum(axis=1)
        assert np.allclose(got, direct, atol=1e-9), n


def _dct_scalar(xs):
    """Independent scalar split-radix recursion (per the published Lee
    decomposition) — must be bit-identical to the batched NumPy version."""
    n = len(xs)
    if n == 1:
        return list(xs)
    half = n // 2
    alpha = [xs[i] + xs[-(i + 1)] for i in range(half)]
    beta = [
        (xs[i] - xs[-(i + 1)]) / (math.cos((i + 0.5) * math.pi / n) * 2.0)
        for i in range(half)
    ]
    alpha, beta = _dct_scalar(alpha), _dct_scalar(beta)
    out = []
    for i in range(half - 1):
        out.append(alpha[i])
        out.append(beta[i] + beta[i + 1])
    out.append(alpha[-1])
    out.append(beta[-1])
    return out


def test_dct_batched_bit_identical_to_scalar():
    rng = np.random.RandomState(5)
    for n in (2, 8, 32):
        x = list(rng.rand(n) * 255)
        assert dct(x) == _dct_scalar(x), n


def test_dct_edge_cases():
    assert dct([7.5]) == [7.5]
    with pytest.raises(ValueError):
        dct([])
    with pytest.raises(ValueError):
        dct([1.0, 2.0, 3.0])


def test_image_hash_is_8_bytes_and_sensitive():
    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, (32, 32))
    h1 = image_hash(base)
    assert len(h1) == 8
    # global brightness shift leaves the DCT structure mostly intact
    shifted = np.clip(base + 10, 0, 255)
    d_small = bin(
        int.from_bytes(h1, "big") ^ int.from_bytes(image_hash(shifted), "big")
    ).count("1")
    other = rng.randint(0, 256, (32, 32))
    d_big = bin(
        int.from_bytes(h1, "big") ^ int.from_bytes(image_hash(other), "big")
    ).count("1")
    assert d_small < d_big


def test_dct_odd_length_raises_at_depth():
    # 24 → 12 → 6 → 3: recursion hits an odd length below the top level and
    # must raise (reference dct contract), never return np.empty garbage
    import numpy as np
    import pytest

    from iscc_specs_spark.kernel.images import image_hash

    with pytest.raises(ValueError):
        image_hash(np.zeros((24, 24)))


def test_image_normalize_golden_vectors_png_gif():
    import json
    from pathlib import Path

    from iscc_specs_spark.kernel.images import image_normalize

    fixtures = Path(__file__).parent / "fixtures"
    vectors = json.loads((fixtures / "test_data.json").read_text())["image_normalize"]
    for name, case in vectors.items():
        if name == "required" or name.endswith("_jpg"):
            continue
        data = (fixtures / case["inputs"][0]).read_bytes()
        assert image_normalize(data) == case["outputs"], name


def test_normalize_is_identity_on_normalized_matrix():
    import json
    from pathlib import Path

    from iscc_specs_spark.kernel.images import image_normalize

    fixtures = Path(__file__).parent / "fixtures"
    vectors = json.loads((fixtures / "test_data.json").read_text())["image_normalize"]
    mat = vectors["test_002_file_image_cat_png"]["outputs"]
    assert image_normalize(mat) == mat


# ---------------------------------------------------------------------------
# PNG unfilter paths (vectorized Sub / list-loop Average+Paeth) + size guard
# ---------------------------------------------------------------------------

def _encode_png_rgb_filtered(mat: np.ndarray, filters: list[int]) -> bytes:
    """Forward-filter an RGB matrix per-row with the given PNG filter types
    (spec §6 encoder side) and wrap it as a real PNG — exercises every
    decoder unfilter branch."""
    import struct
    import zlib

    from iscc_specs_spark.kernel.imagecodec import PNG_MAGIC

    h, w, _ = mat.shape
    bpp = 3
    stride = w * bpp
    flat = mat.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        x = flat[y]
        ft = filters[y % len(filters)]
        f = x.copy()
        if ft == 1:
            for i in range(stride - 1, bpp - 1, -1):
                f[i] = (x[i] - x[i - bpp]) & 0xFF
        elif ft == 2:
            f = (x - prev) & 0xFF
        elif ft == 3:
            for i in range(stride):
                left = x[i - bpp] if i >= bpp else 0
                f[i] = (x[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(stride):
                a = x[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                f[i] = (x[i] - pred) & 0xFF
        raw.append(ft)
        raw.extend(int(v) & 0xFF for v in f)
        prev = x

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_unfilter_all_filter_types_roundtrip():
    from iscc_specs_spark.kernel.imagecodec import decode_png

    rng = np.random.default_rng(7)
    mat = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4], [4, 3, 4, 3]):
        data = _encode_png_rgb_filtered(mat.astype(np.uint8), filters)
        mode, got, pal = decode_png(data)
        assert mode == "RGB" and pal is None
        assert (got == mat).all(), f"filters {filters}"


def test_png_decode_size_guard():
    import struct
    import zlib

    from iscc_specs_spark.kernel.imagecodec import (
        ImageTooLarge,
        PNG_MAGIC,
        decode_png,
    )

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 5000, 5000, 8, 0, 0, 0, 0)
    huge = (
        PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00"))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ImageTooLarge):
        decode_png(huge)


# ---------------------------------------------------------------------------
# GIF sub-frame compositing: background color + transparency classification
# ---------------------------------------------------------------------------

def _mini_gif(bg_index: int, transparent: bool) -> bytes:
    """3×3 logical screen, one 1×1 frame at offset (1,1) with pixel value 3,
    4-entry global color table."""
    import struct

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", 3, 3)
    out += bytes([0x81, bg_index, 0])  # GCT flag, 4 colors; bg; aspect
    out += bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])  # GCT
    if transparent:
        out += bytes([0x21, 0xF9, 0x04, 0x01, 0, 0, 0, 0x00])  # GCE
    out += b"\x2c" + struct.pack("<HHHH", 1, 1, 1, 1) + bytes([0])
    # LZW min code size 2; stream = clear(4), literal 3, end(5) at 3 bits
    # LSB-first: 4 | 3<<3 | 5<<6 = 348 → 0x5C 0x01
    out += bytes([2, 2, 0x5C, 0x01, 0x00])
    out += b"\x3b"
    return bytes(out)


def test_gif_subframe_background_fill():
    from iscc_specs_spark.kernel.imagecodec import decode_gif

    mode, idx, pal = decode_gif(_mini_gif(bg_index=2, transparent=False))
    assert mode == "P" and pal.shape == (4, 3)
    want = np.full((3, 3), 2, dtype=np.uint8)
    want[1, 1] = 3
    assert (idx == want).all()

    # out-of-palette background index falls back to 0
    _, idx0, _ = decode_gif(_mini_gif(bg_index=200, transparent=False))
    want0 = np.zeros((3, 3), dtype=np.uint8)
    want0[1, 1] = 3
    assert (idx0 == want0).all()


def test_gif_transparent_subframe_classified():
    from iscc_specs_spark.kernel.imagecodec import decode_gif

    with pytest.raises(NotImplementedError):
        decode_gif(_mini_gif(bg_index=0, transparent=True))


def test_gif_size_guard():
    import struct

    from iscc_specs_spark.kernel.imagecodec import ImageTooLarge, decode_gif

    data = b"GIF89a" + struct.pack("<HH", 5000, 5000) + bytes([0, 0, 0])
    with pytest.raises(ImageTooLarge):
        decode_gif(data + b"\x3b")


def test_png_adam7_interlaced_roundtrip():
    """Adam7 interlaced PNG decodes bit-identically to the same image
    stored progressively (pass split → per-pass filter-0 scanlines →
    shared zlib stream, per PNG spec §8.2)."""
    import struct
    import zlib

    from iscc_specs_spark.kernel.imagecodec import (
        PNG_MAGIC,
        _ADAM7,
        decode_png,
    )

    rng = np.random.default_rng(11)
    # deliberately awkward dims (not multiples of 8) to hit empty/ragged
    # passes
    for h, w in ((13, 9), (1, 1), (5, 17), (8, 8)):
        mat = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = mat[y0::dy, x0::dx]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue
            for r in range(ph):
                raw.append(0)  # filter type None
                raw.extend(sub[r].tobytes())

        def chunk(typ, body):
            return (
                struct.pack(">I", len(body)) + typ + body
                + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)  # interlace=1
        data = (
            PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )
        mode, got, _ = decode_png(data)
        assert mode == "RGB"
        assert (got == mat).all(), (h, w)


def test_encode_gif_gray_roundtrip_exact():
    """GIF is lossless: encode → decode → to_grayscale is the identity for
    any matrix shape (incl. >250-pixel rows that cross LZW CLEAR resets)."""
    from iscc_specs_spark.kernel.imagecodec import decode_image, encode_gif_gray
    from iscc_specs_spark.kernel.images import to_grayscale

    for shape in [(1, 1), (33, 47), (64, 64), (257, 3)]:
        mat = (np.arange(shape[0] * shape[1]) % 256).astype(np.uint8).reshape(shape)
        mode, pixels, pal = decode_image(encode_gif_gray(mat))
        assert mode == "P"
        assert (to_grayscale(mode, pixels, pal) == mat).all(), shape


def test_encode_jpeg_gray_roundtrip_tight_and_deterministic():
    """Grayscale baseline synthesis: quant=1 leaves only DCT rounding
    (|err| <= 1), and decode is byte-deterministic."""
    from iscc_specs_spark.kernel.jpegcodec import decode_jpeg, encode_jpeg_gray

    y, x = np.mgrid[0:37, 0:52]
    mat = ((x * 4 + y * 7) % 256).astype(np.uint8)
    data = encode_jpeg_gray(mat)
    mode, got, _ = decode_jpeg(data)
    assert mode == "L" and got.shape == mat.shape
    err = np.abs(got.astype(int) - mat.astype(int))
    assert err.max() <= 1, err.max()
    assert (decode_jpeg(data)[1] == got).all()
