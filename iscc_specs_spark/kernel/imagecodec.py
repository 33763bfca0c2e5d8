"""Deterministic pure-stdlib decoders for PNG, GIF and JPEG.

Implements the image formats from their public specifications so
``image_normalize`` (reference iscc.py:214-228) can run end-to-end on the
golden-vector fixtures without any codec library:

* PNG per the W3C PNG specification (RFC 2083): chunk parsing, zlib
  inflate of IDAT, scanline unfiltering (None/Sub/Up/Average/Paeth),
  bit depth 8, color types 0/2/3/4/6, progressive and Adam7-interlaced.
* GIF87a/89a per the GIF specification: logical screen descriptor,
  global/local color tables, LZW decompression, first image frame,
  including the interlaced row order.
* JPEG per ITU-T T.81 baseline + progressive (kernel/jpegcodec.py): the
  spec warns IDCT rounding is implementation-defined (reference
  docs/specification.md:243-244), so the decoder pins ONE deterministic
  choice — the integer fixed-point "islow" IDCT + fixed-point YCbCr
  algorithms that libjpeg's integer paths define — which reproduces the
  PIL-produced golden vectors bit-for-bit (tests/test_conformance.py,
  43/43 including both JPEG-input cases).

Returned pixels are ``(mode, np.ndarray)``: mode in {"L", "LA", "RGB",
"RGBA", "P"}; array is H×W (L/P) or H×W×C uint8.  "P" additionally
returns the palette as an (N, 3) uint8 array.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
GIF_MAGICS = (b"GIF87a", b"GIF89a")
JPEG_MAGIC = b"\xff\xd8\xff"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_MODE = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}


def sniff(data: bytes) -> str:
    if data[:8] == PNG_MAGIC:
        return "png"
    if data[:6] in GIF_MAGICS:
        return "gif"
    if data[:3] == JPEG_MAGIC:
        return "jpeg"
    return "unknown"


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

# decode-size guard: an Arrow-batched executor task must never stall for
# minutes inside one image's sequential filter pass; larger payloads are
# classified (decode_status 'too_large'), not decoded. 16M pixels covers
# 4096×4096 / full-frame 16 MP web images.
MAX_DECODE_PIXELS = 16_000_000


class ImageTooLarge(NotImplementedError):
    """Payload exceeds MAX_DECODE_PIXELS — classified, never decoded."""


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering (PNG spec §6). Returns (H, W*bpp) uint8.

    Sub is an exact per-channel prefix sum (mod 256 distributes over
    cumsum), fully vectorized; Up is vectorized; Average/Paeth carry a true
    sequential dependence along the scanline, so they run as Python-int
    list loops (≈4× faster than per-byte NumPy scalar indexing — no array
    boxing in the hot loop) bounded by MAX_DECODE_PIXELS upstream."""
    stride = width * bpp
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    prev_l: list[int] | None = None  # lazy list mirror of prev
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(
            np.int32
        )
        pos += stride
        if ftype == 0:  # None
            cur = line
            prev_l = None
        elif ftype == 1:  # Sub: per-channel prefix sum mod 256
            cur = (
                line.reshape(width, bpp).cumsum(axis=0, dtype=np.int64) & 0xFF
            ).astype(np.int32).reshape(stride)
            prev_l = None
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
            prev_l = None
        elif ftype == 3:  # Average
            x = line.tolist()
            pv = prev_l if prev_l is not None else prev.tolist()
            c = x[:]
            for i in range(stride):
                left = c[i - bpp] if i >= bpp else 0
                c[i] = (c[i] + ((left + pv[i]) >> 1)) & 0xFF
            cur = np.asarray(c, dtype=np.int32)
            prev_l = c
        elif ftype == 4:  # Paeth
            x = line.tolist()
            pv = prev_l if prev_l is not None else prev.tolist()
            c = x[:]
            for i in range(stride):
                a = c[i - bpp] if i >= bpp else 0
                b = pv[i]
                cc = pv[i - bpp] if i >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                c[i] = (c[i] + pred) & 0xFF
            cur = np.asarray(c, dtype=np.int32)
            prev_l = c
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


# Adam7 interlace passes: (x0, y0, dx, dy) per PNG spec §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def decode_png(data: bytes):
    """→ (mode, pixels, palette|None). Bit depth 8; Adam7 interlacing
    supported (lossless pass reassembly — bit-identical to a progressive
    decoder's final output)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat, palette = 8, [], None
    width = height = bitdepth = colortype = interlace = None
    while pos < len(data):
        ln, typ = struct.unpack(">I4s", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            width, height, bitdepth, colortype, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif typ == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3).copy()
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
    if bitdepth != 8:
        raise NotImplementedError(f"PNG bit depth {bitdepth} (only 8 supported)")
    if width * height > MAX_DECODE_PIXELS:
        raise ImageTooLarge(f"PNG {width}x{height} exceeds decode-size guard")
    if colortype not in _PNG_CHANNELS:
        raise ValueError(f"unknown PNG color type {colortype}")
    bpp = _PNG_CHANNELS[colortype]
    if interlace:
        # Adam7: seven independently-filtered sub-images, scattered back
        # onto the full canvas (PNG spec §8.2)
        passes = [
            (x0, y0, dx, dy,
             (width - x0 + dx - 1) // dx, (height - y0 + dy - 1) // dy)
            for x0, y0, dx, dy in _ADAM7
        ]
        want = sum(ph * (pw * bpp + 1) for *_, pw, ph in passes if pw and ph)
        raw = zlib.decompressobj().decompress(b"".join(idat), want)
        mat = np.zeros((height, width * bpp), dtype=np.uint8).reshape(
            height, width, bpp
        )
        off = 0
        for x0, y0, dx, dy, pw, ph in passes:
            if pw == 0 or ph == 0:
                continue
            size = ph * (pw * bpp + 1)
            sub = _png_unfilter(raw[off:off + size], pw, ph, bpp)
            off += size
            mat[y0::dy, x0::dx] = sub.reshape(ph, pw, bpp)
        mat = mat.reshape(height, width * bpp)
    else:
        # cap inflate output at the exact raw size the (guarded) IHDR dims
        # imply — a crafted IDAT cannot expand past it (zlib-bomb guard)
        want = height * (width * bpp + 1)
        raw = zlib.decompressobj().decompress(b"".join(idat), want)
        mat = _png_unfilter(raw, width, height, bpp)
    mode = _PNG_MODE[colortype]
    if bpp > 1:
        mat = mat.reshape(height, width, bpp)
    return mode, mat, palette


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------

def _lzw_decode(
    min_code_size: int, data: bytes, max_out: int | None = None
) -> bytes:
    """GIF LZW decompression (GIF89a spec appendix F)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # bit reader, LSB first
    bitpos = 0
    nbits = len(data) * 8

    def read(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return end
        byte0 = bitpos >> 3
        val = int.from_bytes(
            data[byte0 : byte0 + ((bitpos % 8) + width + 7) // 8 + 1], "little"
        )
        val = (val >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return val

    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1

    width = min_code_size + 1
    reset()
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            reset()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        if max_out is not None and len(out) >= max_out:
            # frame fully decoded (or bomb): never inflate past the
            # guarded frame size
            return bytes(out[:max_out])
        if len(table) >= (1 << width) and width < 12:
            width += 1
    return bytes(out)


def decode_gif(data: bytes):
    """→ ("P", pixels H×W uint8, palette (N,3) uint8) — first frame."""
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF")
    sw, sh = struct.unpack("<HH", data[6:10])
    if sw * sh > MAX_DECODE_PIXELS:
        raise ImageTooLarge(f"GIF {sw}x{sh} exceeds decode-size guard")
    packed = data[10]
    # logical-screen background color index (header byte 11): the fill for
    # canvas area an offset sub-frame leaves uncovered
    bg_index = data[11]
    pos = 13
    gct = None
    transparent = False
    if packed >> 7:
        n = 2 << (packed & 7)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(
            -1, 3
        ).copy()
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks
            if data[pos + 1] == 0xF9 and data[pos + 2] >= 4:
                # Graphic Control Extension: bit 0 of the packed field is
                # the transparent-color flag
                transparent = bool(data[pos + 3] & 1)
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            left, top, w, h = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
            if w * h > MAX_DECODE_PIXELS:
                raise ImageTooLarge(
                    f"GIF frame {w}x{h} exceeds decode-size guard"
                )
            ipacked = data[pos + 9]
            pos += 10
            palette = gct
            if ipacked >> 7:  # local color table
                n = 2 << (ipacked & 7)
                palette = np.frombuffer(
                    data, dtype=np.uint8, count=3 * n, offset=pos
                ).reshape(-1, 3).copy()
                pos += 3 * n
            interlaced = bool((ipacked >> 6) & 1)
            min_code_size = data[pos]
            pos += 1
            chunks = []
            while data[pos]:
                ln = data[pos]
                chunks.append(data[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(min_code_size, b"".join(chunks), max_out=w * h),
                dtype=np.uint8,
            ).reshape(h, w)
            if interlaced:
                deinter = np.empty_like(idx)
                rows = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                deinter[rows] = idx
                idx = deinter
            if (left, top, w, h) != (0, 0, sw, sh):
                if transparent:
                    # compositing a transparent sub-frame against the
                    # background is decoder-version-dependent — classify
                    # instead of guessing (determinism claim stays tight)
                    raise NotImplementedError(
                        "transparent offset GIF sub-frame"
                    )
                # uncovered canvas takes the declared background color
                # (falling back to 0 when the index is out of palette range)
                fill = (
                    bg_index
                    if palette is not None and bg_index < len(palette)
                    else 0
                )
                canvas = np.full((sh, sw), fill, dtype=np.uint8)
                canvas[top : top + h, left : left + w] = idx
                idx = canvas
            if palette is None:
                raise ValueError("GIF frame without color table")
            return "P", idx, palette
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image frame")


def decode_image(data: bytes):
    """bytes → (mode, pixels, palette|None)."""
    kind = sniff(data)
    if kind == "png":
        return decode_png(data)
    if kind == "gif":
        return decode_gif(data)
    if kind == "jpeg":
        from iscc_specs_spark.kernel.jpegcodec import decode_jpeg

        return decode_jpeg(data)
    raise ValueError("unrecognized image format")


def encode_png_gray(pixels: np.ndarray, compress_level: int = 6) -> bytes:
    """Minimal deterministic grayscale PNG writer (filter 0 scanlines +
    zlib) — used to synthesize real decodable image payloads for tests and
    benchmarks; a pure function of the pixel matrix."""
    mat = np.asarray(pixels, dtype=np.uint8)
    if mat.ndim != 2:
        raise ValueError("encode_png_gray expects a 2-D grayscale matrix")
    h, w = mat.shape

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + mat[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, compress_level))
        + chunk(b"IEND", b"")
    )


def encode_gif_gray(pixels: np.ndarray) -> bytes:
    """Minimal deterministic grayscale GIF89a writer (256-entry gray global
    color table, one frame, fixed-width 9-bit LZW literal codes with a
    CLEAR reset every 250 pixels so the code width never grows) — like
    :func:`encode_png_gray`, a pure function of the pixel matrix used to
    synthesize real decodable payloads; GIF is lossless so the round-trip
    through :func:`decode_gif` is exact."""
    mat = np.asarray(pixels, dtype=np.uint8)
    if mat.ndim != 2:
        raise ValueError("encode_gif_gray expects a 2-D grayscale matrix")
    h, w = mat.shape
    gct = bytes(v for i in range(256) for v in (i, i, i))
    return (
        b"GIF89a"
        + struct.pack("<HH", w, h)
        + bytes([0xF7, 0, 0])  # 256-entry GCT, bg 0, no aspect
        + gct
        + _gif_frame_blob(mat)
        + b"\x3b"
    )


def _gif_frame_blob(mat: np.ndarray) -> bytes:
    """Full-frame image descriptor + literal-only LZW stream for one frame.

    Literal-only LZW: every pixel is a 9-bit root code; the decoder's
    table grows by one per code after a CLEAR, so resetting every 250
    codes keeps the table below 512 entries (width stays 9 bits)."""
    h, w = mat.shape
    clear, end = 256, 257
    bits = bytearray()
    acc = since_clear = 0
    nacc = 0

    def put(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc  # LSB-first bit packing (GIF89a appendix F)
        nacc += 9
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    put(clear)
    for px in mat.reshape(-1).tolist():
        if since_clear == 250:
            put(clear)
            since_clear = 0
        put(px)
        since_clear += 1
    put(end)
    if nacc:
        bits.append(acc & 0xFF)

    sub_blocks = b"".join(
        bytes([len(bits[i : i + 255])]) + bytes(bits[i : i + 255])
        for i in range(0, len(bits), 255)
    )
    return (
        b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        + bytes([8])  # LZW min code size
        + sub_blocks
        + b"\x00"
    )


def encode_gif_gray_frames(
    frames: list[np.ndarray], delay_ms: int = 100
) -> bytes:
    """Animated grayscale GIF89a writer: one full-frame image per entry
    with a Graphic Control Extension carrying ``delay_ms`` (rounded to the
    GIF centisecond grid) and disposal 'do not dispose' — the payload
    synthesis twin of :func:`decode_gif_frames`. Lossless per frame."""
    if not frames:
        raise ValueError("encode_gif_gray_frames needs at least one frame")
    mats = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = mats[0].shape
    if any(m.shape != (h, w) for m in mats):
        raise ValueError("all frames must share one shape")
    gct = bytes(v for i in range(256) for v in (i, i, i))
    gce = (
        b"\x21\xf9\x04"
        + bytes([0x04])  # disposal=1 (do not dispose), no transparency
        + struct.pack("<H", max(delay_ms // 10, 1))
        + b"\x00\x00"
    )
    return (
        b"GIF89a"
        + struct.pack("<HH", w, h)
        + bytes([0xF7, 0, 0])
        + gct
        + b"".join(gce + _gif_frame_blob(m) for m in mats)
        + b"\x3b"
    )


def decode_gif_frames(
    data: bytes, max_frames: int = 256
) -> tuple[list[np.ndarray], np.ndarray, list[int]]:
    """→ (canvas snapshots [H×W uint8 indices], global palette (N,3),
    per-frame delays in ms) — the multi-frame sibling of
    :func:`decode_gif` for animation sampling.

    Coalescing semantics: each frame renders onto the running canvas
    (disposal 'none'/'do not dispose'); disposal 'restore to background'
    refills the frame rect with the background index afterwards. Honest
    scope limits (classified, never guessed): per-frame local color
    tables, transparency, interlaced animation frames and disposal
    'restore previous' raise NotImplementedError — the deterministic
    synthesis path (encode_gif_gray_frames) never emits them, and wild
    GIFs using them classify as 'unsupported' in the operators layer.
    """
    if data[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF")
    sw, sh = struct.unpack("<HH", data[6:10])
    if sw * sh > MAX_DECODE_PIXELS:
        raise ImageTooLarge(f"GIF {sw}x{sh} exceeds decode-size guard")
    packed = data[10]
    bg_index = data[11]
    pos = 13
    gct = None
    if packed >> 7:
        n = 2 << (packed & 7)
        gct = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos).reshape(
            -1, 3
        ).copy()
        pos += 3 * n
    if gct is None:
        raise ValueError("animated GIF without a global color table")

    fill = bg_index if bg_index < len(gct) else 0
    canvas = np.full((sh, sw), fill, dtype=np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    delay_ms = 0
    disposal = 0
    while pos < len(data):
        block = data[pos]
        if block == 0x21:
            if data[pos + 1] == 0xF9 and data[pos + 2] >= 4:
                gpacked = data[pos + 3]
                if gpacked & 1:
                    raise NotImplementedError("transparent animation frame")
                disposal = (gpacked >> 2) & 7
                if disposal == 3:
                    raise NotImplementedError("GIF disposal 'restore previous'")
                delay_ms = struct.unpack("<H", data[pos + 4 : pos + 6])[0] * 10
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:
            left, top, w, h = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
            ipacked = data[pos + 9]
            pos += 10
            if ipacked >> 7:
                raise NotImplementedError("per-frame local color table")
            if (ipacked >> 6) & 1:
                raise NotImplementedError("interlaced animation frame")
            min_code_size = data[pos]
            pos += 1
            chunks = []
            while data[pos]:
                ln = data[pos]
                chunks.append(data[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(min_code_size, b"".join(chunks), max_out=w * h),
                dtype=np.uint8,
            ).reshape(h, w)
            canvas[top : top + h, left : left + w] = idx
            frames.append(canvas.copy())
            delays.append(delay_ms)
            if disposal == 2:  # restore frame rect to background
                canvas[top : top + h, left : left + w] = fill
            delay_ms = 0
            disposal = 0
            if len(frames) >= max_frames:
                break
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    if not frames:
        raise ValueError("GIF contains no image frame")
    return frames, gct, delays
