"""JPEG decoder coverage beyond the golden fixture.

The conformance fixture is a progressive 4:4:4 JPEG (pinned bit-for-bit in
test_conformance.py / test_multimodal.py); these tests cover the other
decode paths — baseline (SOF0) entropy coding, 4:2:0 / 4:2:2 chroma
subsampling + fancy upsampling, and restart markers — via a minimal
spec-side encoder (T.81 Annex B/F structures with flat Huffman tables:
every DC symbol at 4 bits, every AC RS symbol at 9 bits, which any
compliant decoder must handle). Round-trips are lossy (DCT quantization +
chroma subsampling), so assertions are tolerance-based; determinism is
asserted exactly.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from iscc_specs_spark.kernel.jpegcodec import ZIGZAG, decode_jpeg


# ---------------------------------------------------------------------------
# minimal encoder (test-side only)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, bits: int) -> None:
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.put(1, 1)  # pad with 1-bits per spec


def _fdct(block: np.ndarray) -> np.ndarray:
    """Float DCT-II with JPEG scaling (T.81 A.3.3)."""
    n = 8
    k = np.arange(n)
    cosines = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / (2 * n))
    c = np.full(n, np.sqrt(2 / n))
    c[0] = np.sqrt(1 / n)
    m = cosines * c[:, None]
    return m @ block @ m.T


def _mag(v: int) -> tuple[int, int]:
    """(size, raw bits) for a coefficient value (F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def encode_jpeg(rgb: np.ndarray, samp: tuple[int, int] = (1, 1),
                quant_val: int = 1, restart: int = 0) -> bytes:
    """Baseline JFIF with flat quant tables (all = quant_val), flat Huffman
    tables, optional chroma subsampling (samp = (h, v) of luma relative to
    chroma, i.e. (2, 2) = 4:2:0) and optional restart interval."""
    h, w, _ = rgb.shape
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128

    hs, vs = samp
    planes = [np.clip(np.round(y), 0, 255)]
    for ch in (cb, cr):
        if hs == 2 or vs == 2:
            ph = -(-h // vs) * vs
            pw = -(-w // hs) * hs
            p = np.pad(ch, ((0, ph - h), (0, pw - w)), mode="edge")
            p = p.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))
        else:
            p = ch
        planes.append(np.clip(np.round(p), 0, 255))

    # pad every plane to its MCU-aligned block grid
    mcus_w = -(-w // (8 * hs))
    mcus_h = -(-h // (8 * vs))
    dims = [(hs, vs), (1, 1), (1, 1)]
    padded = []
    for p, (ch_, cv_) in zip(planes, dims):
        bw, bh = mcus_w * ch_, mcus_h * cv_
        pp = np.pad(
            p,
            ((0, bh * 8 - p.shape[0]), (0, bw * 8 - p.shape[1])),
            mode="edge",
        )
        padded.append(pp)

    quant = np.full(64, quant_val, dtype=np.int32)

    def blk(plane, by, bx):
        cells = plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
        coef = np.round(_fdct(cells) / quant_val).astype(np.int32)
        # natural-order 64-vector → zigzag scan order (z[k] = nat[ZIGZAG[k]])
        return coef.reshape(64)[ZIGZAG]

    bw_ = _BitWriter()
    preds = [0, 0, 0]
    mcu_count = 0
    to_restart = restart
    rst_idx = 0
    for my in range(mcus_h):
        for mx in range(mcus_w):
            if restart and mcu_count and to_restart == 0:
                bw_.flush()
                bw_.out += bytes([0xFF, 0xD0 + (rst_idx & 7)])
                rst_idx += 1
                preds = [0, 0, 0]
                to_restart = restart
            if restart:
                to_restart -= 1
            mcu_count += 1
            for ci, (p, (ch_, cv_)) in enumerate(zip(padded, dims)):
                for byy in range(cv_):
                    for bxx in range(ch_):
                        z = blk(p, my * cv_ + byy, mx * ch_ + bxx)
                        diff = int(z[0]) - preds[ci]
                        preds[ci] = int(z[0])
                        s, bits = _mag(diff)
                        bw_.put(s, 4)          # flat DC code: symbol itself
                        if s:
                            bw_.put(bits, s)
                        run = 0
                        last = 63
                        while last > 0 and z[last] == 0:
                            last -= 1
                        for k in range(1, last + 1):
                            v = int(z[k])
                            if v == 0:
                                run += 1
                                if run == 16:
                                    bw_.put(0xF0, 9)  # ZRL
                                    run = 0
                                continue
                            s, bits = _mag(v)
                            bw_.put((run << 4) | s, 9)
                            bw_.put(bits, s)
                            run = 0
                        if last < 63:
                            bw_.put(0x00, 9)  # EOB
    bw_.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0]) + bytes(quant[ZIGZAG].tolist()))
    sof = seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
        + bytes([1, (hs << 4) | vs, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    # flat Huffman tables: DC = 12 symbols at 4 bits; AC = symbols 0..254
    # at 9 bits (code == symbol; 0xFF = run-15/size-15 is never emitted)
    dc_counts = [0] * 16
    dc_counts[3] = 12
    ac_counts = [0] * 16
    ac_counts[8] = 255
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(dc_counts) + bytes(range(12))
        + bytes([0x10]) + bytes(ac_counts) + bytes(range(255)),
    )
    dri = seg(0xDD, struct.pack(">H", restart)) if restart else b""
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof + dht + dri + sos
        + bytes(bw_.out) + b"\xff\xd9"
    )


def _test_image(h: int = 37, w: int = 52) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 4 + yy) % 256
    g = (128 + 60 * np.sin(xx / 5.0) + 40 * np.cos(yy / 7.0))
    b = (xx + yy * 3) % 256
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


@pytest.mark.parametrize(
    "samp,name", [((1, 1), "444"), ((2, 2), "420"), ((2, 1), "422")]
)
def test_baseline_roundtrip(samp, name):
    img = _test_image()
    data = encode_jpeg(img, samp=samp)
    mode, got, _ = decode_jpeg(data)
    assert mode == "RGB" and got.shape == img.shape
    err = np.abs(got.astype(int) - img.astype(int))
    # quant=1: only DCT rounding + color round-trip (tight); subsampled
    # chroma adds error on chroma gradients (looser)
    limit = 6 if samp == (1, 1) else 40
    assert err.mean() < (2 if samp == (1, 1) else 8), (name, err.mean())
    assert err.max() <= limit, (name, err.max())
    # determinism: byte-identical decode on every call
    assert (decode_jpeg(data)[1] == got).all()


def test_baseline_restart_markers():
    img = _test_image(24, 64)
    plain = decode_jpeg(encode_jpeg(img))[1]
    with_rst = decode_jpeg(encode_jpeg(img, restart=2))[1]
    # restart markers change the entropy stream layout, not the pixels
    assert (plain == with_rst).all()


def test_grayscale_and_errors():
    from iscc_specs_spark.kernel.imagecodec import ImageTooLarge

    # truncated / garbage streams classify, never hang
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0junk")
    # size guard applies to JPEG too
    sof = (
        b"\xff\xd8"
        + b"\xff\xc0" + struct.pack(">H", 17)
        + bytes([8]) + struct.pack(">HH", 5000, 5000) + bytes([3])
        + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
    )
    with pytest.raises(ImageTooLarge):
        decode_jpeg(sof + b"\xff\xd9")
