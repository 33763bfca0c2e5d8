"""Deterministic baseline + progressive JPEG decoder (pure stdlib+NumPy).

Clean-room implementation from public specifications: entropy coding and
scan structure per ITU-T T.81 (§F sequential, §G progressive with spectral
selection + successive approximation), inverse DCT per the widely published
integer "islow" algorithm (Loeffler-Ligtenberg-Moshovitz with 13-bit
fixed-point constants — the algorithm libjpeg documents in jidctint.c) and
the standard 16-bit fixed-point YCbCr→RGB conversion (CCIR 601-1 constants,
libjpeg jdcolor.c algorithm).  No reference code is copied; the reference
implementation (src/iscc/iscc.py:214-228) delegates JPEG decode to PIL.

Why integer fixed-point throughout: the ISCC image track's conformance is
bit-for-bit, and PIL's golden vectors were produced by libjpeg's integer
paths — a float IDCT or float color convert would be off by ±1 LSB on a few
pixels, which the downstream DCT hash amplifies.  Every rounding step here
(DESCALE, table-based color convert, fancy-upsample rounding) follows the
same fixed-point arithmetic those integer paths define.

Scope: 8-bit Huffman JPEGs, baseline (SOF0/SOF1) and progressive (SOF2),
grayscale / YCbCr, 1x1 / 2x1 / 2x2 subsampling (triangular "fancy"
upsampling); arithmetic coding, 12-bit precision, and lossless modes raise
NotImplementedError.  Size-guarded by imagecodec.MAX_DECODE_PIXELS.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index k (scan order) → natural (raster) index, T.81 Figure A.6
ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# 13-bit fixed-point IDCT constants (islow algorithm)
_CONST_BITS = 13
_PASS1_BITS = 2
_F_0_298631336 = 2446
_F_0_390180644 = 3196
_F_0_541196100 = 4433
_F_0_765366865 = 6270
_F_0_899976223 = 7373
_F_1_175875602 = 9633
_F_1_501321110 = 12299
_F_1_847759065 = 15137
_F_1_961570560 = 16069
_F_2_053119869 = 16819
_F_2_562915447 = 20995
_F_3_072711026 = 25172


def _descale(x: np.ndarray, n: int) -> np.ndarray:
    return (x + (1 << (n - 1))) >> n


def idct_islow_blocks(coef: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Integer islow IDCT over a batch of blocks.

    coef: (n, 8, 8) int32 natural-order coefficients; quant: (8, 8) int32
    natural-order quantizer.  Returns (n, 8, 8) uint8 samples (level-shifted
    +128, clamped) — bit-identical to the scalar fixed-point algorithm.
    """
    d = coef.astype(np.int64) * quant.astype(np.int64)[None, :, :]

    def pass_core(i0, i1, i2, i3, i4, i5, i6, i7, shift_even):
        # even part
        z2, z3 = i2, i6
        z1 = (z2 + z3) * _F_0_541196100
        tmp2 = z1 + z3 * (-_F_1_847759065)
        tmp3 = z1 + z2 * _F_0_765366865
        za, zb = i0, i4
        tmp0 = (za + zb) << shift_even
        tmp1 = (za - zb) << shift_even
        tmp10, tmp13 = tmp0 + tmp3, tmp0 - tmp3
        tmp11, tmp12 = tmp1 + tmp2, tmp1 - tmp2
        # odd part
        t0, t1, t2, t3 = i7, i5, i3, i1
        z1 = t0 + t3
        z2 = t1 + t2
        z3 = t0 + t2
        z4 = t1 + t3
        z5 = (z3 + z4) * _F_1_175875602
        t0 = t0 * _F_0_298631336
        t1 = t1 * _F_2_053119869
        t2 = t2 * _F_3_072711026
        t3 = t3 * _F_1_501321110
        z1 = z1 * (-_F_0_899976223)
        z2 = z2 * (-_F_2_562915447)
        z3 = z3 * (-_F_1_961570560) + z5
        z4 = z4 * (-_F_0_390180644) + z5
        t0 = t0 + z1 + z3
        t1 = t1 + z2 + z4
        t2 = t2 + z2 + z3
        t3 = t3 + z1 + z4
        return (tmp10 + t3, tmp11 + t2, tmp12 + t1, tmp13 + t0,
                tmp13 - t0, tmp12 - t1, tmp11 - t2, tmp10 - t3)

    # pass 1: columns (operate on rows axis), results scaled by PASS1_BITS
    cols = [d[:, k, :] for k in range(8)]
    out1 = pass_core(*cols, _CONST_BITS)
    ws = [_descale(v, _CONST_BITS - _PASS1_BITS) for v in out1]

    # pass 2: rows (operate on cols axis of the workspace)
    wsm = np.stack(ws, axis=1)  # (n, 8row, 8col)
    rows = [wsm[:, :, k] for k in range(8)]
    out2 = pass_core(*rows, _CONST_BITS)
    res = [
        _descale(v, _CONST_BITS + _PASS1_BITS + 3) + 128 for v in out2
    ]
    pix = np.stack(res, axis=2)  # (n, 8, 8)
    return np.clip(pix, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# entropy decoding
# ---------------------------------------------------------------------------

class _HuffTable:
    __slots__ = ("lookup", "maxlen")

    def __init__(self, counts: bytes, values: bytes):
        # canonical Huffman: codes assigned in order of increasing length
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        vi = 0
        maxlen = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = values[vi]
                vi += 1
                code += 1
                maxlen = length
            code <<= 1
        self.maxlen = maxlen


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with 0xFF00
    byte-stuffing removal; stops (pads zero bits) at any marker."""

    __slots__ = ("data", "pos", "acc", "nbits", "end")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.end = False

    def _fill(self) -> None:
        d = self.data
        p = self.pos
        if self.end or p >= len(d):
            self.acc = (self.acc << 8) & 0xFFFFFFFF
            self.nbits += 8
            self.end = True
            return
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos = p + 2
            else:
                # marker: end of this entropy segment
                self.end = True
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                return
        else:
            self.pos = p + 1
        self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
        self.nbits += 8

    def get_bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def get_bit(self) -> int:
        return self.get_bits(1)

    def decode(self, table: _HuffTable) -> int:
        length = 0
        code = 0
        lk = table.lookup
        while length < 16:
            code = (code << 1) | self.get_bit()
            length += 1
            v = lk.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code")

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0

    def at_restart(self) -> bool:
        return (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        )

    def skip_restart(self) -> None:
        self.align()
        if self.at_restart():
            self.pos += 2
            self.end = False


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _Component:
    __slots__ = ("cid", "h", "v", "tq", "dc_tab", "ac_tab",
                 "bw", "bh", "bw_alloc", "bh_alloc", "coef", "pred")

    def __init__(self, cid: int, h: int, v: int, tq: int):
        self.cid, self.h, self.v, self.tq = cid, h, v, tq
        self.pred = 0


def decode_jpeg(data: bytes):
    """→ ("L"|"RGB", pixels uint8 (H,W[,3]), None) or raises."""
    from iscc_specs_spark.kernel.imagecodec import (
        JPEG_MAGIC,
        MAX_DECODE_PIXELS,
        ImageTooLarge,
    )

    if data[:3] != JPEG_MAGIC:
        raise ValueError("not a JPEG")
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffTable] = {}
    ac_tabs: dict[int, _HuffTable] = {}
    comps: list[_Component] = []
    width = height = None
    progressive = False
    restart_interval = 0

    pos = 2
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte before a marker (T.81 B.1.1.2)
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        ln = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        body = data[pos + 4:pos + 2 + ln]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                p += 1
                if pq:
                    vals = np.frombuffer(
                        body, dtype=">u2", count=64, offset=p
                    ).astype(np.int32)
                    p += 128
                else:
                    vals = np.frombuffer(
                        body, dtype=np.uint8, count=64, offset=p
                    ).astype(np.int32)
                    p += 64
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = vals  # DQT stores zigzag order
                qtables[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                counts = body[p + 1:p + 17]
                n = sum(counts)
                values = body[p + 17:p + 17 + n]
                (ac_tabs if tc else dc_tabs)[th] = _HuffTable(counts, values)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            progressive = marker == 0xC2
            prec = body[0]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            height, width = struct.unpack(">HH", body[1:5])
            if width * height > MAX_DECODE_PIXELS:
                raise ImageTooLarge(
                    f"JPEG {width}x{height} exceeds decode-size guard"
                )
            nc = body[5]
            if nc not in (1, 3):
                raise NotImplementedError(f"JPEG with {nc} components")
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append(_Component(cid, samp >> 4, samp & 15, tq))
            hmax = max(c.h for c in comps)
            vmax = max(c.v for c in comps)
            mcus_w = -(-width // (8 * hmax))
            mcus_h = -(-height // (8 * vmax))
            for c in comps:
                cw = -(-width * c.h // hmax)
                ch = -(-height * c.v // vmax)
                c.bw = -(-cw // 8)
                c.bh = -(-ch // 8)
                c.bw_alloc = mcus_w * c.h
                c.bh_alloc = mcus_h * c.v
                c.coef = np.zeros(
                    (c.bh_alloc, c.bw_alloc, 64), dtype=np.int32
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("unsupported JPEG coding process")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if width is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scomps = []
            for i in range(ns):
                cs, tabs = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in comps if c.cid == cs)
                comp.dc_tab, comp.ac_tab = tabs >> 4, tabs & 15
                scomps.append(comp)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 15
            br = _BitReader(data, pos + 2 + ln)
            _decode_scan(
                br, scomps, comps, ss, se, ah, al, progressive,
                dc_tabs, ac_tabs, restart_interval,
            )
            pos = br.pos
            # skip to next marker
            while pos < len(data) - 1 and not (
                data[pos] == 0xFF
                and data[pos + 1] != 0x00
                and not (0xD0 <= data[pos + 1] <= 0xD7)
            ):
                pos += 1
            continue
        pos += 2 + ln

    if width is None or not comps:
        raise ValueError("JPEG contains no frame")

    # dequantize + IDCT per component, then crop and color-convert
    planes = []
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    for c in comps:
        q = qtables[c.tq]
        blocks = c.coef[:c.bh, :c.bw].reshape(-1, 64)
        nat = np.zeros_like(blocks)
        nat[:, ZIGZAG] = blocks  # stored zigzag → natural
        pix = idct_islow_blocks(nat.reshape(-1, 8, 8), q)
        plane = (
            pix.reshape(c.bh, c.bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c.bh * 8, c.bw * 8)
        )
        cw = -(-width * c.h // hmax)
        ch = -(-height * c.v // vmax)
        planes.append(plane[:ch, :cw])

    if len(comps) == 1:
        return "L", planes[0][:height, :width].copy(), None

    y = planes[0][:height, :width]
    cb = _upsample(planes[1], comps[1], hmax, vmax, width, height)
    cr = _upsample(planes[2], comps[2], hmax, vmax, width, height)
    return "RGB", _ycc_to_rgb(y, cb, cr), None


def _decode_scan(br, scomps, comps, ss, se, ah, al, progressive,
                 dc_tabs, ac_tabs, restart_interval):
    """One SOS scan: baseline sequential, or one progressive pass."""
    interleaved = len(scomps) > 1
    for c in scomps:
        c.pred = 0
    eobrun = 0

    if interleaved:
        n_mcus = (comps[0].bw_alloc // comps[0].h) * (
            comps[0].bh_alloc // comps[0].v
        )
        mcus_w = comps[0].bw_alloc // comps[0].h
    else:
        # non-interleaved scan (T.81 A.2): one data unit per MCU, scanned
        # in the component's OWN block grid — NOT the frame MCU stride
        # (a single-component frame may still declare sampling factors
        # > 1; its grid is ceil(cw/8) since h == hmax for it)
        c = scomps[0]
        n_mcus = c.bw * c.bh
        mcus_w = c.bw

    to_restart = restart_interval
    for m in range(n_mcus):
        if restart_interval and to_restart == 0:
            br.skip_restart()
            for c in scomps:
                c.pred = 0
            eobrun = 0
            to_restart = restart_interval
        if restart_interval:
            to_restart -= 1

        if interleaved:
            mr, mc = divmod(m, mcus_w)
            for c in scomps:
                for by in range(c.v):
                    for bx in range(c.h):
                        block = c.coef[mr * c.v + by, mc * c.h + bx]
                        eobrun = _decode_block(
                            br, block, c, ss, se, ah, al, progressive,
                            dc_tabs, ac_tabs, eobrun,
                        )
        else:
            c = scomps[0]
            mr, mc = divmod(m, mcus_w)
            block = c.coef[mr, mc]
            eobrun = _decode_block(
                br, block, c, ss, se, ah, al, progressive,
                dc_tabs, ac_tabs, eobrun,
            )
    return eobrun


def _decode_block(br, block, c, ss, se, ah, al, progressive,
                  dc_tabs, ac_tabs, eobrun):
    if not progressive:
        # baseline: DC + full AC band in one pass
        s = br.decode(dc_tabs[c.dc_tab])
        diff = _extend(br.get_bits(s), s) if s else 0
        c.pred += diff
        block[0] = c.pred
        k = 1
        act = ac_tabs[c.ac_tab]
        while k <= 63:
            rs = br.decode(act)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    break
                k += 16
            else:
                k += r
                if k > 63:
                    raise ValueError("corrupt JPEG AC run (baseline)")
                block[k] = _extend(br.get_bits(s), s)
                k += 1
        return 0

    if ss == 0:  # DC scan
        if ah == 0:  # first pass
            s = br.decode(dc_tabs[c.dc_tab])
            diff = _extend(br.get_bits(s), s) if s else 0
            c.pred += diff
            block[0] = c.pred << al
        else:  # refinement: one bit
            if br.get_bit():
                block[0] |= 1 << al
        return eobrun

    # AC scans (always single-component per T.81 G.1.1.1.1)
    if ah == 0:  # AC first pass
        if eobrun > 0:
            return eobrun - 1
        act = ac_tabs[c.ac_tab]
        k = ss
        while k <= se:
            rs = br.decode(act)
            r, s = rs >> 4, rs & 15
            if s:
                k += r
                if k > 63:
                    raise ValueError("corrupt JPEG AC run (AC-first)")
                block[k] = _extend(br.get_bits(s), s) << al
                k += 1
            else:
                if r != 15:
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += br.get_bits(r)
                    break
                k += 16
        return eobrun

    # AC refinement pass (T.81 G.1.2.3 / the correction-bit algorithm)
    p1 = 1 << al
    m1 = -1 << al
    act = ac_tabs[c.ac_tab]
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.decode(act)
            r, s = rs >> 4, rs & 15
            if s:
                s = p1 if br.get_bit() else m1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.get_bits(r)
                    break
            while k <= se:
                if block[k] != 0:
                    if br.get_bit() and (block[k] & p1) == 0:
                        block[k] += p1 if block[k] >= 0 else m1
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if s and k <= se:
                block[k] = s
            k += 1
    if eobrun > 0:
        while k <= se:
            if block[k] != 0:
                if br.get_bit() and (block[k] & p1) == 0:
                    block[k] += p1 if block[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


# ---------------------------------------------------------------------------
# upsampling (triangular "fancy" filter) + color conversion
# ---------------------------------------------------------------------------

def _h2v1_rows(rows: np.ndarray, out_w: int) -> np.ndarray:
    """Horizontal 2× triangular upsample of (H, W) int rows."""
    h, w = rows.shape
    r = rows.astype(np.int32)
    out = np.empty((h, w * 2), dtype=np.int32)
    left = np.concatenate([r[:, :1], r[:, :-1]], axis=1)
    right = np.concatenate([r[:, 1:], r[:, -1:]], axis=1)
    out[:, 0::2] = (r * 3 + left + 1) >> 2
    out[:, 1::2] = (r * 3 + right + 2) >> 2
    # edge rule: first/last output pixels copy the edge sample
    out[:, 0] = r[:, 0]
    out[:, -1] = r[:, -1]
    return out[:, :out_w]


def _upsample(plane, comp, hmax, vmax, width, height):
    hs = hmax // comp.h
    vs = vmax // comp.v
    if hs == 1 and vs == 1:
        return plane[:height, :width].astype(np.int32)
    if hs == 2 and vs == 1:
        return _h2v1_rows(plane, width)[:height]
    if hs == 2 and vs == 2:
        # vertical triangular pass: 16-bit intermediate rows 3*near+far,
        # then horizontal pass with /16 rounding
        p = plane.astype(np.int32)
        h, w = p.shape
        up = np.concatenate([p[:1], p[:-1]], axis=0)
        dn = np.concatenate([p[1:], p[-1:]], axis=0)
        t_up = p * 3 + up      # output row 2i
        t_dn = p * 3 + dn      # output row 2i+1
        inter = np.empty((h * 2, w), dtype=np.int32)
        inter[0::2] = t_up
        inter[1::2] = t_dn
        left = np.concatenate([inter[:, :1], inter[:, :-1]], axis=1)
        right = np.concatenate([inter[:, 1:], inter[:, -1:]], axis=1)
        out = np.empty((h * 2, w * 2), dtype=np.int32)
        out[:, 0::2] = (inter * 3 + left + 8) >> 4
        out[:, 1::2] = (inter * 3 + right + 7) >> 4
        out[:, 0] = (inter[:, 0] * 4 + 8) >> 4
        out[:, -1] = (inter[:, -1] * 4 + 7) >> 4
        return out[:height, :width]
    raise NotImplementedError(
        f"JPEG sampling {comp.h}x{comp.v} vs max {hmax}x{vmax}"
    )


_SCALEBITS = 16
_ONE_HALF = 1 << (_SCALEBITS - 1)


def _fix(x: float) -> int:
    return int(x * (1 << _SCALEBITS) + 0.5)


_I = np.arange(256, dtype=np.int64) - 128
_CR_R = ((_fix(1.40200) * _I + _ONE_HALF) >> _SCALEBITS).astype(np.int32)
_CB_B = ((_fix(1.77200) * _I + _ONE_HALF) >> _SCALEBITS).astype(np.int32)
_CR_G = (-_fix(0.71414) * _I).astype(np.int64)
_CB_G = (-_fix(0.34414) * _I + _ONE_HALF).astype(np.int64)


def _ycc_to_rgb(y, cb, cr):
    """16-bit fixed-point CCIR 601-1 conversion (table-equivalent)."""
    y = y.astype(np.int32)
    cbi = cb.astype(np.intp)
    cri = cr.astype(np.intp)
    r = y + _CR_R[cri]
    b = y + _CB_B[cbi]
    g = y + ((_CB_G[cbi] + _CR_G[cri]) >> _SCALEBITS).astype(np.int32)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(rgb, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# payload synthesis (grayscale baseline encoder)
# ---------------------------------------------------------------------------

def _coef_magnitude(v: int) -> tuple[int, int]:
    """(size, raw bits) for a DC diff / AC coefficient (T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def encode_jpeg_gray(pixels: np.ndarray, quant_val: int = 1) -> bytes:
    """Minimal deterministic single-component baseline JFIF writer — the
    grayscale sibling of imagecodec.encode_png_gray / encode_gif_gray,
    used to synthesize real decodable JPEG payloads for the distributed
    image track. Flat quantization (all = ``quant_val``) and flat canonical
    Huffman tables (12 DC symbols at 4 bits, 255 AC symbols at 9 bits —
    code == symbol), so the only loss is DCT rounding; a pure function of
    the pixel matrix."""
    mat = np.asarray(pixels, dtype=np.uint8)
    if mat.ndim != 2:
        raise ValueError("encode_jpeg_gray expects a 2-D grayscale matrix")
    h, w = mat.shape
    bh, bw = -(-h // 8), -(-w // 8)
    plane = np.pad(
        mat.astype(np.float64), ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge"
    )

    # float DCT-II with JPEG scaling (T.81 A.3.3)
    k = np.arange(8)
    cosines = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c = np.full(8, 0.5)
    c[0] = np.sqrt(0.125)
    m = cosines * c[:, None]

    out = bytearray()
    acc = nacc = 0

    def put(value: int, bits: int) -> None:
        nonlocal acc, nacc
        for i in range(bits - 1, -1, -1):
            acc = (acc << 1) | ((value >> i) & 1)
            nacc += 1
            if nacc == 8:
                out.append(acc)
                if acc == 0xFF:
                    out.append(0x00)  # byte stuffing
                acc = 0
                nacc = 0

    pred = 0
    for by in range(bh):
        for bx in range(bw):
            cells = plane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
            coef = np.round(m @ cells @ m.T / quant_val).astype(np.int32)
            z = coef.reshape(64)[ZIGZAG]
            diff = int(z[0]) - pred
            pred = int(z[0])
            s, bits = _coef_magnitude(diff)
            put(s, 4)
            if s:
                put(bits, s)
            run = 0
            last = 63
            while last > 0 and z[last] == 0:
                last -= 1
            for i in range(1, last + 1):
                v = int(z[i])
                if v == 0:
                    run += 1
                    if run == 16:
                        put(0xF0, 9)  # ZRL
                        run = 0
                    continue
                s, bits = _coef_magnitude(v)
                put((run << 4) | s, 9)
                put(bits, s)
                run = 0
            if last < 63:
                put(0x00, 9)  # EOB
    while nacc:
        put(1, 1)  # pad with 1-bits per spec

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    quant = np.full(64, quant_val, dtype=np.uint8)
    dc_counts = [0] * 16
    dc_counts[3] = 12
    ac_counts = [0] * 16
    ac_counts[8] = 255
    return (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + bytes(quant[ZIGZAG].tolist()))
        + seg(0xC0, bytes([8]) + struct.pack(">HH", h, w)
              + bytes([1, 1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(range(12))
              + bytes([0x10]) + bytes(ac_counts) + bytes(range(255)))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes(out)
        + b"\xff\xd9"
    )
