"""Image hashing kernel: DCT-II perceptual hash + Content-ID-Image.

Parity: /root/reference/src/iscc/iscc.py:271-301 (image_hash),
396-423 (dct), 81-96 (content_id_image).  Pure array math — no codec
library involved: inputs are 2-D pixel matrices (what the reference's
``image_normalize`` produces from PIL).  The decode/resize step itself
(PIL bicubic) stays descoped in this container — see
operators/multimodal.py for the plumbing it would plug into.

The DCT is the Lee/Nayuki split-radix recursion (public algorithm,
https://www.nayuki.io/page/fast-discrete-cosine-transform-algorithms).
It is implemented here as a *batched* NumPy recursion over axis −1 with
per-element operation order identical to the scalar form — the hash
thresholds values against their median, so evaluation must be
bit-reproducible, not merely close.
"""

from __future__ import annotations

import math

import numpy as np

from iscc_specs_spark.kernel.codec import encode
from iscc_specs_spark.kernel.constants import HEAD_CID_I, HEAD_CID_I_PCF


def dct(values: "list[float] | np.ndarray") -> list[float]:
    """Unscaled type-II DCT of a length-2^k sequence (reference iscc.py:
    396-423 semantics: n==1 passthrough, n==0 or odd raises)."""
    arr = np.asarray(values, dtype=np.float64)
    if arr.ndim != 1:
        raise ValueError("dct expects a 1-D sequence")
    n = arr.shape[0]
    if n == 1:
        return [float(arr[0])]
    if n == 0 or n % 2 != 0:
        raise ValueError("dct length must be 1 or a positive even number")
    return [float(x) for x in _dct_rows(arr[None, :])[0]]


def _dct_rows(mat: np.ndarray) -> np.ndarray:
    """DCT-II applied to every row of a (R, n) float64 matrix.

    Same split recursion as the scalar algorithm; every arithmetic step is
    an elementwise vector op in the identical order, so results match the
    scalar form bit-for-bit.
    """
    n = mat.shape[1]
    if n == 1:
        return mat.copy()
    half = n // 2
    head = mat[:, :half]
    rev = mat[:, ::-1][:, :half]
    alpha = head + rev
    denom = np.array(
        [math.cos((i + 0.5) * math.pi / n) * 2.0 for i in range(half)],
        dtype=np.float64,
    )
    beta = (head - rev) / denom
    alpha = _dct_rows(alpha)
    beta = _dct_rows(beta)
    out = np.empty_like(mat)
    out[:, 0 : n - 2 : 2] = alpha[:, : half - 1]
    out[:, 1 : n - 1 : 2] = beta[:, : half - 1] + beta[:, 1:half]
    out[:, n - 2] = alpha[:, half - 1]
    out[:, n - 1] = beta[:, half - 1]
    return out


def image_hash(pixels) -> bytes:
    """64-bit perceptual hash of a 2-D pixel matrix (reference iscc.py:
    271-301): row DCT → column DCT → top-left 8×8 → median threshold →
    MSB-first bit packing.  Strictly greater-than-median sets a bit."""
    mat = np.asarray(pixels, dtype=np.float64)
    if mat.ndim != 2:
        raise ValueError("image_hash expects a 2-D pixel matrix")
    rows = _dct_rows(mat)
    cols = _dct_rows(rows.T)
    corner = cols.T[:8, :8]
    flat = corner.reshape(-1)
    med = float(np.median(flat))
    bits = (flat > med).astype(np.uint8)
    return np.packbits(bits).tobytes()


def content_id_image(pixels, partial: bool = False) -> str:
    """Content-ID-Image from a normalized 32×32 grayscale pixel matrix
    (reference iscc.py:81-96 minus the PIL decode/resize, which this
    container cannot run — feed it ``image_normalize`` output)."""
    digest = image_hash(pixels)
    head = HEAD_CID_I_PCF if partial else HEAD_CID_I
    return encode(head + digest)
