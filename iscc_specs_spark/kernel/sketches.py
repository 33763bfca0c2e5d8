"""Similarity sketches: SimHash and fixed-permutation MinHash.

Parity targets: /root/reference/src/iscc/iscc.py:236-268 (similarity_hash,
minimum_hash); permutation pairs are spec data (const.py:70-327).  Both are
NumPy-vectorized — ``similarity_hash`` via unpackbits column sums,
``minimum_hash`` via a broadcast (features × 64 permutations) matrix.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np

from iscc_specs_spark.kernel.constants import MINHASH_PERMUTATIONS

_MERSENNE_61 = np.uint64((1 << 61) - 1)
_MAX32 = np.uint64((1 << 32) - 1)

# (64,) uint64 permutation coefficient vectors, used by the hot path
_PERM_A = np.array([a for a, _ in MINHASH_PERMUTATIONS[:64]], dtype=np.uint64)
_PERM_B = np.array([b for _, b in MINHASH_PERMUTATIONS[:64]], dtype=np.uint64)


def similarity_hash(digests: Sequence[bytes]) -> bytes:
    """SimHash (Charikar 2002): majority vote per bit position; ties → 1.

    All digests must share one width; output has the same width.
    """
    mat = np.frombuffer(b"".join(digests), dtype=np.uint8).reshape(
        len(digests), len(digests[0])
    )
    bits = np.unpackbits(mat, axis=1)
    counts = bits.sum(axis=0, dtype=np.int64)
    # bit set iff count >= n/2  ⇔  2*count >= n
    out_bits = (2 * counts >= len(digests)).astype(np.uint8)
    return np.packbits(out_bits).tobytes()


def mersenne61_mod(x: np.ndarray) -> np.ndarray:
    """x mod (2^61 − 1) for uint64 arrays. NumPy's scalar-divisor mod is a
    single memory pass — on big matrices the op is bandwidth-bound, so one
    pass beats any multi-pass shift/add folding."""
    return x % _MERSENNE_61


def perm_hash(features_col: np.ndarray, n: int = 64) -> np.ndarray:
    """(K,1)-broadcast permutation hash matrix: ((a*f+b) mod 2^64)
    mod (2^61−1) & MAX32, shared by minhash_np and the batch hot path.

    Exactly one (K,n) allocation; every subsequent op is in-place — the
    kernel runs 32× concurrently per host, so DRAM traffic (not ALU) is
    the budget."""
    h = features_col * _PERM_A[None, :n]
    h += _PERM_B[None, :n]
    np.mod(h, _MERSENNE_61, out=h)
    h &= _MAX32
    return h


def minhash_np(features: np.ndarray, n: int = 64) -> np.ndarray:
    """MinHash signature of a (K,) uint64 feature array → (n,) uint64.

    Per permutation p: min over features of ((a_p*f + b_p) mod 2^64)
    mod (2^61-1), truncated to 32 bits.  uint64 multiply wraps natively,
    which is exactly the `& MAX_INT64` of the spec.
    """
    if features.size == 0:
        raise ValueError("minhash of empty feature set")
    f = features.astype(np.uint64, copy=False)
    old = np.seterr(over="ignore")
    try:
        return perm_hash(f[:, None], n).min(axis=0)
    finally:
        np.seterr(**old)


def minimum_hash(features: Iterable[int], n: int = 64) -> list[int]:
    """Reference-shaped wrapper (list in / list out) over :func:`minhash_np`."""
    arr = np.fromiter((int(x) for x in features), dtype=np.uint64)
    return [int(v) for v in minhash_np(arr, n=n)]


def lsb_digest(minhash: np.ndarray) -> bytes:
    """8-byte body: LSB of each of the 64 signature values, first value =
    most-significant bit (spec §219-221)."""
    bits = (minhash[:64] & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits).tobytes()
