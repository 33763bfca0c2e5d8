"""base58-iscc codec + Hamming distance.

Parity with /root/reference/src/iscc/iscc.py:426-484 and the alphabet at
const.py:49.  A 9-byte component digest encodes as header (1 byte → 2 chars)
and body (8 bytes → 11 chars) independently.
"""

from __future__ import annotations

from iscc_specs_spark.kernel.constants import SYMBOLS

_CHAR_VALUE = {c: i for i, c in enumerate(SYMBOLS)}


def _encode_int(value: int, length: int) -> str:
    out = []
    for _ in range(length):
        value, rem = divmod(value, 58)
        out.append(SYMBOLS[rem])
    return "".join(reversed(out))


def encode(digest: bytes) -> str:
    if len(digest) == 9:
        return _encode_int(digest[0], 2) + _encode_int(
            int.from_bytes(digest[1:], "big"), 11
        )
    if len(digest) == 1:
        return _encode_int(digest[0], 2)
    if len(digest) == 8:
        return _encode_int(int.from_bytes(digest, "big"), 11)
    raise ValueError("digest must be 1, 8 or 9 bytes")


def decode(code: str) -> bytes:
    n = len(code)
    if n == 13:
        return decode(code[:2]) + decode(code[2:])
    if n == 2:
        width = 1
    elif n == 11:
        width = 8
    else:
        raise ValueError("code must be 2, 11 or 13 chars, not %d" % n)
    value = 0
    for c in code:
        value = value * 58 + _CHAR_VALUE[c]
    return value.to_bytes(width, "big")


def distance(a: str | bytes | int, b: str | bytes | int) -> int:
    """Hamming distance over 8-byte code bodies (header stripped for
    13-char code strings)."""
    if isinstance(a, str) and isinstance(b, str):
        a = decode(a)[1:]
        b = decode(b)[1:]
    if isinstance(a, bytes) and isinstance(b, bytes):
        a = int.from_bytes(a, "big")
        b = int.from_bytes(b, "big")
    return (a ^ b).bit_count()
