"""Content-defined chunking: two-phase gear CDC (FastCDC-style).

Parity with /root/reference/src/iscc/iscc.py:331-386 including its exact
stateful quirks: the first 100 *emitted* chunks use the GEAR1 parameter set
(~140 B avg), later chunks GEAR2 (~6 kB avg); the section buffer is refilled
by at most one max-sized read per iteration; the rolling hash restarts at 0
for every chunk and begins eating bytes at index ``min_size``.
"""

from __future__ import annotations

from typing import Iterator

from iscc_specs_spark.kernel.constants import (
    CHUNKING_GEAR,
    GEAR1_MASK1,
    GEAR1_MASK2,
    GEAR1_MAX,
    GEAR1_MIN,
    GEAR1_NORM,
    GEAR2_MASK1,
    GEAR2_MASK2,
    GEAR2_MAX,
    GEAR2_MIN,
    GEAR2_NORM,
    MAX_INT64,
)

_GEAR = CHUNKING_GEAR


def chunk_boundary(
    data: bytes,
    norm_size: int,
    min_size: int,
    max_size: int,
    mask_1: int,
    mask_2: int,
) -> int:
    """Length of the next chunk at the head of ``data``."""
    n = len(data)
    if n <= min_size:
        return n
    pattern = 0
    i = min_size
    gear = _GEAR
    end = min(norm_size, n)
    while i < end:
        pattern = ((pattern << 1) + gear[data[i]]) & MAX_INT64
        if not pattern & mask_1:
            return i
        i += 1
    end = min(max_size, n)
    while i < end:
        pattern = ((pattern << 1) + gear[data[i]]) & MAX_INT64
        if not pattern & mask_2:
            return i
        i += 1
    return i


def data_chunks(data: bytes) -> Iterator[bytes]:
    """Yield CDC chunks of ``data`` (in-memory bytes only; file/stream
    handling is a scan concern, not a kernel concern)."""
    view = memoryview(data)
    pos = 0  # next unread offset in data

    def read(k: int) -> memoryview:
        nonlocal pos
        out = view[pos : pos + k]
        pos += len(out)
        return out

    section = bytes(read(GEAR1_MAX))
    emitted = 0
    while True:
        if emitted < 100:
            if len(section) < GEAR1_MAX:
                section += bytes(read(GEAR1_MAX))
            if not section:
                break
            cut = chunk_boundary(
                section, GEAR1_NORM, GEAR1_MIN, GEAR1_MAX, GEAR1_MASK1, GEAR1_MASK2
            )
        else:
            if len(section) < GEAR2_MAX:
                section += bytes(read(GEAR2_MAX))
            if not section:
                break
            cut = chunk_boundary(
                section, GEAR2_NORM, GEAR2_MIN, GEAR2_MAX, GEAR2_MASK1, GEAR2_MASK2
            )
        yield section[:cut]
        section = section[cut:]
        emitted += 1
