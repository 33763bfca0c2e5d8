"""Batch (cross-document) vectorized code generation.

The pandas-UDF hot path: instead of per-document NumPy calls, all shingles of
all ASCII documents in an Arrow batch are hashed in a handful of vectorized
sweeps, and per-document MinHash/SimHash reductions happen via
``np.minimum.reduceat`` / ``np.add.reduceat`` over segment boundaries.
Non-ASCII or sub-window documents fall back to the per-document kernel path
(identical results — the fast path is pinned to the scalar path by
tests/test_batch.py property checks and transitively by the golden vectors).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from iscc_specs_spark.kernel.codec import encode
from iscc_specs_spark.kernel.codes import (
    content_id_text_full,
    data_id_full,
    instance_id,
    meta_id,
    sliding_window,
    _simhash_u64,
    _hash_buffers,
)
from iscc_specs_spark.kernel.constants import (
    HEAD_CID_T,
    HEAD_DID,
    HEAD_MID,
    WINDOW_SIZE_CID_T,
    WINDOW_SIZE_MID,
)
from iscc_specs_spark.kernel.sketches import perm_hash
from iscc_specs_spark.kernel.textnorm import text_normalize, text_trim
from iscc_specs_spark.kernel.xxhashes import xxh32_fixed, xxh64, xxh64_fixed

# cap transient (n_shingles × 64) uint64 matrices: 3k shingles → ~1.5 MB,
# L2-resident per worker — the kernel runs 32× concurrently per host and
# DRAM bandwidth, not ALU, is the budget (measured: 3k ≈ 1.9× faster than 24k)
_SHINGLE_BUDGET = 3_000


def _pack_u64_rows(bits: np.ndarray) -> np.ndarray:
    """(R, 64) 0/1 uint8, col 0 = MSB → (R,) uint64."""
    packed = np.packbits(bits, axis=1)  # (R, 8) big-endian bytes
    return packed.view(">u8").astype(np.uint64).reshape(-1)


def _segments_minhash_simhash(mat: np.ndarray, starts: np.ndarray, lens: np.ndarray):
    """Hash an (K, L) shingle matrix and reduce per segment.

    Returns (minhash (R,64) uint64, simhash (R,) uint64).
    """
    old = np.seterr(over="ignore")
    try:
        feats = xxh32_fixed(mat).astype(np.uint64)
        h = perm_hash(feats[:, None])
        mh = np.minimum.reduceat(h, starts, axis=0)

        digs = xxh64_fixed(mat)
        bits = np.unpackbits(digs.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1)
        counts = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)
        sim_bits = (2 * counts >= lens[:, None]).astype(np.uint8)
        return mh, _pack_u64_rows(sim_bits)
    finally:
        np.seterr(**old)


def content_text_batch(texts: Sequence[str | None]):
    """Content-ID-Text codes + sketches for a batch of documents.

    Returns dict of parallel arrays/lists:
      cid: list[str], cid_body: int64 (R,), simhash: int64 (R,),
      minhash: uint64 (R, 64), n_features: int32 (R,)
    """
    n_rows = len(texts)
    cid: list[str | None] = [None] * n_rows
    cid_body = np.zeros(n_rows, dtype=np.int64)
    simhash = np.zeros(n_rows, dtype=np.int64)
    minhash = np.zeros((n_rows, 64), dtype=np.uint64)
    n_features = np.zeros(n_rows, dtype=np.int32)

    norms = [text_normalize(t if t is not None else "", keep_ws=False) for t in texts]

    fast: list[int] = []
    for i, s in enumerate(norms):
        if s.isascii() and len(s) >= WINDOW_SIZE_CID_T:
            fast.append(i)
        else:
            code, mh, sim, nf = content_id_text_full(s if s else "")
            cid[i] = code
            cid_body[i] = np.uint64(
                int.from_bytes(
                    np.packbits((mh & np.uint64(1)).astype(np.uint8)).tobytes(), "big"
                )
            ).astype(np.int64)
            simhash[i] = np.uint64(sim).astype(np.int64)
            minhash[i] = mh
            n_features[i] = nf

    width = WINDOW_SIZE_CID_T
    joined_w = 2 * width - 1
    pos = 0
    while pos < len(fast):
        # take rows until the shingle budget is hit
        group: list[int] = []
        total = 0
        while pos < len(fast):
            i = fast[pos]
            k = len(norms[i]) - width + 1
            if group and total + k > _SHINGLE_BUDGET:
                break
            group.append(i)
            total += k
            pos += 1
        lens = np.array([len(norms[i]) - width + 1 for i in group], dtype=np.int64)
        starts = np.zeros(len(group), dtype=np.int64)
        starts[1:] = np.cumsum(lens)[:-1]
        mat = np.full((total, joined_w), 32, dtype=np.uint8)
        for g, i in enumerate(group):
            a = np.frombuffer(norms[i].encode("ascii"), dtype=np.uint8)
            mat[starts[g] : starts[g] + lens[g], ::2] = (
                np.lib.stride_tricks.sliding_window_view(a, width)
            )
        mh, sim = _segments_minhash_simhash(mat, starts, lens)
        bodies = _pack_u64_rows((mh & np.uint64(1)).astype(np.uint8))
        for g, i in enumerate(group):
            minhash[i] = mh[g]
            simhash[i] = np.uint64(sim[g]).astype(np.int64)
            cid_body[i] = bodies[g].astype(np.int64)
            n_features[i] = lens[g]
            cid[i] = encode(HEAD_CID_T + int(bodies[g]).to_bytes(8, "big"))

    return {
        "cid": cid,
        "cid_body": cid_body,
        "simhash": simhash,
        "minhash": minhash,
        "n_features": n_features,
    }


def meta_batch(titles: Sequence[str | None], extras: Sequence[str] | None = None):
    """Meta-ID codes for a batch. Returns (mid list[str], mid_body int64 (R,),
    title_trimmed list[str])."""
    n_rows = len(titles)
    mids: list[str | None] = [None] * n_rows
    mid_body = np.zeros(n_rows, dtype=np.int64)
    trimmed: list[str] = [""] * n_rows

    width = WINDOW_SIZE_MID
    concats: list[str] = []
    for i in range(n_rows):
        t = text_trim(text_normalize(titles[i] or "", keep_ws=True))
        e = text_trim(text_normalize(extras[i] if extras else "", keep_ws=True))
        trimmed[i] = t
        concats.append(" ".join((t, e)).strip())

    fast = [i for i, c in enumerate(concats) if c.isascii() and len(c) >= width]
    fast_set = set(fast)
    slow = [i for i in range(n_rows) if i not in fast_set]

    if fast:
        lens = np.array([len(concats[i]) - width + 1 for i in fast], dtype=np.int64)
        starts = np.zeros(len(fast), dtype=np.int64)
        starts[1:] = np.cumsum(lens)[:-1]
        total = int(lens.sum())
        mat = np.empty((total, width), dtype=np.uint8)
        for g, i in enumerate(fast):
            a = np.frombuffer(concats[i].encode("ascii"), dtype=np.uint8)
            mat[starts[g] : starts[g] + lens[g]] = np.lib.stride_tricks.sliding_window_view(
                a, width
            )
        old = np.seterr(over="ignore")
        try:
            digs = xxh64_fixed(mat)
        finally:
            np.seterr(**old)
        bits = np.unpackbits(digs.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1)
        counts = np.add.reduceat(bits, starts, axis=0, dtype=np.int64)
        sims = _pack_u64_rows((2 * counts >= lens[:, None]).astype(np.uint8))
        for g, i in enumerate(fast):
            mid_body[i] = sims[g].astype(np.int64)
            mids[i] = encode(HEAD_MID + int(sims[g]).to_bytes(8, "big"))

    for i in slow:
        bufs = [g.encode("utf-8") for g in sliding_window(concats[i], width)]
        digs = _hash_buffers(bufs, xxh64_fixed, xxh64)
        sim = _simhash_u64(digs)
        mid_body[i] = np.uint64(sim).astype(np.int64)
        mids[i] = encode(HEAD_MID + sim.to_bytes(8, "big"))

    return mids, mid_body, trimmed


def data_instance_batch(blobs: Sequence[bytes | None]):
    """Data-ID + Instance-ID for a batch of binary blobs (CDC is a sequential
    per-document recurrence; parallelism is across rows/partitions).

    Returns dict: did list[str], did_body int64, data_minhash uint64 (R,64),
    n_chunks int32, iid list[str], iid_body int64, tophash list[str].
    """
    n_rows = len(blobs)
    did: list[str | None] = [None] * n_rows
    did_body = np.zeros(n_rows, dtype=np.int64)
    dmh = np.zeros((n_rows, 64), dtype=np.uint64)
    n_chunks = np.zeros(n_rows, dtype=np.int32)
    iid: list[str | None] = [None] * n_rows
    iid_body = np.zeros(n_rows, dtype=np.int64)
    tophash: list[str | None] = [None] * n_rows

    for i, blob in enumerate(blobs):
        b = blob if blob is not None else b""
        if b:
            code, mh, nc = data_id_full(b)
            did[i] = code
            body = int.from_bytes(
                np.packbits((mh & np.uint64(1)).astype(np.uint8)).tobytes(), "big"
            )
            did_body[i] = np.uint64(body).astype(np.int64)
            dmh[i] = mh
            n_chunks[i] = nc
        else:
            did[i] = encode(HEAD_DID + b"\x00" * 8)  # defined fallback for empty
        code, hexhash = instance_id(b)
        iid[i] = code
        iid_body[i] = np.uint64(int(hexhash[:16], 16)).astype(np.int64)
        tophash[i] = hexhash

    return {
        "did": did,
        "did_body": did_body,
        "data_minhash": dmh,
        "n_chunks": n_chunks,
        "iid": iid,
        "iid_body": iid_body,
        "tophash": tophash,
    }
