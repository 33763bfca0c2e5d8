"""Batch (cross-document vectorized) kernel == per-document scalar kernel."""

from __future__ import annotations

import numpy as np
import pytest

from iscc_specs_spark import kernel
from iscc_specs_spark.kernel.batch import (
    content_text_batch,
    data_instance_batch,
    meta_batch,
)

TEXTS = [
    "",
    "a",
    "short text",
    "The quick brown fox jumps over the lazy dog " * 10,
    "Iñtërnâtiônàlizætiøn☃💩 — mixed unicode with enough length to shingle " * 4,
    "exactly thirteen chars!",
    "Die Unendliche Geschichte von Michael Ende " * 50,
    None,
    "\t whitespace\n\n and\r punctuation!!! Everywhere... " * 8,
    "ASCII but sub-window",
]


def test_content_text_batch_matches_scalar():
    out = content_text_batch(TEXTS)
    for i, t in enumerate(TEXTS):
        code, mh, sim, nf = kernel.content_id_text_full(t if t is not None else "")
        assert out["cid"][i] == code, f"row {i}"
        assert np.array_equal(out["minhash"][i], mh), f"row {i}"
        assert np.uint64(out["simhash"][i].astype(np.uint64)) == np.uint64(sim)
        assert out["n_features"][i] == nf
        # body LONG is the bit-identical two's-complement carrier of the code body
        body_bytes = int(np.uint64(out["cid_body"][i].astype(np.uint64))).to_bytes(8, "big")
        assert kernel.decode(code)[1:] == body_bytes


def test_meta_batch_matches_scalar():
    titles = ["", "Die Unendliche Geschichte", "Iñtërnâtiônàlizætiøn☃", None,
              "a", "The Low End Theory " * 20]
    mids, bodies, trimmed = meta_batch(titles)
    for i, t in enumerate(titles):
        code, t_trim, _ = kernel.meta_id(t if t is not None else "")
        assert mids[i] == code, f"row {i}"
        assert trimmed[i] == t_trim
        assert kernel.decode(code)[1:] == int(
            np.uint64(bodies[i].astype(np.uint64))
        ).to_bytes(8, "big")


def test_data_instance_batch_matches_scalar():
    rng = np.random.default_rng(3)
    blobs = [
        b"tiny",
        bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 70000, dtype=np.uint8)),
        None,
    ]
    out = data_instance_batch(blobs)
    for i, b in enumerate(blobs):
        if b:
            assert out["did"][i] == kernel.data_id(b)
        code, hexhash = kernel.instance_id(b if b is not None else b"")
        assert out["iid"][i] == code
        assert out["tophash"][i] == hexhash
