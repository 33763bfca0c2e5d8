"""Kernel unit tests — truth tables and robustness bounds lifted from the
reference's own test suite (/root/reference/tests/test_iscc.py), plus
known-answer tests for our from-spec xxHash implementation.
"""

from __future__ import annotations

import random
from pathlib import Path

import numpy as np
import pytest

from iscc_specs_spark import kernel
from iscc_specs_spark.kernel.xxhashes import xxh32, xxh32_fixed, xxh64, xxh64_fixed

FIXTURES = Path(__file__).parent / "fixtures"


# --- xxHash known answers (public xxHash spec test vectors) -----------------

def test_xxh32_known_answers():
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    # >=16 bytes exercises the 4-accumulator path
    assert xxh32(b"0123456789abcdef" * 4) == xxh32(b"0123456789abcdef" * 4)


def test_xxh64_known_answers():
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999


@pytest.mark.parametrize("length", [1, 3, 4, 5, 13, 15, 16, 17, 25, 31, 32, 33, 64, 100])
def test_vectorized_matches_scalar(length):
    rng = np.random.default_rng(7)
    mat = rng.integers(0, 256, size=(23, length), dtype=np.uint8)
    rows = [bytes(r) for r in mat]
    got32 = xxh32_fixed(mat)
    got64 = xxh64_fixed(mat)
    for i, row in enumerate(rows):
        assert int(got32[i]) == xxh32(row)
        assert int(got64[i]) == xxh64(row)


# --- encode/decode roundtrip (ref test_iscc.py:83-92) ------------------------

def test_encode_decode_roundtrip():
    digest = bytes.fromhex("f98f1f98a8f98f1f98a8")[:9]
    assert len(digest) == 9
    code = kernel.encode(digest)
    assert len(code) == 13
    assert kernel.decode(code) == digest
    for raw in (b"\x00" * 9, b"\xff" * 9, bytes(range(9))):
        assert kernel.decode(kernel.encode(raw)) == raw


# --- similarity_hash truth table (ref test_iscc.py:146-168) ------------------

def test_similarity_hash_pairs():
    all_zero = b"\x00" * 8
    all_ones = b"\xff" * 8
    assert kernel.similarity_hash([all_zero, all_zero]) == all_zero
    assert kernel.similarity_hash([all_ones, all_ones]) == all_ones
    # ties -> 1
    assert kernel.similarity_hash([all_zero, all_ones]) == all_ones
    a = bytes.fromhex("aaaaaaaaaaaaaaaa")
    c = bytes.fromhex("5555555555555555")
    assert kernel.similarity_hash([a, c]) == all_ones


# --- sliding_window edges (ref test_iscc.py:138-143) -------------------------

def test_sliding_window():
    from iscc_specs_spark.kernel.codes import sliding_window

    assert list(sliding_window("", 4)) == [""]
    assert list(sliding_window("A", 4)) == ["A"]
    assert list(sliding_window("Hello", 4)) == ["Hell", "ello"]
    words = ("lorem", "ipsum", "dolor", "sit", "amet")
    assert list(sliding_window(words, 2))[0] == ("lorem", "ipsum")


# --- text_trim multi-byte boundaries (ref test_iscc.py:121-135) --------------

def test_text_trim_multibyte():
    multibyte_2 = "ü" * 128
    trimmed = kernel.text_trim(multibyte_2)
    assert len(trimmed) == 64
    assert len(trimmed.encode("utf-8")) == 128
    multibyte_3 = "驩" * 128
    trimmed = kernel.text_trim(multibyte_3)
    assert len(trimmed) == 42
    assert len(trimmed.encode("utf-8")) == 126
    mixed = "Iñtërnâtiônàlizætiøn☃💩" * 6
    trimmed = kernel.text_trim(mixed)
    assert len(trimmed) == 85
    assert len(trimmed.encode("utf-8")) == 128


# --- CDC chunk stats on lenna.jpg (ref test_iscc.py:249-258) -----------------

def test_data_chunks_lenna():
    data = (FIXTURES / "file_image_lenna.jpg").read_bytes()
    chunks = list(kernel.data_chunks(data))
    assert len(chunks) == 112
    assert len(chunks[0]) == 38
    assert len(chunks[-1]) == 2840


# --- robustness envelope (ref test_iscc.py:103-105, 176-200, 218-231) --------

TEXT_A = """
    Their most significant and usefull property of similarity-preserving
    fingerprints gets lost in the fragmentation of individual, propietary and
    use case specific implementations. The real benefit lies in similarity
    preservation beyond your local data archive on a global scale accross
    vendors.
"""
TEXT_B = TEXT_A.replace("Their most", "The most")


def test_content_id_text_edit_distance():
    a = kernel.content_id_text(TEXT_A)
    b = kernel.content_id_text(TEXT_B)
    assert kernel.distance(a, b) == 2


def test_meta_id_robustness():
    mid1 = kernel.meta_id("Die Unendliche Geschichte", "von Michael Ende")[0]
    # one character change
    mid2 = kernel.meta_id("Die UnXndliche Geschichte", "von Michael Ende")[0]
    assert kernel.distance(mid1, mid2) <= 10
    # word order change
    mid3 = kernel.meta_id("Unendliche Geschichte, Die", "von Michael Ende")[0]
    assert kernel.distance(mid1, mid3) <= 13
    # unrelated
    mid4 = kernel.meta_id("Now for something different")[0]
    assert kernel.distance(mid1, mid4) >= 24


def test_data_id_noise_robustness():
    random.seed(1)
    data = bytearray([random.getrandbits(8) for _ in range(1000000)])
    did_a = kernel.data_id(bytes(data))
    for _ in range(100):
        pos = random.randint(0, len(data) - 1)
        data.insert(pos, random.getrandbits(8))
    did_b = kernel.data_id(bytes(data))
    assert kernel.distance(did_a, did_b) <= 24  # reference observes 17


def test_instance_id_basics():
    zero_bytes_even = b"\x00" * 16
    iid, h = kernel.instance_id(zero_bytes_even)
    assert iid.startswith("CR")
    assert len(h) == 64
    # chunk boundary: > 64000 bytes builds a 2-leaf merkle tree
    big = b"\xff" * 64001
    iid2, h2 = kernel.instance_id(big)
    assert iid2 != iid


def test_mersenne61_fold_equals_mod():
    import numpy as np

    from iscc_specs_spark.kernel.sketches import _MERSENNE_61, mersenne61_mod

    rng = np.random.RandomState(11)
    x = rng.randint(0, 1 << 62, size=50000).astype(np.uint64) * np.uint64(4)
    x += rng.randint(0, 4, size=50000).astype(np.uint64)
    assert (mersenne61_mod(x) == x % _MERSENNE_61).all()
    edges = np.array(
        [0, 1, (1 << 61) - 2, (1 << 61) - 1, 1 << 61, (1 << 61) + 1,
         2 * ((1 << 61) - 1), 2 * ((1 << 61) - 1) + 1, (1 << 64) - 1, (1 << 64) - 2],
        dtype=np.uint64,
    )
    assert (mersenne61_mod(edges) == edges % _MERSENNE_61).all()
