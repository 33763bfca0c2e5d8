"""Generalized suffix array (prefix doubling) + exact long-match mining:
brute-force parity, truncated-prefix semantics, cross-document classes,
cap policy, and partition invariance."""

from __future__ import annotations

import pytest

from iscc_specs_spark.operators.suffixarray import sa_long_matches, suffix_ranks


def _brute_ranks(texts: dict, max_prefix: int | None = None) -> dict:
    sufs = [
        (d, p + 1, t[p:] if max_prefix is None else t[p : p + max_prefix])
        for d, t in texts.items()
        for p in range(len(t))
    ]
    order = {s: i + 1 for i, s in enumerate(sorted({s for _, _, s in sufs}))}
    return {(d, p): order[s] for d, p, s in sufs}


@pytest.fixture(scope="module")
def corpus(spark):
    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "a quick brown fox jumps over a sleepy cat",
        3: "",
        4: "zzz",
        5: "the quick brown fox jumps over the lazy dog",  # exact dup of 1
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    ).repartition(4)
    return df, texts


def test_full_suffix_ranks_match_brute_force(corpus):
    df, texts = corpus
    got = {
        (r["doc_id"], r["pos"]): r["rank"] for r in suffix_ranks(df).collect()
    }
    assert got == _brute_ranks(texts)


def test_truncated_prefix_ranks(corpus):
    """max_prefix=L ranks by the first L chars only: equal L-prefixes share
    one dense rank (the key property the long-match miner builds on)."""
    df, texts = corpus
    for L in (1, 3, 8):
        got = {
            (r["doc_id"], r["pos"]): r["rank"]
            for r in suffix_ranks(df, max_prefix=L).collect()
        }
        assert got == _brute_ranks(texts, L), f"max_prefix={L}"


def test_long_matches_exact_spans(corpus):
    df, _ = corpus
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in sa_long_matches(df, min_len=20).collect()
    }
    # docs 1 and 5 are byte-identical (43 chars) — one maximal span
    full = out[(1, 5)]
    assert (full["a_start"], full["b_start"]) == (1, 1)
    assert full["match_len"] == 43
    assert full["n_grams"] == 43 - 20 + 1
    # docs 1 and 2 share ' quick brown fox jumps over ' (28 chars)
    part = out[(1, 2)]
    assert part["match_len"] == 28
    t1 = "the quick brown fox jumps over the lazy dog"
    t2 = "a quick brown fox jumps over a sleepy cat"
    assert (
        t1[part["a_start"] - 1 : part["a_start"] - 1 + 28]
        == t2[part["b_start"] - 1 : part["b_start"] - 1 + 28]
    )
    assert (2, 5) in out  # same shared span vs the duplicate of doc 1


def test_no_match_below_min_len(corpus):
    df, _ = corpus
    out = sa_long_matches(df, min_len=29).collect()
    # only the byte-identical pair (1,5) reaches 29+ chars
    assert {(r["doc_a"], r["doc_b"]) for r in out} == {(1, 5)}


def test_class_cap_drops_boilerplate(spark):
    """A gram shared by more documents than class_cap is dropped entirely —
    the boilerplate guard, mirroring the screen's df_cap policy."""
    boiler = "this exact boilerplate line appears everywhere"
    docs = spark.createDataFrame(
        [(i, f"doc {i} says: {boiler}") for i in range(10)],
        "doc_id long, text string",
    )
    assert sa_long_matches(docs, min_len=len(boiler), class_cap=4).count() == 0
    kept = sa_long_matches(docs, min_len=len(boiler), class_cap=100)
    assert kept.count() == 45  # all C(10,2) pairs when the cap allows


def test_partition_invariance(corpus):
    """max_prefix values on BOTH sides of the 8-char base round: 6 stays in
    the base rank, 12 forces a doubling round over the (_r1,_r2) long keys
    — the range-boundary-sensitive path must be layout-invariant too."""
    df, _ = corpus
    for L in (6, 12):
        one = {
            (r["doc_id"], r["pos"]): r["rank"]
            for r in suffix_ranks(df.coalesce(1), max_prefix=L).collect()
        }
        many = {
            (r["doc_id"], r["pos"]): r["rank"]
            for r in suffix_ranks(df.repartition(7), max_prefix=L).collect()
        }
        assert one == many, f"max_prefix={L}"


def test_class_cap_counts_documents_not_occurrences(spark):
    """The cap is a DOCUMENT-frequency policy (same as the screen's
    df_cap): a passage repeated many times inside each of two docs keeps
    its matches even when the class's occurrence count exceeds the cap."""
    passage = "an unusual passage that repeats inside both documents! "
    docs = spark.createDataFrame(
        [(1, passage * 10), (2, "prefix " + passage * 10)],
        "doc_id long, text string",
    )
    out = sa_long_matches(docs, min_len=len(passage), class_cap=4).collect()
    assert out, "2-doc class must survive a cap of 4 despite 20+ occurrences"
    # the longest reported span covers the full repeated region
    assert max(r["match_len"] for r in out) == 10 * len(passage)


def test_unicode_and_null_text(spark):
    docs = spark.createDataFrame(
        [(1, "héllo wörld"), (2, None), (3, "héllo wörld")],
        "doc_id long, text string",
    )
    texts = {1: "héllo wörld", 3: "héllo wörld"}
    got = {
        (r["doc_id"], r["pos"]): r["rank"] for r in suffix_ranks(docs).collect()
    }
    assert got == _brute_ranks(texts)
    m = sa_long_matches(docs, min_len=11).collect()
    assert [(r["doc_a"], r["doc_b"], r["match_len"]) for r in m] == [(1, 3, 11)]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False


@pytest.mark.skipif(not _HYP, reason="hypothesis not installed")
@given(
    texts=st.lists(
        st.text(alphabet="ab ", max_size=40), min_size=1, max_size=5
    ),
    max_prefix=st.sampled_from([None, 3, 10]),
)
@settings(max_examples=8, deadline=None, derandomize=True)
def test_suffix_ranks_property(spark, texts, max_prefix):
    """Random corpora over a 3-char alphabet (maximal rank collisions — the
    adversarial regime for prefix doubling: long runs of equal ranks
    survive many rounds) must match the brute-force generalized SA at
    full-suffix AND truncated-prefix comparison, across the 8-char base
    boundary (max_prefix=10 forces a doubling round; 3 stays in base)."""
    docs = {i + 1: t for i, t in enumerate(texts)}
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    ).repartition(3)
    got = {
        (r["doc_id"], r["pos"]): r["rank"]
        for r in suffix_ranks(df, max_prefix=max_prefix).collect()
    }
    assert got == _brute_ranks(docs, max_prefix)
