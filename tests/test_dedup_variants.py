from __future__ import annotations

import pytest

from iscc_specs_spark.operators import dedup_variants as D


def test_exact_dups(spark):
    rows = [
        (0, "Hello   World"),
        (1, "hello world"),      # same after normalization
        (2, "HELLO  WORLD "),    # same after normalization
        (3, "something else"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = {x["doc_id"]: x for x in D.exact_dups(df).collect()}
    assert r[0]["group_size"] == 3 and r[0]["rep_doc_id"] == 0
    assert not r[0]["is_dup"] and r[1]["is_dup"] and r[2]["is_dup"]
    assert r[3]["group_size"] == 1 and not r[3]["is_dup"]


def test_ngram_jaccard(spark):
    base = " ".join(f"w{i}" for i in range(20))
    rows = [
        (0, base),
        (1, base),                      # identical → jaccard 1.0
        (2, base + " extra words here"),  # high overlap
        (3, " ".join(f"z{i}" for i in range(20))),  # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (x["doc_a"], x["doc_b"]): x["jaccard"]
        for x in D.ngram_jaccard_pairs(df, n=3, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert 0.5 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_ngram_jaccard_df_cap(spark):
    # hot (boilerplate) shingles above the df cap are dropped: the 10-doc
    # boilerplate clique vanishes, the rare identical pair survives
    uniq = " ".join(f"w{i}" for i in range(20))
    boiler = " ".join(f"b{i}" for i in range(20))
    rows = [(0, uniq), (1, uniq)] + [(i, boiler) for i in range(2, 12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = D.ngram_jaccard_pairs(df, n=3, threshold=0.9, shingle_df_cap=5).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in got} == {(0, 1)}
    assert got[0]["jaccard"] == 1.0


def test_embedding_neardup(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),   # ≈ vec 0
        (2, [0.0, 1.0, 0.0]),      # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(x["vec_a"], x["vec_b"]): x["cosine"]
           for x in D.embedding_neardup_pairs(df, threshold=0.95).collect()}
    assert (0, 1) in got and got[(0, 1)] > 0.99
    assert (0, 2) not in got and (1, 2) not in got


def test_embedding_neardup_gemm_matches_sql(spark):
    """The blocked-GEMM production verifier finds exactly the SQL sibling's
    pair set, with cosines equal to within one round-6 ulp (BLAS reorders
    the dot-product summation). Exercised across tile boundaries."""
    from pyspark.sql import functions as F

    from iscc_specs_spark.operators.dedup_variants import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_gemm,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    sql_pairs = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in embedding_neardup_pairs(emb, threshold=0.4).collect()
    }
    # block=64 forces many tile pairs (incl. off-diagonal) on the test table
    gemm_pairs = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in embedding_neardup_pairs_gemm(
            emb, threshold=0.4, block=64
        ).collect()
    }
    assert set(sql_pairs) == set(gemm_pairs)
    assert sql_pairs  # fixture must produce pairs
    for k in sql_pairs:
        assert abs(sql_pairs[k] - gemm_pairs[k]) <= 1e-6, k
    # zero-norm vectors must be excluded, not NaN-propagated
    withzero = emb.select("vec_id", "embedding").union(
        spark.createDataFrame(
            [(99990, [0.0] * 64)], "vec_id long, embedding array<double>"
        ).select("vec_id", F.col("embedding").cast("array<float>"))
    )
    z = embedding_neardup_pairs_gemm(withzero, threshold=0.4, block=64)
    assert not [r for r in z.collect() if 99990 in (r["vec_a"], r["vec_b"])]


def test_embedding_neardup_gated_matches_lsh_sql(spark):
    """The composed production path (RHP-LSH candidates -> blocked-GEMM
    verify over candidate tiles only) finds exactly the pair set of the
    DuckDB-oracled SQL-fold sibling embedding_neardup_lsh — same candidate
    generator, same round-6 threshold, different scorer. block=64 forces
    many gated tile pairs; a small bucket_cap also pushes pairs through
    the hot-bucket hub route."""
    from iscc_specs_spark.operators.dedup_variants import (
        embedding_neardup_gated,
        embedding_neardup_lsh,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    kw = dict(threshold=0.4, dim=64, bucket_cap=100)
    sql_pairs = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in embedding_neardup_lsh(emb, **kw).collect()
    }
    gated_pairs = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in embedding_neardup_gated(emb, block=64, **kw).collect()
    }
    assert sql_pairs, "fixture must produce pairs"
    assert set(sql_pairs) == set(gated_pairs)
    for k in sql_pairs:
        assert abs(sql_pairs[k] - gated_pairs[k]) <= 1e-6, k


def test_embedding_neardup_gated_boundary_reverify(spark):
    """A pair whose round-6 cosine sits EXACTLY on the threshold must come
    out of the gated path identically to the SQL-fold sibling: the GEMM cut
    runs eps-loose and the ±eps band is re-scored with the deterministic
    fold, so a BLAS-vs-fold last-ulp wobble can never flip a boundary pair
    (round-5 advice). Pinned by setting the threshold to an actual pair's
    cosine, which forces that pair through the re-verify branch, and by
    checking a threshold one 1e-6 grid step above it excludes the pair from
    both paths."""
    from iscc_specs_spark.operators.dedup_variants import (
        embedding_neardup_gated,
        embedding_neardup_lsh,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kw = dict(dim=64, bucket_cap=100)
    base = embedding_neardup_lsh(emb, threshold=0.4, **kw).collect()
    assert base, "fixture must produce pairs"
    # the smallest surviving cosine becomes the threshold: that pair now
    # sits exactly on the boundary (cosines are round-6 grid values)
    edge = min(r["cosine"] for r in base)
    for thr in (edge, edge + 1e-6):
        sql_pairs = {
            (r["vec_a"], r["vec_b"])
            for r in embedding_neardup_lsh(emb, threshold=thr, **kw).collect()
        }
        gated_pairs = {
            (r["vec_a"], r["vec_b"])
            for r in embedding_neardup_gated(
                emb, threshold=thr, block=64, **kw
            ).collect()
        }
        assert sql_pairs == gated_pairs, thr
    # the exact-edge threshold keeps strictly more pairs than one step up
    # (proves the boundary pair actually rode the re-verify branch)
    n_edge = len(
        embedding_neardup_gated(emb, threshold=edge, block=64, **kw).collect()
    )
    n_up = len(
        embedding_neardup_gated(
            emb, threshold=edge + 1e-6, block=64, **kw
        ).collect()
    )
    assert n_edge > n_up


def test_line_dedup(spark):
    import hashlib

    boiler = "(c) example corp all rights reserved"
    nav = "home | about | contact"
    rows = [
        (0, f"{boiler}\nunique zero body text\n{nav}"),
        (1, f"{boiler}\nanother distinct body\n{nav}"),
        (2, f"{boiler}\nthird doc content here"),
        (3, "entirely original document\nwith two original lines"),
        (4, f"{boiler}\n{boiler}\n\nonly-doc-4 text"),  # dup within one doc
        (5, ""),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in D.line_dedup(df, min_df=2).collect()}
    assert len(got) == 7

    def fp(s):
        return hashlib.md5(s.encode()).hexdigest()

    # boiler (df=4 docs) and nav (df=2) dropped; empty lines never dropped
    assert got[0]["n_lines"] == 3 and got[0]["n_dropped"] == 2
    assert got[0]["clean_fp"] == fp("unique zero body text")
    assert got[0]["chars_dropped"] == len(boiler) + len(nav)
    assert got[1]["clean_fp"] == fp("another distinct body")
    assert got[2]["n_dropped"] == 1
    assert got[2]["clean_fp"] == fp("third doc content here")
    # df counts distinct docs: doc 3's lines are unique -> nothing dropped
    assert got[3]["n_dropped"] == 0
    assert got[3]["clean_fp"] == fp(
        "entirely original document\nwith two original lines"
    )
    # within-doc repetition alone doesn't make a line hot, but boiler is
    # hot corpus-wide -> both copies dropped; the empty line survives
    assert got[4]["n_lines"] == 4 and got[4]["n_dropped"] == 2
    assert got[4]["clean_fp"] == fp("\nonly-doc-4 text")
    # empty / NULL text: one empty line, kept, fp of ""
    for d in (5, 6):
        assert got[d]["n_lines"] == 1 and got[d]["n_dropped"] == 0
        assert got[d]["clean_fp"] == fp("")


def test_line_dedup_min_df_boundary(spark):
    rows = [
        (0, "shared line\nsolo a"),
        (1, "shared line\nsolo b"),
        (2, "solo c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    at2 = {r["doc_id"]: r for r in D.line_dedup(df, min_df=2).collect()}
    at3 = {r["doc_id"]: r for r in D.line_dedup(df, min_df=3).collect()}
    assert at2[0]["n_dropped"] == 1 and at2[1]["n_dropped"] == 1
    assert all(r["n_dropped"] == 0 for r in at3.values())


def test_word_shingles_padding_and_distinct(spark):
    rows = [
        (0, "a b c d"),          # 2 full 3-grams
        (1, "a b"),               # short: one padded whole-text shingle
        (2, "solo"),              # single token
        (3, ""),                  # empty -> one "" shingle
        (4, None),                # NULL text behaves like empty
        (5, "x y x y x y"),       # duplicate 3-grams collapse to distinct
        (6, "  a   b  c  "),      # whitespace runs collapse in shingles
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in D.word_shingles(df, n=3).collect():
        got.setdefault(r["doc_id"], set()).add(r["shingle"])
    assert got[0] == {"a b c", "b c d"}
    assert got[1] == {"a b"}
    assert got[2] == {"solo"}
    assert got[3] == {""} and got[4] == {""}
    assert got[5] == {"x y x", "y x y"}
    assert got[6] == {"a b c"}
    # every doc has >= 1 shingle
    assert set(got) == set(range(7))
