from __future__ import annotations

from iscc_specs_spark.operators import substring as S


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_long_run_found(spark):
    shared = "".join(f"common-run-{i:04d} " for i in range(30))  # 480 chars
    rows = [
        (0, "AAAA unrelated prefix here. " + shared + "tail zero."),
        (1, "BBBB totally different opening text! " + shared + "other tail."),
        (2, "no overlap with anything else at all, short doc."),
    ]
    got = S.substring_matches(_mk(spark, rows), min_len=64).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in got}
    assert (0, 1) in pairs
    assert all(p == (0, 1) for p in pairs)
    m = [r for r in got if (r["doc_a"], r["doc_b"]) == (0, 1)][0]
    # span positions fall inside the shared run in both docs
    assert m["match_len_lb"] >= 64
    assert m["a_start"] >= 28 and m["b_start"] >= 37
    # delta-consistency: spans refer to the same shared text
    a_text, b_text = rows[0][1], rows[1][1]
    frag = a_text[m["a_start"] - 1 : m["a_start"] - 1 + m["match_len_lb"]]
    assert frag in b_text


def test_no_false_pairs(spark):
    rows = [
        (0, " ".join(f"alpha{i}" for i in range(100))),
        (1, " ".join(f"beta{i}" for i in range(100))),
    ]
    assert S.substring_matches(_mk(spark, rows), min_len=48).count() == 0


def test_cut_removes_later_copy(spark):
    shared = "".join(f"common-run-{i:04d} " for i in range(30))  # 480 chars
    rows = [
        (0, "AAAA unrelated prefix here. " + shared + "tail zero."),
        (1, "BBBB totally different opening text! " + shared + "other tail."),
        (2, "no overlap with anything else at all, short doc."),
    ]
    got = {r["doc_id"]: r for r in S.substring_cut(_mk(spark, rows), min_len=64).collect()}
    assert len(got) == 3
    # keep-first: doc 0 untouched, doc 2 untouched
    for d in (0, 2):
        assert got[d]["n_spans_cut"] == 0
        assert got[d]["chars_cut"] == 0
        assert got[d]["clean_text"] == rows[d][1]
        assert got[d]["clean_len"] == len(rows[d][1])
    # doc 1 loses (most of) the shared run, keeps its unique prefix + tail
    r1 = got[1]
    assert r1["n_spans_cut"] == 1
    assert r1["chars_cut"] >= 64
    assert r1["clean_text"].startswith("BBBB totally different opening text! ")
    assert r1["clean_text"].endswith("other tail.")
    assert r1["clean_len"] == len(rows[1][1]) - r1["chars_cut"]
    assert "common-run-0010" not in r1["clean_text"]
    # the cut region is exactly the reported match span
    m = S.substring_matches(_mk(spark, rows), min_len=64).collect()[0]
    expect = rows[1][1][: m["b_start"] - 1] + rows[1][1][m["b_start"] - 1 + m["match_len_lb"]:]
    assert r1["clean_text"] == expect


def test_cut_merges_overlapping_spans(spark):
    import pyspark.sql.functions as F  # noqa: F401

    rows = [(7, "x" * 100)]
    matches = spark.createDataFrame(
        [(1, 7, 1, 10, 2, 30), (2, 7, 1, 25, 2, 30), (3, 7, 1, 80, 2, 15)],
        "doc_a long, doc_b long, a_start int, b_start int, n_anchors long, match_len_lb int",
    )
    r = S.substring_cut(_mk(spark, rows), matches=matches).collect()[0]
    # spans [10,40) and [25,55) merge into [10,55); [80,95) stays separate
    assert r["n_spans_cut"] == 2
    assert r["chars_cut"] == 45 + 15
    assert r["clean_len"] == 100 - 60
    assert r["clean_text"] == "x" * 9 + "x" * (80 - 55) + "x" * (101 - 95)


def test_cut_span_at_text_boundaries(spark):
    rows = [(3, "abcdefghij")]
    matches = spark.createDataFrame(
        [(0, 3, 1, 1, 2, 4), (1, 3, 1, 8, 2, 3)],
        "doc_a long, doc_b long, a_start int, b_start int, n_anchors long, match_len_lb int",
    )
    r = S.substring_cut(_mk(spark, rows), matches=matches).collect()[0]
    # cut [1,5) and [8,11): keep "efg"
    assert r["clean_text"] == "efg"
    assert r["n_spans_cut"] == 2 and r["chars_cut"] == 7


def test_df_cap_drops_boilerplate(spark):
    boiler = "".join(f"boilerplate-{i:03d} " for i in range(20))  # ~320 chars
    rows = [(i, f"doc {i} unique start. " + boiler) for i in range(12)]
    got = S.substring_matches(
        _mk(spark, rows), min_len=64, df_cap=4
    ).count()
    assert got == 0  # anchors inside the boilerplate exceed df_cap → dropped
