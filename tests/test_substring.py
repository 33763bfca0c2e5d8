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


def test_df_cap_drops_boilerplate(spark):
    boiler = "".join(f"boilerplate-{i:03d} " for i in range(20))  # ~320 chars
    rows = [(i, f"doc {i} unique start. " + boiler) for i in range(12)]
    got = S.substring_matches(
        _mk(spark, rows), min_len=64, df_cap=4
    ).count()
    assert got == 0  # anchors inside the boilerplate exceed df_cap → dropped
