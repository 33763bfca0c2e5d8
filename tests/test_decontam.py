from __future__ import annotations

from pyspark.sql import functions as F

from iscc_specs_spark.operators.decontam import decontaminate


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_planted_overlap(spark):
    """Verbatim copy, embedded window, and clean doc classify correctly."""
    bench = " ".join(f"q{i}" for i in range(20))  # a 20-token eval doc
    eval_docs = _mk(spark, [(900, bench)])
    docs = _mk(
        spark,
        [
            (1, bench),  # verbatim copy → all grams hit
            (2, "intro words " + " ".join(f"q{i}" for i in range(13))
                + " trailing tail"),  # one 13-gram window of the benchmark
            (3, " ".join(f"w{i}" for i in range(30))),  # clean
            (4, "short doc"),  # < 13 tokens, padded gram, no match
        ],
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate(docs, eval_docs, n=13).collect()
    }
    assert out[1]["contaminated"] and out[1]["n_hit_grams"] == out[1]["n_grams"] == 8
    assert out[2]["contaminated"] and out[2]["n_hit_grams"] == 1
    assert not out[3]["contaminated"] and out[3]["n_hit_grams"] == 0
    assert not out[4]["contaminated"] and out[4]["n_grams"] == 1
    assert len(out) == 4  # every input doc reported


def test_decontaminate_empty_text_never_matches(spark):
    """An empty eval doc (padding gram "") must not condemn empty corpus
    docs, and empty corpus docs still get a report row."""
    out = {
        r["doc_id"]: r
        for r in decontaminate(
            _mk(spark, [(1, ""), (2, None), (3, "real text here")]),
            _mk(spark, [(9, "")]),
            n=13,
        ).collect()
    }
    assert len(out) == 3
    assert not any(r["contaminated"] for r in out.values())


def test_decontaminate_short_eval_doc_padded_gram(spark):
    """An eval doc shorter than n contributes its whole text as the gram —
    a corpus doc with the identical short text is contaminated, a longer
    doc merely containing those words is not (window widths differ)."""
    eval_docs = _mk(spark, [(9, "secret eval answer")])
    docs = _mk(
        spark,
        [
            (1, "secret eval answer"),  # identical short text
            (2, "the secret eval answer is hidden in here plus more words "
                "to exceed thirteen tokens overall for sure ok"),
        ],
    )
    out = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(docs, eval_docs, n=13).collect()
    }
    assert out[1] and not out[2]


def test_decontaminate_plan_broadcasts_eval_side(spark):
    """The eval gram set must reach the corpus via a broadcast join — the
    corpus side never shuffles to meet the benchmark."""
    docs = _mk(
        spark, [(i, f"alpha{i} beta{i} gamma{i} delta{i}") for i in range(50)]
    )
    eval_docs = _mk(spark, [(900, "alpha7 beta7 gamma7 delta7")])
    out = decontaminate(docs, eval_docs, n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    flagged = {r["doc_id"] for r in out.where("contaminated").collect()}
    assert flagged == {7}


def test_decontaminate_distinct_grams_counted_once(spark):
    """A gram repeated inside one doc counts once (distinct semantics,
    matching word_shingles / ngram_jaccard)."""
    body = " ".join(f"q{i}" for i in range(13))
    docs = _mk(spark, [(1, body + " " + body)])
    eval_docs = _mk(spark, [(9, body)])
    r = decontaminate(docs, eval_docs, n=13).collect()[0]
    # 26 tokens → 14 windows; window 13 repeats window 0 (the benchmark
    # gram) → 13 distinct grams, of which exactly 1 hits
    assert r["n_hit_grams"] == 1
    assert r["n_grams"] == 13
    assert r["contaminated"]
