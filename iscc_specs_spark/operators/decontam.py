"""Benchmark decontamination — flag training documents that overlap an
evaluation set at the n-gram level.

The standard training-data hygiene step (the GPT-3 appendix-C recipe, kept
by every major open corpus since): a document is *contaminated* when it
shares at least one 13-token n-gram with any benchmark/eval document, and
contaminated documents are dropped (or quarantined) before training so
benchmark scores measure generalization rather than memorization.

Spark-first shape — the two sides are wildly asymmetric and the plan
exploits it:

* the EVAL side (benchmarks are megabytes, not terabytes) reduces to a
  distinct-gram set and is **broadcast** — the corpus never shuffles to
  meet it;
* the CORPUS side is one ``word_shingles`` pass (posexplode + window lead
  + concat_ws, whole-stage codegen — see dedup_variants.word_shingles for
  the measured 10× vs interpreted higher-order functions) whose single
  doc_id-keyed exchange is reused by both downstream aggregates (gram
  count and hit count group on the same key — no second shuffle).

At 100 TB the per-doc cost is O(tokens) with one bounded broadcast and one
doc_id-partitioned exchange; no join ever carries the corpus against
itself. Reference scope note: the reference engine
(/root/reference/src/iscc/iscc.py) has no eval-overlap surface at all —
this is beyond-reference, built from its 13-gram text-sketch vocabulary
(iscc.py:120 content_id_text's window width).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iscc_specs_spark.operators.dedup_variants import word_shingles


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document contamination report against an eval set.

    ``docs`` and ``eval_docs`` both carry (``id_col``, text). Returns one
    row per input doc: ``(id_col, n_grams, n_hit_grams, contaminated)``
    where ``n_grams`` counts the doc's distinct word ``n``-grams (docs
    shorter than ``n`` tokens contribute their whole text as one gram —
    the word_shingles padding quirk, shared with ngram_jaccard so both
    operators agree on what "an n-gram of a short doc" means),
    ``n_hit_grams`` counts how many of those appear anywhere in the eval
    set, and ``contaminated`` is ``n_hit_grams > 0``.

    Empty-text grams ("" on either side) never match: an empty eval doc
    must not condemn every empty corpus doc.
    """
    # one pass over the corpus shingles: a left broadcast probe of the eval
    # set tags each gram, and gram count + hit count come out of a SINGLE
    # doc_id aggregate — the shingle table has exactly one consumer (no
    # re-expansion, no checkpoint) and the aggregate reuses the window
    # build's doc_id partitioning (no second corpus-side exchange)
    sh = word_shingles(docs.select(F.col(id_col).alias("doc_id"), "text"), n)
    eval_grams = (
        word_shingles(
            eval_docs.select(F.col(id_col).alias("doc_id"), "text"), n
        )
        .where(F.col("shingle") != "")
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    report = (
        sh.join(F.broadcast(eval_grams), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_hit_grams"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(report, "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("n_hit_grams"), F.lit(0)).alias("n_hit_grams"),
            (F.coalesce(F.col("n_hit_grams"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )
