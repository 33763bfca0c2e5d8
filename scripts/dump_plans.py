"""Dump `.explain("formatted")` for bench queries into plans/<tag>/.

Usage: python scripts/dump_plans.py <tag> <suffix> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each named query (default: the
round-7 optimization target set). Queries are built exactly as bench.py
builds them (production variants where the bench overrides the driver row).
Note: operators with eager materialization (localCheckpoint / model builds)
execute during plan construction — capturing a plan runs those stages.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from iscc_specs_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_queries(spark):
    from iscc_specs_spark.operators import dsir, lsh
    from iscc_specs_spark.operators.cluster import assign_clusters
    from iscc_specs_spark.operators.dedup_variants import (
        embedding_neardup_gated,
        embedding_neardup_lsh,
        ngram_jaccard_pairs,
    )
    from iscc_specs_spark.operators.ann import rhp_lsh_topk
    from iscc_specs_spark.operators.semantic import semantic_dedup
    from iscc_specs_spark.operators.substring import (
        substring_cut,
        substring_matches,
    )
    from iscc_specs_spark.operators.suffixarray import sa_long_matches
    from iscc_specs_spark.operators.textstats import (
        fingerprints,
        hot_ngrams,
        repetition_stats,
    )

    docs = lambda: entrymod._docs(spark, SF_DIR)
    emb = lambda: entrymod._emb(spark, SF_DIR)

    def _dedup_clusters():
        codes = entrymod._codes(spark, SF_DIR)
        return assign_clusters(codes.select("url"), lsh.dup_pairs(codes))

    def _dsir_topk():
        d = docs()
        model = dsir.dsir_model(
            spark, d, d.where(F.col("doc_id") % 17 == 0),
            buckets=4096, hash_fn="xxh64",
        )
        return dsir.dsir_sample(d, model, k=500, buckets=4096, hash_fn="xxh64")

    return {
        "sa_matches_1k": lambda: sa_long_matches(
            docs().where(F.col("doc_id") % 5 == 0), min_len=48
        ),
        "substring_matches": lambda: substring_matches(
            docs(), min_len=48, anchor="xxh64"
        ),
        "substring_cut": lambda: substring_cut(
            docs(), min_len=48, anchor="xxh64"
        ),
        "fingerprints": lambda: fingerprints(docs(), hash_fn="xxh64"),
        "ann_lsh_topk": lambda: rhp_lsh_topk(
            emb(), emb().where(F.col("vec_id") < 5), k=5, nbits=8,
            ntables=4, dim=entrymod._EMB_DIM,
        ),
        "embedding_neardup_lsh": lambda: embedding_neardup_lsh(
            emb(), threshold=0.4, nbits=4, ntables=8, dim=entrymod._EMB_DIM
        ),
        "embedding_neardup_gated": lambda: embedding_neardup_gated(
            emb(), threshold=0.4, nbits=4, ntables=8, dim=entrymod._EMB_DIM
        ).select("vec_a", "vec_b"),
        "semantic_dedup": lambda: entrymod._q_semantic_dedup(spark, SF_DIR),
        "ann_topk": lambda: entrymod._q_ann_topk(spark, SF_DIR),
        "ann_ivf_topk": lambda: entrymod._q_ann_ivf_topk(spark, SF_DIR),
        "dedup_pairs": lambda: entrymod._q_dedup_pairs(spark, SF_DIR),
        "dedup_clusters": _dedup_clusters,
        "ngram_jaccard": lambda: ngram_jaccard_pairs(
            docs(), n=3, threshold=0.5
        ),
        "repetition_stats": lambda: repetition_stats(docs()),
        "hot_ngrams": lambda: hot_ngrams(docs(), n=5, top_k=100, min_docs=2),
        "dsir_topk": _dsir_topk,
        "line_dedup": lambda: entrymod._q_line_dedup(spark, SF_DIR),
        "c4_filters": lambda: entrymod._q_c4_filters(spark, SF_DIR),
        "decontaminate": lambda: entrymod._q_decontaminate(spark, SF_DIR),
        "suffix_ranks": lambda: entrymod._q_suffix_ranks(spark, SF_DIR),
        "sa_matches": lambda: entrymod._q_sa_matches(spark, SF_DIR),
    }


def main():
    tag, suffix = sys.argv[1], sys.argv[2]
    spark = get_spark("plans", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    qs = build_queries(spark)
    names = sys.argv[3:] or list(qs)
    outdir = os.path.join(REPO, "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name]()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
