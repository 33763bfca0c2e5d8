#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Default mode (what the driver runs):
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py
runs the headline queries (full ISCC dedup pipeline + operator suite) on
local[$SPARK_GRAFT_CPUS] at $SPARK_GRAFT_SF_DIR and prints
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Scaling-evidence mode (north rule: ≥0.8 efficiency from N to 4N):
    python bench.py --scaling [--docs 100000]
runs the same pipeline job on the same synthetic pages input at local[8]
and local[32] (fresh JVM each, via subprocess) and rewrites BENCH.md.

Single pipeline run (used by --scaling subprocesses):
    python bench.py --pipeline-only --cores 8 --docs 100000
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    # ISCC pipeline stages (kernel UDFs + LSH + CC)
    "iscc_codes",
    "dedup_pairs",
    "dedup_clusters",
    "substring_matches",
    # training-data operators
    "exact_dedup",
    "ngram_jaccard",
    "embedding_neardup",
    "ann_topk",
    "ann_lsh_topk",
    "token_counts",
    "quality_scores",
    "language_id",
    "fingerprints",
    "multimodal_features",
    # relational surface
    "q1_pricing",
    "top_customers",
    "events_by_type",
    "user_last_event",
]


def _spark(cores: int, shuffle: int | None = None):
    from iscc_specs_spark.session import get_spark

    return get_spark(
        "bench", cores=cores, shuffle_partitions=shuffle or max(2 * cores, 16)
    )


def _force(df) -> int:
    """Fully execute a plan without collecting (noop sink keeps all columns
    alive — a bare count() would let Catalyst prune projection work)."""
    df.write.mode("overwrite").format("noop").save()
    return 0


def _time(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def run_headline(sf_dir: str, cpus: int) -> dict:
    import __spark_entry__ as entrymod

    spark = _spark(cpus)
    qs = entrymod.queries()
    # warmup: JVM JIT + Arrow + Python-UDF worker pool (one tiny pandas-UDF
    # pass per executor thread spins up workers and builds the normalize
    # tables, so the first timed UDF query isn't charged for cold start)
    from iscc_specs_spark.operators.codegen import compute_codes
    from iscc_specs_spark.sources.pages import generate_pages

    _force(compute_codes(generate_pages(spark, 4 * cpus, partitions=2 * cpus)))
    qs["token_counts"](spark, sf_dir).limit(10).collect()

    times: dict[str, float] = {}
    for name in HEADLINE:
        times[name] = _time(lambda: _force(qs[name](spark, sf_dir)))

    # end-to-end dedup pipeline (codes → pairs → clusters) timed as one job
    from iscc_specs_spark.operators import lsh
    from iscc_specs_spark.operators.cluster import assign_clusters
    from iscc_specs_spark.operators.codegen import compute_codes
    from iscc_specs_spark.sources.pages import pages_from_documents

    pages = pages_from_documents(spark, sf_dir)
    n_docs = pages.count()

    def pipeline():
        codes = compute_codes(pages, ("text", "data")).localCheckpoint(eager=True)
        pairs = lsh.dup_pairs(codes)
        _force(assign_clusters(codes.select("url"), pairs))

    times["dedup_pipeline"] = _time(pipeline)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    total = round(sum(times.values()), 3)
    result = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "n_docs": n_docs,
        "pipeline_docs_per_sec": round(n_docs / times["dedup_pipeline"], 2),
    }
    spark.stop()
    return result


def run_pipeline_only(cores: int, n_docs: int) -> dict:
    """Same job, same input, one parallelism level — scaling evidence."""
    from iscc_specs_spark.operators import lsh
    from iscc_specs_spark.operators.cluster import assign_clusters
    from iscc_specs_spark.operators.codegen import compute_codes
    from iscc_specs_spark.sources.pages import generate_pages

    spark = _spark(cores)
    # identical deterministic input at every parallelism level; partition
    # count fixed (128) so the *data layout* is constant and only executor
    # parallelism varies between runs
    pages = generate_pages(spark, n_docs, partitions=128).localCheckpoint(
        eager=True  # synthesis excluded from the timed job
    )
    compute_codes(pages.limit(64), ("text", "data")).collect()  # warmup

    def job():
        codes = compute_codes(pages, ("text", "data")).localCheckpoint(eager=True)
        pairs = lsh.dup_pairs(codes)
        _force(assign_clusters(codes.select("url"), pairs))

    wall = _time(job)
    spark.stop()
    return {
        "cores": cores,
        "n_docs": n_docs,
        "wall_sec": wall,
        "docs_per_sec": round(n_docs / wall, 2),
    }


def run_scaling(n_docs: int) -> None:
    results = []
    for cores in (8, 32):
        out = subprocess.run(
            [
                sys.executable, __file__, "--pipeline-only",
                "--cores", str(cores), "--docs", str(n_docs),
            ],
            capture_output=True, text=True, check=True, cwd=REPO,
        )
        results.append(json.loads(out.stdout.strip().splitlines()[-1]))
    r8, r32 = results
    eff = round(r32["docs_per_sec"] / (4 * r8["docs_per_sec"]), 3)
    report = {
        "local8": r8,
        "local32": r32,
        "scaling_efficiency_8_to_32": eff,
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(report))
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(
            "# BENCH — scaling evidence (north rule: ≥0.8 efficiency N→4N)\n\n"
            "Sandbox protocol per BASELINE.md: same job (full dedup pipeline:"
            " codegen → LSH → verify → connected components), same"
            f" deterministic input ({n_docs} synthetic Common-Crawl-style"
            " pages, 128 fixed partitions), local[8] vs local[32], fresh JVM"
            " each.\n\n"
            "| parallelism | wall (s) | docs/sec |\n|---|---|---|\n"
            f"| local[8] | {r8['wall_sec']} | {r8['docs_per_sec']} |\n"
            f"| local[32] | {r32['wall_sec']} | {r32['docs_per_sec']} |\n\n"
            f"**Scaling efficiency (8→32 cores, 4×): {eff}** "
            f"(target ≥ 0.8 → {'PASS' if eff >= 0.8 else 'FAIL'})\n\n"
            f"Reproduce: `python bench.py --scaling --docs {n_docs}`\n"
        )


def main() -> None:
    args = sys.argv[1:]
    if "--pipeline-only" in args:
        cores = int(args[args.index("--cores") + 1]) if "--cores" in args else 8
        docs = int(args[args.index("--docs") + 1]) if "--docs" in args else 100000
        print(json.dumps(run_pipeline_only(cores, docs)))
        return
    if "--scaling" in args:
        docs = int(args[args.index("--docs") + 1]) if "--docs" in args else 100000
        run_scaling(docs)
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    print(json.dumps(run_headline(sf_dir, cpus)))


if __name__ == "__main__":
    main()
