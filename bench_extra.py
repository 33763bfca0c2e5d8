"""Per-query timing harness for optimization work (bench.py is frozen for
measurement; this file exists so individual queries can be isolated with
the noop sink per the optimization guide §1.4 without touching bench.py).

Usage: python bench_extra.py <query> [<query> ...] [--reps N]

Times each named query (same builders as scripts/dump_plans.py — i.e. the
same production variants bench.py runs) with the noop sink, min-of-N, and
prints one JSON line {"query": sec, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main():
    argv = sys.argv[1:]
    reps = 2
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = [a for a in argv if not a.startswith("--")]

    from dump_plans import build_queries

    from iscc_specs_spark.session import get_spark

    spark = get_spark(
        "bench_extra", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=max(
            2 * int(os.environ.get("SPARK_GRAFT_CPUS", "32")), 16
        ),
    )
    qs = build_queries(spark)

    # warmup: spin up Python workers / JIT like bench.py does
    from iscc_specs_spark.operators.codegen import compute_codes
    from iscc_specs_spark.sources.pages import generate_pages

    compute_codes(generate_pages(spark, 128, partitions=64)).write.mode(
        "overwrite"
    ).format("noop").save()

    import gc

    out = {}
    for name in args:
        times = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            qs[name]().write.mode("overwrite").format("noop").save()
            times.append(round(time.perf_counter() - t0, 3))
            # release the rep's localCheckpoint blocks before the next one
            # (same accumulation guard as bench.py's pipeline reps)
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        out[name] = min(times)
        out[f"{name}__all"] = times
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
