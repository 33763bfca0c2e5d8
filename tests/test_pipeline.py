"""T3 (recall vs brute-force oracle) + T4 (resume) end-to-end tests."""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd

from iscc_specs_spark.plans.dedup import DedupConfig, probe_band_stage, run_dedup
from iscc_specs_spark.sources.pages import generate_pages

N_DOCS = 2500

_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def popcount_u64(v: np.ndarray) -> np.ndarray:
    v = v - ((v >> np.uint64(1)) & _M1)
    v = (v & _M2) + ((v >> np.uint64(2)) & _M2)
    v = (v + (v >> np.uint64(4))) & _M4
    return (v * _H01) >> np.uint64(56)


def _oracle_pairs(pdf: pd.DataFrame, cid_max=10, sim_max=3):
    """Brute-force the verification predicate over all pairs (the reference
    semantics: pairwise distance() — /root/reference/src/iscc/iscc.py:426)."""
    cid = pdf["cid_body"].to_numpy().astype(np.int64).view(np.uint64)
    sim = pdf["simhash"].to_numpy().astype(np.int64).view(np.uint64)
    top = pdf["tophash"].to_numpy()
    n = len(pdf)
    pairs = set()
    old = np.seterr(over="ignore")
    try:
        for i in range(n - 1):
            hc = popcount_u64(cid[i] ^ cid[i + 1 :])
            hs = popcount_u64(sim[i] ^ sim[i + 1 :])
            hit = (hc <= cid_max) | (hs <= sim_max) | (top[i + 1 :] == top[i])
            for j in np.nonzero(hit)[0]:
                pairs.add((i, int(i + 1 + j)))
    finally:
        np.seterr(**old)
    return pairs


def _uf(n, pairs):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return [find(x) for x in range(n)]


def _induced_pairs(labels):
    by = {}
    for i, l in enumerate(labels):
        by.setdefault(l, []).append(i)
    out = set()
    for members in by.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                out.add((members[i], members[j]))
    return out


def test_recall_vs_bruteforce_oracle(spark, tmp_path):
    pages = generate_pages(spark, N_DOCS, partitions=8)
    result = run_dedup(spark, pages, str(tmp_path / "run"), DedupConfig())

    codes_pdf = (
        result["codes"]
        .select("url", "cid_body", "simhash", "tophash")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    idx = {u: i for i, u in enumerate(codes_pdf["url"])}
    oracle = _oracle_pairs(codes_pdf)
    oracle_labels = _uf(len(codes_pdf), oracle)
    oracle_cluster_pairs = _induced_pairs(oracle_labels)

    got = result["clusters"].toPandas()
    got_labels_by_url = dict(zip(got["url"], got["cluster_id"]))
    got_labels = [got_labels_by_url[u] for u in codes_pdf["url"]]
    got_cluster_pairs = _induced_pairs(
        [f"g{l}" for l in got_labels]  # labels are urls; namespace them
    )

    assert len(oracle_cluster_pairs) > 100  # planted structure present
    found = len(oracle_cluster_pairs & got_cluster_pairs)
    recall = found / len(oracle_cluster_pairs)
    precision = found / max(len(got_cluster_pairs), 1)
    assert recall >= 0.99, f"recall {recall:.4f}"
    assert precision >= 0.99, f"precision {precision:.4f}"


def test_resume_reproduces_clusters_and_skips_stages(spark, tmp_path):
    out = str(tmp_path / "resume")
    pages = generate_pages(spark, 400, partitions=4)
    r1 = run_dedup(spark, pages, out, DedupConfig())
    c1 = sorted(map(tuple, r1["clusters"].collect()))
    codes_manifest_1 = r1["store"].manifest("codes")

    # simulate dying after stage ② completed: clusters + canonical lost
    for stage in ("clusters", "canonical"):
        os.remove(os.path.join(out, f"{stage}.manifest.json"))

    r2 = run_dedup(spark, pages, out, DedupConfig())
    c2 = sorted(map(tuple, r2["clusters"].collect()))
    assert c1 == c2
    # codes stage was NOT recomputed (same snapshot record)
    assert r2["store"].manifest("codes") == codes_manifest_1

    # config change invalidates resume
    r3 = run_dedup(spark, pages, out, DedupConfig(bucket_cap=32))
    assert r3["store"].manifest("codes")["config_hash"] != codes_manifest_1["config_hash"]


def test_lineage_and_metrics_recorded(spark, tmp_path):
    out = str(tmp_path / "metrics")
    pages = generate_pages(spark, 300, partitions=4)
    r = run_dedup(spark, pages, out, DedupConfig())
    man = r["store"].manifest("dup_pairs")
    assert man["rows"] > 0 and man["wall_ms"] >= 0
    assert man["metrics"]["n_buckets"] > 0
    assert "max_bucket" in man["metrics"] and "capped_buckets" in man["metrics"]
    assert len(r["store"].manifest("codes")["partitions"]) >= 1


def test_canonical_pick_minby_no_window(spark):
    """Canonical pick must be the skew-free min_by aggregation: no Window
    operator (whose partitionBy(cluster_id) sort would put a mega-cluster
    into one task), and the champion is exactly min(warc_ts, url) per
    cluster — verified on a corpus containing the template-farm
    mega-cluster fixture."""
    from pyspark.sql import functions as F

    from iscc_specs_spark.plans.dedup import canonical_pick
    from iscc_specs_spark.sources.pages import generate_pages_with_truth

    # 600 ids → ~6 farm members (doc_id % 101 == 100) in one giant
    # cluster; clusters come straight from the generator's ground truth
    truth = generate_pages_with_truth(
        spark, 600, partitions=4
    ).select("url", "warc_ts", "cluster_id").localCheckpoint(eager=True)
    out = canonical_pick(
        truth.select("url", "warc_ts"), truth.select("url", "cluster_id")
    )

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "min_by" in plan.lower() or "minby" in plan.lower(), plan

    got = {
        r["cluster_id"]: r["url"]
        for r in out.where("is_canonical").collect()
    }
    want = {
        r["cluster_id"]: r["_champ"]
        for r in truth.groupBy("cluster_id")
        .agg(F.expr("min_by(url, struct(warc_ts, url))").alias("_champ"))
        .collect()
    }
    assert got == want
    # exactly one canonical per cluster, every member assigned
    per = out.groupBy("cluster_id").agg(
        F.sum(F.col("is_canonical").cast("int")).alias("n_canon")
    )
    assert per.where("n_canon <> 1").count() == 0
    assert out.count() == 600


def test_generate_pages_slices_union_to_full_range(spark):
    """The ``start`` offset contract the streaming-recall harness
    (bench.py:run_recall_streaming) depends on: the union of consecutive
    doc_id slices is row-identical to one full-range call — every column,
    including the planted truth labels."""
    from iscc_specs_spark.sources.pages import generate_pages_with_truth

    full = generate_pages_with_truth(spark, 300, partitions=4, scale_words=2)
    slices = [
        generate_pages_with_truth(
            spark, 100, partitions=2, scale_words=2, start=lo
        )
        for lo in (0, 100, 200)
    ]
    unioned = slices[0].unionByName(slices[1]).unionByName(slices[2])
    key = lambda r: r["url"]  # noqa: E731
    a = sorted(full.collect(), key=key)
    b = sorted(unioned.collect(), key=key)
    assert len(a) == len(b) == 300
    assert a == b


def test_band_stage_is_bucketed_at_rest(spark, tmp_path):
    """The rep/band table is a WRITTEN stage partitioned by band_pfx: the
    manifest records the layout, the directory has the pfx dirs, a
    key-filtered probe of the stage carries the partition filter (static
    pruning), and resume reuses the stage byte-identically."""
    import json

    from pyspark.sql import functions as F

    out = str(tmp_path / "bandstage")
    pages = generate_pages(spark, 300, partitions=4)
    r1 = run_dedup(spark, pages, out, DedupConfig())
    man = r1["store"].manifest("bands")
    assert man["partition_by"] == ["band_pfx"]
    pfx_dirs = [d for d in os.listdir(out + "/bands") if d.startswith("band_pfx=")]
    assert len(pfx_dirs) > 1
    # resume (kill after stage ②): bands not rewritten, clusters identical
    c1 = sorted(map(tuple, r1["clusters"].collect()))
    bands_manifest_1 = r1["store"].manifest("bands")
    for stage in ("clusters", "canonical"):
        os.remove(os.path.join(out, f"{stage}.manifest.json"))
    r2 = run_dedup(spark, pages, out, DedupConfig())
    assert sorted(map(tuple, r2["clusters"].collect())) == c1
    assert r2["store"].manifest("bands") == bands_manifest_1
    # a key-set probe of the RESUMED snapshot must be a pure pruned parquet
    # scan: both mirror assertions from the streaming gate
    # (test_streaming.test_band_index_probe_plan_is_pruned_scan) — the
    # prefixes land in PartitionFilters (static pruning, probe I/O bounded
    # by prefix coverage) and no Python/banding subtree re-derives history
    probe = probe_band_stage(spark, r2["store"], pfx=[1, 2, 3]).select(
        "band_id", "band_hash", "band_pfx"
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = next((ln for ln in plan.splitlines() if "PartitionFilters" in ln), "")
    assert "band_pfx" in pf, plan
    for banned in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert banned not in plan, plan
    got_pfx = {r["band_pfx"] for r in probe.collect()}
    assert got_pfx and got_pfx <= {1, 2, 3}


def test_bucketed_url_stages_same_results_and_no_shuffle_on_resume(
    spark, tmp_path
):
    """DedupConfig.bucket_by_url: identical cluster assignments to the
    unbucketed run, and the resumed codes ⋈ clusters url-join is
    exchange-free off the co-bucketed scans."""
    import re

    from pyspark.sql import functions as F

    pages = generate_pages(spark, 400, partitions=4).localCheckpoint(eager=True)
    plain = run_dedup(spark, pages, str(tmp_path / "plain"))
    bucketed = run_dedup(
        spark, pages, str(tmp_path / "bucketed"),
        DedupConfig(bucket_by_url=8),
    )
    want = sorted(map(tuple, plain["clusters"].collect()))
    got = sorted(map(tuple, bucketed["clusters"].collect()))
    assert want == got

    # resume: stages come back through read_bucketed with the bucket spec
    res = run_dedup(
        spark, pages, str(tmp_path / "bucketed"),
        DedupConfig(bucket_by_url=8),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = res["codes"].select("url", "cid_body").join(
            res["clusters"], "url"
        )
        txt = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert not re.findall(r"\(\d+\) Exchange\s", txt), txt
        assert joined.count() == 400
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
