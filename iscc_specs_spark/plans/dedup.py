"""End-to-end near-duplicate detection + clustering pipeline.

pages → ① codes (Arrow-vectorized codegen) → ② verified dup pairs
(exact ∪ MinHash-LSH ∪ SimHash, native verification) → ③ clusters
(large-star/small-star CC) → ④ canonical pick (keep oldest warc_ts).

Each stage is materialized through the StageStore seam (parquet snapshot +
manifest); a rerun with the same config resumes from the last completed
stage (kill-after-stage produces byte-identical final clusters — T4).
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iscc_specs_spark.operators.codegen import compute_codes
from iscc_specs_spark.operators.cluster import assign_clusters
from iscc_specs_spark.operators import lsh
from iscc_specs_spark.sources.storage import StageStore, config_hash


@dataclass
class DedupConfig:
    tracks: tuple[str, ...] = ("text", "data")
    bands: int = lsh.DEFAULT_BANDS
    rows: int = lsh.DEFAULT_ROWS
    bucket_cap: int = 64
    cid_max: int = lsh.CID_T_MAX_HAMMING
    sim_max: int = lsh.SIMHASH_MAX_HAMMING
    lineage: bool = True
    # >0: write the url-keyed stage tables (codes, clusters, canonical)
    # hash-BUCKETED by url into this many buckets (sources/storage.py
    # write_bucketed). Every url-equi-join among resumed stages — the
    # canonical pick's codes ⋈ clusters, any downstream key probe — then
    # runs exchange-free off the bucketed scans (plan-proved in
    # tests/test_storage_bucketed.py / test_pipeline.py). Default off:
    # at benchmark sizes the fixed per-bucket file overhead outweighs the
    # saved shuffle; at 100 TB bucket counts are sized to the cluster.
    bucket_by_url: int = 0


def lsh_metrics(band_table: DataFrame, bucket_cap: int) -> dict:
    """Bucket-size distribution — the observable record of skew mitigation."""
    row = (
        band_table.groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("n"))
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("n").alias("max_bucket"),
            F.sum(F.when(F.col("n") > bucket_cap, 1).otherwise(0)).alias("capped_buckets"),
            F.sum(F.when(F.col("n") > bucket_cap, F.col("n")).otherwise(0)).alias(
                "rows_in_capped"
            ),
        )
        .collect()[0]
    )
    return {k: int(row[k] or 0) for k in row.asDict()}


def probe_band_stage(
    spark: SparkSession, store: StageStore, pfx: list[int] | None = None
) -> DataFrame:
    """Read a run's at-rest banded stage table, statically pruned to the
    given ``band_pfx`` buckets — the batch mirror of the streaming index
    probe (streaming/ingest.read_band_index). An incremental re-check of a
    key set against a finished snapshot computes the keys' prefixes with
    :func:`lsh.band_pfx` and passes them here; Spark pushes the IN-list
    into PartitionFilters, so probe I/O is bounded by prefix coverage, not
    snapshot size (plan-gated in tests/test_pipeline.py)."""
    df = store.read(spark, "bands")
    if pfx is not None:
        df = df.where(F.col("band_pfx").isin([int(p) for p in pfx]))
    return df


def canonical_pick(codes: DataFrame, clusters: DataFrame) -> DataFrame:
    """(url, cluster_id, is_canonical): keep the oldest (warc_ts, url) per
    cluster.

    min_by aggregation, NOT a row_number window: the window's
    partitionBy(cluster_id) sort puts a degenerate mega-cluster (a template
    farm is ~10⁴ members at 1 M pages, unbounded at 10¹²) into a single
    sorting task, while min_by partially aggregates map-side — the shuffle
    carries one candidate row per (map partition, cluster), so no cluster
    size can skew it. The member→champion join is a plain equi-join on
    cluster_id (AQE skew-split-able; O(k) data movement, no per-cluster
    sort).

    NULL ordering: Spark's struct ordering inside ``min_by`` is nulls-FIRST,
    so a NULL warc_ts wins the pick; the DuckDB twins pin
    ``ORDER BY warc_ts ASC NULLS FIRST, url`` to match (oracles.py)."""
    members = codes.select("url", "warc_ts").join(clusters, "url")
    champs = members.groupBy("cluster_id").agg(
        F.min_by("url", F.struct("warc_ts", "url")).alias("_champ")
    )
    return members.join(champs, "cluster_id").select(
        "url",
        "cluster_id",
        (F.col("url") == F.col("_champ")).alias("is_canonical"),
    )


def run_dedup(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    cfg: DedupConfig | None = None,
    collect_lsh_metrics: bool = True,
) -> dict:
    """Returns {"clusters": DataFrame, "store": StageStore, ...stage dfs}."""
    cfg = cfg or DedupConfig()
    store = StageStore(out_dir, config_hash(asdict(cfg)), lineage=cfg.lineage)

    def _write_url_stage(df, name):
        # url-keyed stages optionally go down bucketed so their mutual
        # equi-joins never shuffle on resume (DedupConfig.bucket_by_url)
        if cfg.bucket_by_url:
            return store.write_bucketed(
                df, name, key="url", buckets=cfg.bucket_by_url
            )
        return store.write(df, name)

    def _read_url_stage(name):
        if cfg.bucket_by_url:
            return store.read_bucketed(spark, name)
        return store.read(spark, name)

    # ① codes
    if store.has("codes"):
        codes = _read_url_stage("codes")
    else:
        codes = _write_url_stage(compute_codes(pages, cfg.tracks), "codes")

    # ② dup pairs
    if store.has("dup_pairs"):
        pairs = store.read(spark, "dup_pairs")
    else:
        if "tophash" not in codes.columns:
            # text-only run: no Instance-ID — disable the exact stage by
            # making every "group" the url itself
            codes = codes.withColumn("tophash", F.col("url"))
        # one slim representative table feeds BOTH the band stage and the
        # exact-dup pairing (previously two independent full-corpus
        # aggregations)
        slim = lsh.rep_codes(codes).localCheckpoint(eager=True)
        # the banded representative table is a WRITTEN stage, at rest
        # partitioned by band_pfx (pmod of the band key): one banding pass
        # feeds both the metrics aggregation and the pair generator, the
        # manifest records the bucketed layout, and a key-set probe of the
        # stage (e.g. an incremental re-check against this snapshot) reads
        # only matching partition directories — same contract as the
        # streaming band index (streaming/ingest.py)
        if store.has("bands"):
            band_rows = store.read(spark, "bands")
        else:
            band_rows = store.write(
                lsh.band_rows_table(slim, cfg.bands, cfg.rows).withColumn(
                    "band_pfx", lsh.band_pfx()
                ),
                "bands",
                partition_by=["band_pfx"],
            )
        metrics = (
            lsh_metrics(band_rows, cfg.bucket_cap) if collect_lsh_metrics else {}
        )
        pairs = store.write(
            lsh.dup_pairs(
                codes, cfg.bands, cfg.rows, cfg.bucket_cap, cfg.cid_max,
                cfg.sim_max, slim=slim, band_rows=band_rows,
                # the at-rest stage table keeps its jaccard_est column
                # (operator default flipped to False in r07)
                compute_jaccard=True,
            ),
            "dup_pairs",
            metrics,
        )

    # ③ clusters (+ singleton attach)
    if store.has("clusters"):
        clusters = _read_url_stage("clusters")
    else:
        clusters = _write_url_stage(
            assign_clusters(codes.select("url"), pairs), "clusters"
        )

    # ④ canonical representative per cluster: keep oldest (warc_ts, url)
    # (skew-free min_by aggregation — see canonical_pick; with
    # bucket_by_url the members join reads two co-bucketed scans and
    # starts shuffle-free)
    if store.has("canonical"):
        canonical = _read_url_stage("canonical")
    else:
        canonical = _write_url_stage(canonical_pick(codes, clusters), "canonical")

    return {
        "codes": codes,
        "dup_pairs": pairs,
        "clusters": clusters,
        "canonical": canonical,
        "store": store,
    }
