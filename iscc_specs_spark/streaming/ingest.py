"""Structured Streaming ingest: continuous pages → codes.

The reference has zero streaming semantics (SURVEY.md §1.2) and the
north-rule resumability is batch snapshot/restart — but a production crawl
delivers pages continuously, so the engine also exposes the codegen stage as
a streaming sink:

    pages stream (file source over the same pages schema)
      → compute_codes (the identical Arrow-vectorized mapInPandas stage —
        mapInPandas is streaming-capable, no separate code path)
      → foreachBatch append into a codes table partitioned by ingest batch

Exactly-once: Spark's streaming checkpoint (offset log + commit log) makes
each micro-batch replay idempotent; the sink writes each batch into its own
``ingest_batch=<id>`` partition directory with dynamic partition overwrite,
so a replayed batch overwrites itself instead of duplicating. Downstream
(LSH/clustering) runs as periodic batch jobs over the accumulated table —
near-dup clustering is a global fixpoint, not a per-window computation, so
windowed streaming state would be the wrong tool (documented deviation in
SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from iscc_specs_spark.operators.codegen import compute_codes

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

# dup_flags state schema (ingest_batch is the partition column). Consumers
# must read with this explicit schema: a stream whose batches produced zero
# flags so far leaves an empty partitioned dir (only _SUCCESS), which
# schema inference cannot read.
FLAGS_SCHEMA = "url string, dup_of string, src string, ingest_batch int"

# The maintained band index at ``state_dir/bands`` is partitioned by
# (ingest_batch, band_pfx) where band_pfx = pmod(xxhash64(band_id,
# band_hash), INDEX_BUCKETS): ingest_batch gives replay-safe `< batch_id`
# pruning, band_pfx gives the vs-history probe *static partition pruning*
# down to the new batch's own key prefixes — per-batch probe I/O is bounded
# by |distinct new prefixes| / INDEX_BUCKETS of the index instead of a full
# scan. The bucket count must stay constant for a state dir's lifetime
# (it is baked into the stored directory layout); indexes written before
# this column existed are detected by the missing column and read unpruned.
# The prefix expression and bucket count are shared with the batch
# pipeline's at-rest band stage table (operators/lsh.py).
from iscc_specs_spark.operators.lsh import (  # noqa: E402
    BAND_PFX_BUCKETS as INDEX_BUCKETS,
    band_pfx,
)


def read_dup_flags(spark: SparkSession, state_dir: str) -> DataFrame:
    """Accumulated dup-flags state, schema-stable even when no batch has
    emitted a flag yet (empty dir → empty DataFrame, absent dir → empty
    DataFrame, never a schema-inference failure)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(FLAGS_SCHEMA).parquet(f"{state_dir}/dup_flags")
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], FLAGS_SCHEMA)
        raise


def read_pages_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over parquet drops of the pages schema (a stand-in
    for a Kafka/WARC-fetcher source; swapping the source format is a one-line
    change here)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def _start_stream(
    df: DataFrame, sink, checkpoint_dir: str, trigger_once: bool
) -> StreamingQuery:
    """Shared writeStream scaffolding for every track — append mode,
    checkpointed ``foreachBatch``, optional run-to-completion trigger —
    in ONE place so exactly-once wiring cannot diverge between tracks."""
    writer = (
        df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _partition_overwrite_sink(out_dir: str):
    """``foreachBatch`` body shared by the three codes tracks: exactly-once
    via per-batch ``ingest_batch`` dynamic partition overwrite (a replayed
    batch overwrites its own partition)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(out_dir)
        )

    return sink


def start_codes_stream(
    pages_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    tracks: tuple[str, ...] = ("text", "data"),
    trigger_once: bool = True,
) -> StreamingQuery:
    """pages stream → codes table, exactly-once via checkpoint + per-batch
    partition overwrite."""
    codes = compute_codes(pages_stream, tracks)
    return _start_stream(
        codes, _partition_overwrite_sink(out_dir), checkpoint_dir, trigger_once
    )


def read_assets_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over parquet drops of the multimodal asset schema
    (operators/multimodal.py:ASSET_SCHEMA)."""
    from iscc_specs_spark.operators.multimodal import ASSET_SCHEMA

    return (
        spark.readStream.schema(ASSET_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def start_image_codes_stream(
    assets_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Multimodal assets arriving continuously → Content-ID-Image table.

    The identical Arrow-batched ``image_codes`` stage as batch (mapInPandas
    is streaming-capable — no separate code path): PNG/GIF payloads run the
    real decode → normalize → DCT-hash kernel. Exactly-once the same way as
    the text stream: checkpoint + per-batch ``ingest_batch`` partition
    overwrite, so a replayed batch overwrites itself."""
    from iscc_specs_spark.operators.multimodal import image_codes

    return _start_stream(
        image_codes(assets_stream),
        _partition_overwrite_sink(out_dir),
        checkpoint_dir,
        trigger_once,
    )


def start_av_codes_stream(
    assets_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Audio/video assets arriving continuously → engine-defined CID-A/CID-V
    fingerprint table — the A/V sibling of :func:`start_image_codes_stream`
    (operators/multimodal.py:av_codes is the identical Arrow-batched stage
    as batch: WAV-PCM window sampling + animated-GIF frame sampling).
    Exactly-once via checkpoint + per-batch ``ingest_batch`` partition
    overwrite, so a replayed batch overwrites itself."""
    from iscc_specs_spark.operators.multimodal import av_codes

    return _start_stream(
        av_codes(assets_stream),
        _partition_overwrite_sink(out_dir),
        checkpoint_dir,
        trigger_once,
    )


def start_incremental_dedup_stream(
    pages_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    tracks: tuple[str, ...] = ("text", "data"),
    trigger_once: bool = True,
    bucket_cap: int = 64,
    index_buckets: int = INDEX_BUCKETS,
) -> StreamingQuery:
    """Streaming near-dup flagging: each micro-batch's pages are coded and
    LSH-matched against every previously ingested document, then appended to
    the accumulated state — new duplicates are flagged as they arrive
    instead of waiting for the next global batch job.

    Per micro-batch (inside ``foreachBatch``, so plain batch DataFrames):

      1. codes for the new pages (same Arrow-vectorized stage as batch);
      2. within-batch dup pairs via the standard ``lsh.dup_pairs``;
      3. batch-vs-history candidates: the *new* batch's band keys join the
         MAINTAINED band index at ``state_dir/bands`` (appended batch by
         batch — history codes are never re-banded, so per-batch kernel
         work stays O(|batch|) regardless of corpus age) — the new side is
         tiny, so Spark broadcasts it and the index streams through;
         verification is the same native Hamming predicate. The index is
         additionally partitioned by ``band_pfx`` (a hash prefix of the
         band key), so the probe statically prunes to the partitions
         holding the new batch's own prefixes instead of scanning the
         whole index;
      4. append codes to ``state_dir/codes``, flags to
         ``state_dir/dup_flags`` and band rows to ``state_dir/bands``,
         each into an ``ingest_batch=<id>`` partition with dynamic
         overwrite — a replayed batch overwrites itself, so the stream
         stays exactly-once end-to-end.

    Flags schema: (url, dup_of, src, ingest_batch) — ``dup_of`` is the
    matched earlier url (within-batch matches point to the pair minimum).
    """
    codes_stream = compute_codes(pages_stream, tracks)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        process_dedup_batch(
            batch_df, batch_id, state_dir, bucket_cap, index_buckets
        )

    return _start_stream(codes_stream, sink, checkpoint_dir, trigger_once)


def _read_history(spark: SparkSession, path: str) -> DataFrame | None:
    """History codes table, or None iff the path does not exist yet (first
    batch). Any other failure — corrupt files, permissions, transient FS
    faults — propagates and fails the stream rather than silently skipping
    vs-history flagging for the batch."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        if (
            "PATH_NOT_FOUND" in str(e)
            or "Path does not exist" in str(e)
            # an empty first batch writes only _SUCCESS — no schema to
            # infer yet, semantically the same as "no history"
            or "UNABLE_TO_INFER_SCHEMA" in str(e)
        ):
            return None
        raise


def _effective_index_buckets(
    state_dir: str, requested: int, sub: str = "bands"
) -> int:
    """The band index's ON-DISK bucket count always wins over the caller's
    parameter: ``band_pfx`` partition pruning is only correct when probe
    prefixes are computed with the same modulus the index was written
    with — a mismatched parameter would silently prune away true
    vs-history matches (missed dup flags, no error). First writer records
    the modulus in ``bands/_INDEX_META.json`` (underscore-prefixed files
    are invisible to Spark's parquet listing); later batches — and
    restarts with a different default — derive it from there. Local-FS
    JSON is the sandbox seam; at warehouse scale this is one more field in
    the table's manifest (sources/storage.py)."""
    import json
    import os

    meta = os.path.join(state_dir, sub, "_INDEX_META.json")
    if os.path.exists(meta):
        with open(meta) as f:
            return int(json.load(f)["index_buckets"])
    return requested


def _record_index_buckets(state_dir: str, n: int, sub: str = "bands") -> None:
    import json
    import os

    meta = os.path.join(state_dir, sub, "_INDEX_META.json")
    if not os.path.exists(meta):
        os.makedirs(os.path.dirname(meta), exist_ok=True)
        # atomic: a crash mid-write must not leave a truncated JSON file —
        # _effective_index_buckets would raise on EVERY later batch (the
        # one crash window with no self-healing path)
        tmp = meta + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"index_buckets": n}, f)
        os.replace(tmp, meta)


def _migrate_legacy_band_index(
    spark: SparkSession, state_dir: str, index_buckets: int
) -> None:
    """One-time in-place upgrade of a pre-``band_pfx`` band index.

    A legacy index is partitioned by ``ingest_batch`` only; merely *reading*
    it unpruned would be correct, but the batch's own band rows are written
    ``(ingest_batch, band_pfx)``-partitioned into the same directory, and
    Spark's parquet reader refuses mixed partition depths ('Conflicting
    directory structures') — so the stream would survive exactly one batch.
    On first contact the legacy table is therefore rewritten once with
    ``band_pfx`` computed under each row's OWN ``ingest_batch`` partition
    (replay semantics keep holding), staged through a sibling directory and
    swapped in with renames. Crash windows are replay-safe: an interrupted
    swap leaves either the untouched legacy table (migration simply reruns)
    or a complete staged table (the swap is finished below); if ``bands/``
    is missing entirely, ``process_dedup_batch``'s codes-backfill path
    rebuilds the index from scratch. Local-FS renames are the sandbox seam
    — on Iceberg this whole function is partition-spec evolution, no
    rewrite."""
    import json
    import os
    import shutil

    bands = os.path.join(state_dir, "bands")
    staging = os.path.join(state_dir, "bands__migrating")
    legacy_dir = os.path.join(state_dir, "bands__legacy")
    # staging is COMPLETE iff its meta file exists AND parses: the meta is
    # written (atomically, today) only after the parquet write finishes —
    # but a pre-upgrade version wrote it non-atomically, so a crash could
    # leave a truncated JSON which, once renamed into bands/, would make
    # _effective_index_buckets raise on every later batch with no
    # self-healing path. An unparsable/key-less meta therefore counts as
    # an INCOMPLETE staging (rmtree + rebuild), never as done.
    def _staging_meta_ok() -> bool:
        try:
            with open(os.path.join(staging, "_INDEX_META.json")) as f:
                return isinstance(json.load(f).get("index_buckets"), int)
        except (OSError, ValueError):
            return False

    staging_done = _staging_meta_ok()
    if not os.path.isdir(bands):
        if os.path.isdir(staging):
            if staging_done:
                os.rename(staging, bands)  # finish an interrupted swap
            else:
                shutil.rmtree(staging)  # partial build: backfill rebuilds
        if os.path.isdir(legacy_dir):
            shutil.rmtree(legacy_dir)  # crash landed mid-swap: old copy
        return
    hb = _read_history(spark, bands)
    if hb is None:
        # bands/ exists but holds no readable data (e.g. a meta-only dir
        # left by a crashed first batch). If a COMPLETE staged copy exists,
        # finish the swap instead of letting the codes-backfill path
        # rebuild the whole index from scratch.
        if os.path.isdir(staging):
            if staging_done:
                shutil.rmtree(bands)
                os.rename(staging, bands)
            else:
                shutil.rmtree(staging)
        if os.path.isdir(legacy_dir):
            shutil.rmtree(legacy_dir)
        return
    if "band_pfx" in hb.columns:
        if os.path.isdir(staging):
            shutil.rmtree(staging)  # stale leftover from a completed swap
        if os.path.isdir(legacy_dir):
            # crash landed between the staging→bands rename and the legacy
            # cleanup: the migrated table is live, drop the old copy
            shutil.rmtree(legacy_dir)
        return
    if os.path.isdir(staging):
        shutil.rmtree(staging)  # incomplete prior attempt: rebuild
    # a legacy-layout dir can still carry a meta (a crash between the old
    # record-meta-first ordering's two steps): the recorded modulus wins
    # over the parameter, same invariant as the probe path
    index_buckets = _effective_index_buckets(state_dir, index_buckets)
    migrated = hb.withColumn("band_pfx", band_pfx(index_buckets))
    (
        migrated.write.mode("overwrite")
        .partitionBy("ingest_batch", "band_pfx")
        .parquet(staging)
    )
    # the modulus the migrated layout was built with must travel with it —
    # written atomically AFTER the parquet write, doubling as the
    # staging-complete marker checked above
    tmp = os.path.join(staging, "_INDEX_META.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"index_buckets": index_buckets}, f)
    os.replace(tmp, os.path.join(staging, "_INDEX_META.json"))
    if os.path.isdir(legacy_dir):
        shutil.rmtree(legacy_dir)
    os.rename(bands, legacy_dir)
    os.rename(staging, bands)
    shutil.rmtree(legacy_dir)


def read_band_index(
    spark: SparkSession,
    state_dir: str,
    batch_id: int,
    new_pfx: list[int] | None = None,
) -> DataFrame | None:
    """Pruned view of the maintained band index for batch ``batch_id``'s
    vs-history probe: replay-safe ``ingest_batch < batch_id`` plus — when
    the layout carries ``band_pfx`` and the probe supplies its prefix set —
    a literal ``band_pfx IN (...)`` partition filter, so the scan lists only
    matching partition directories (static pruning: both predicates are on
    partition columns and appear as PartitionFilters in the plan). Returns
    None iff the index does not exist yet (legacy state dir — caller
    backfills)."""
    hb = _read_history(spark, f"{state_dir}/bands")
    if hb is None:
        return None
    hb = hb.where(F.col("ingest_batch") < F.lit(batch_id))
    if new_pfx is not None and "band_pfx" in hb.columns:
        hb = hb.where(F.col("band_pfx").isin(sorted(new_pfx)))
    return hb.select("url", "band_id", "band_hash")


def process_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    bucket_cap: int = 64,
    index_buckets: int = INDEX_BUCKETS,
) -> None:
    """One micro-batch of the incremental dedup stream (the ``foreachBatch``
    body, exposed at module level so replay semantics are testable and the
    driver contract can run a deterministic two-batch replay).

    Idempotent under replay: history is filtered to ``ingest_batch <
    batch_id`` — when a batch is retried after a failure between the state
    write and the checkpoint commit, its own previously-written partition is
    excluded, so documents never match their own earlier write (which would
    flag every doc as a hamming-0 dup of itself). ``ingest_batch`` is the
    partition column, so the filter is partition pruning, not a scan.

    The historical band table is a *maintained index*, not a per-batch
    recomputation: each batch appends its own band rows to
    ``state_dir/bands`` (same ``ingest_batch`` partition-overwrite sink as
    codes/flags, so replay overwrites itself), and the vs-history probe
    reads that table directly. Without the index, banding the accumulated
    codes table costs O(|history|) *kernel work* per micro-batch — ingest
    cost would grow linearly with corpus age; with it, per-batch work is
    O(|batch|) banding + one pruned probe of the index.

    Index layout: partitioned by (ingest_batch, band_pfx) where band_pfx =
    pmod(xxhash64(band_id, band_hash), index_buckets). Before the probe,
    the new batch's ≤ index_buckets distinct prefixes are collected (a
    bounded driver list, same class as the lineage/metric collects) and
    pushed down as a literal IN partition filter — the probe's scan lists
    only matching partition directories (static pruning, visible in the
    plan's PartitionFilters and in ``inputFiles()``), so probe I/O per
    batch is bounded by the new batch's key-prefix coverage of the index
    rather than the index's full size. The bucket modulus is recorded in
    the index's ``_INDEX_META.json`` on first write and ALWAYS wins over
    the ``index_buckets`` parameter afterwards (a mismatched modulus would
    silently prune away true matches); a legacy index without the
    ``band_pfx`` column is migrated in place on first contact (see
    :func:`_migrate_legacy_band_index` — mixed partition depths would fail
    the next batch's read, so read-unpruned is not a stable posture).
    """
    from iscc_specs_spark.operators import lsh

    spark = batch_df.sparkSession
    # migrate BEFORE recording the modulus: the old record-first ordering
    # could re-create bands/ as a meta-only dir during a replayed crash
    # window, making the migration's finish-swap branch unreachable (the
    # fallback then rebuilt the whole index). The migration derives its
    # own effective modulus; _effective afterwards picks up whichever
    # meta (migrated or pre-existing) is now live.
    _migrate_legacy_band_index(spark, state_dir, index_buckets)
    index_buckets = _effective_index_buckets(state_dir, index_buckets)
    _record_index_buckets(state_dir, index_buckets)
    batch = batch_df.localCheckpoint(eager=True)

    # within-batch pairs (standard path; url_a < url_b → flag url_b)
    intra = lsh.dup_pairs(batch, bucket_cap=bucket_cap,
                          compute_jaccard=False).select(
        F.col("url_b").alias("url"), F.col("url_a").alias("dup_of"),
        F.lit("intra_batch").alias("src"),
    )

    # this batch's contribution to the band index (ALL rows, matching the
    # probe semantics: every historical row must be findable, not just its
    # exact-dup representative)
    own_bands = (
        lsh.minhash_bands(batch).union(lsh.simhash_bands(batch))
    ).withColumn("band_pfx", band_pfx(index_buckets))

    hist = _read_history(spark, f"{state_dir}/codes")
    if hist is not None:
        # exclude this batch's own partition: a replayed batch must not
        # match against its own prior (uncommitted) write
        hist = hist.where(F.col("ingest_batch") < F.lit(batch_id))
    if hist is not None and hist.head(1):
        # materialize both: new_slim is a groupBy shuffle consumed by the
        # banding AND the verify join; nb feeds the prefix collect, the
        # key semi-join and the broadcast probe — lazy, each reference
        # would re-run the aggregation + banding (CLAUDE.md rule)
        new_slim = lsh.rep_codes(batch).localCheckpoint(eager=True)
        hist_slim = hist.select(
            "url", "cid_body", "simhash", "minhash", "tophash"
        )
        nb = (
            lsh.minhash_bands(new_slim)
            .union(lsh.simhash_bands(new_slim))
            .localCheckpoint(eager=True)
        )
        # the new batch's key prefixes: ≤ index_buckets ints, collected on
        # the driver and pushed down as a literal partition filter (static
        # pruning — the probe never lists non-matching band_pfx dirs)
        new_pfx = sorted(
            r[0]
            for r in nb.select(band_pfx(index_buckets).alias("p"))
            .distinct()
            .collect()
        )
        hb = read_band_index(spark, state_dir, batch_id, new_pfx)
        if hb is None:
            # legacy state dir written before the index existed: backfill
            # it once from history codes, under each history row's OWN
            # ingest_batch partition (so replay semantics — `< batch_id`
            # prunes only the replayed batch — keep holding afterwards)
            backfill = (
                lsh.minhash_bands(hist, keep=("ingest_batch",)).union(
                    lsh.simhash_bands(hist, keep=("ingest_batch",))
                )
            ).withColumn("band_pfx", band_pfx(index_buckets))
            (
                backfill.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch", "band_pfx")
                .parquet(f"{state_dir}/bands")
            )
            hb = read_band_index(spark, state_dir, batch_id, new_pfx)
        # vs-history candidates with the engine-standard hot-bucket cap:
        # restrict the index to the new batch's band keys first (semi-join
        # — each history row matches once per key, NOT once per new url),
        # size the matched buckets map-side, then
        #   cold buckets (≤ bucket_cap rows): every (new, hist) pair;
        #   hot buckets: route new members to the bucket's min-url hub
        # so a template-farm band key costs O(|new|) candidates per batch
        # instead of O(|new| × |hist_bucket|) — without this the per-batch
        # candidate volume grows linearly with the mega-cluster's age.
        #
        # Recall under the cap: a bucket only goes hot when > bucket_cap
        # docs share a full band key, which at 16×4 MinHash banding means
        # a template farm of near-identical docs — a new member that is a
        # true near-dup of ANY farm member is a near-dup of the hub too,
        # so the single hub edge preserves CLUSTER recall (curate_state's
        # CC closes the transitive hull; pinned by
        # tests/test_streaming.py::test_hot_bucket_hub_preserves_cluster_
        # recall, and the batch pipeline's identical routing measures
        # 1.0/1.0 at 400 k docs with a planted farm — RECALL.json). The
        # residual miss class is a *heterogeneous* hot bucket (band-hash
        # coincidence between unrelated docs) where the new doc matches a
        # non-hub member only — bounded by cap choice, mirrored exactly in
        # the DuckDB twin so parity never masks it.
        nbn = F.broadcast(nb.withColumnRenamed("url", "new_url"))
        new_keys = nb.select("band_id", "band_hash").dropDuplicates()
        hb_new = hb.join(F.broadcast(new_keys), ["band_id", "band_hash"])
        sized = (
            hb_new.groupBy("band_id", "band_hash")
            .agg(F.count("*").alias("_n"), F.min("url").alias("_hub"))
            .localCheckpoint(eager=True)  # tiny; consumed by both branches
        )
        cold = (
            hb_new.join(
                F.broadcast(
                    sized.where(F.col("_n") <= bucket_cap)
                    .select("band_id", "band_hash")
                ),
                ["band_id", "band_hash"],
            )
            .join(nbn, ["band_id", "band_hash"])
            .select(
                F.col("new_url").alias("url_a"), F.col("url").alias("url_b")
            )
        )
        hot = (
            sized.where(F.col("_n") > bucket_cap)
            .join(nbn, ["band_id", "band_hash"])
            .select(
                F.col("new_url").alias("url_a"), F.col("_hub").alias("url_b")
            )
        )
        cand = (
            cold.unionByName(hot)
            .withColumn("src", F.lit("lsh"))
            .dropDuplicates(["url_a", "url_b"])
        )
        both = new_slim.select(
            F.col("url").alias("url_a"), F.col("cid_body").alias("cid_a"),
            F.col("simhash").alias("sim_a"), F.col("tophash").alias("top_a"),
        ).join(cand, "url_a").join(
            hist_slim.select(
                F.col("url").alias("url_b"), F.col("cid_body").alias("cid_b"),
                F.col("simhash").alias("sim_b"), F.col("tophash").alias("top_b"),
            ),
            "url_b",
        )
        cross = both.where(
            (F.col("url_a") != F.col("url_b"))  # re-crawled url ≠ dup of self
            & (
                (lsh.hamming64(F.col("cid_a"), F.col("cid_b")) <= lsh.CID_T_MAX_HAMMING)
                | (lsh.hamming64(F.col("sim_a"), F.col("sim_b")) <= lsh.SIMHASH_MAX_HAMMING)
                | (F.col("top_a") == F.col("top_b"))
            )
        ).select(
            F.col("url_a").alias("url"), F.col("url_b").alias("dup_of"),
            F.lit("vs_history").alias("src"),
        )
        flags = intra.unionByName(cross)
    else:
        flags = intra

    # flags + codes + this batch's band-index rows, each into its own
    # ingest_batch partition (replay overwrites itself in all three); the
    # band index is additionally partitioned by band_pfx for probe pruning
    for df, sub, parts in (
        (flags, "dup_flags", ("ingest_batch",)),
        (batch, "codes", ("ingest_batch",)),
        (own_bands, "bands", ("ingest_batch", "band_pfx")),
    ):
        (
            df.withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*parts)
            .parquet(f"{state_dir}/{sub}")
        )


def curate_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Periodic curation over the accumulated streaming state — the bridge
    between the streaming and batch surfaces.

    The incremental dup flags ARE an edge list (url → dup_of, one edge per
    detected duplicate relation, intra-batch and vs-history alike), so the
    global canonical corpus is recovered by running the batch engine's own
    operators over the state tables:

        codes(state) + flags-as-edges → connected components →
        canonical_pick (skew-free min_by on (warc_ts, url))

    Returns (url, cluster_id, is_canonical): every ingested url with its
    duplicate cluster and whether it is the cluster's canonical
    representative (the oldest (warc_ts, url) member, matching
    plans/dedup.py §④). Run after any micro-batch to get the
    curated-corpus delta without waiting for a global batch job; a
    rerun over unchanged state is deterministic.
    """
    from iscc_specs_spark.operators.cluster import assign_clusters
    from iscc_specs_spark.plans.dedup import canonical_pick

    codes = _read_history(spark, f"{state_dir}/codes")
    if codes is None:
        # no batch has landed data yet (missing dir, or an empty first
        # micro-batch's _SUCCESS-only drop): schema-stable empty result,
        # same hardening contract as read_dup_flags
        return spark.createDataFrame(
            [], "url string, cluster_id string, is_canonical boolean"
        )
    # a re-crawled url has one codes row per ingesting batch: collapse to
    # one row per url BEFORE clustering — assign_clusters would otherwise
    # emit N cluster rows and canonical_pick's members join would square
    # them (N² identical output rows for a url crawled N times). min()
    # skips NULL warc_ts identically in Spark and DuckDB, so the earliest
    # NON-NULL crawl timestamp represents the url in the canonical pick.
    urls = codes.groupBy("url").agg(F.min("warc_ts").alias("warc_ts"))
    flags = read_dup_flags(spark, state_dir)
    edges = flags.select(
        F.col("url").alias("url_a"), F.col("dup_of").alias("url_b")
    )
    clusters = assign_clusters(urls.select("url"), edges)
    return canonical_pick(urls, clusters)


# ---------------------------------------------------------------------------
# Streaming canonical-URL crawl dedup (re-crawl handling)
# ---------------------------------------------------------------------------

# url_flags state schema (ingest_batch is the partition column); read with
# the explicit schema for the same empty-partition reason as FLAGS_SCHEMA.
URL_FLAGS_SCHEMA = (
    "url string, dup_of string, canon_url string, src string, ingest_batch int"
)


def _url_pfx(buckets: int):
    return F.pmod(F.xxhash64(F.col("canon_url")), F.lit(buckets)).cast("int")


def read_url_flags(spark: SparkSession, state_dir: str) -> DataFrame:
    """Accumulated url-recrawl flags, schema-stable when empty (same
    contract as :func:`read_dup_flags`)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(URL_FLAGS_SCHEMA).parquet(
            f"{state_dir}/url_flags"
        )
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return spark.createDataFrame([], URL_FLAGS_SCHEMA)
        raise


def read_url_index(
    spark: SparkSession,
    state_dir: str,
    batch_id: int,
    new_pfx: list[int] | None = None,
) -> DataFrame | None:
    """Pruned view of the maintained url index for batch ``batch_id``'s
    re-crawl probe: replay-safe ``ingest_batch < batch_id`` plus a literal
    ``url_pfx IN (...)`` partition filter when the probe supplies its
    prefix set (both predicates on partition columns — static pruning,
    same contract as :func:`read_band_index`). Returns None iff the index
    does not exist yet (first batch)."""
    hist = _read_history(spark, f"{state_dir}/urls")
    if hist is None:
        return None
    hist = hist.where(F.col("ingest_batch") < F.lit(batch_id))
    if new_pfx is not None and "url_pfx" in hist.columns:
        hist = hist.where(F.col("url_pfx").isin(sorted(new_pfx)))
    return hist.select("canon_url", "url", "last_ts", "ingest_batch")


def process_url_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    url_buckets: int = INDEX_BUCKETS,
) -> None:
    """One micro-batch of streaming canonical-URL crawl dedup (the
    ``foreachBatch`` body, module-level so replay semantics are testable).

    The batch's pages are canonicalized ONCE (codegen projection), then:

      1. within-batch: one keeper per canonical url via the batch
         operator's rule (latest ``warc_ts``, ties to the smallest url);
         every other spelling is flagged ``src='intra_batch'`` against the
         keeper;
      2. vs history: the keeper set probes the MAINTAINED url index at
         ``state_dir/urls`` — partitioned (ingest_batch, url_pfx), probed
         with a literal prefix IN-list exactly like the band index, so
         probe I/O is bounded by the batch's own prefix coverage, never
         the index's age. A keeper whose canonical url is already indexed
         is flagged ``src='vs_history'`` against the EARLIEST indexed
         spelling (first-arrival wins across batches — a stream cannot
         retract what it already emitted, so later re-crawls are flagged
         rather than replacing; the batch plan's latest-wins rule applies
         when the corpus is re-curated from state);
      3. this batch's keepers append to the index, flags to
         ``state_dir/url_flags``, each under its own ``ingest_batch``
         partition with dynamic overwrite — a replayed batch overwrites
         itself and (via ``ingest_batch < batch_id`` in the probe) never
         matches its own prior uncommitted write.

    The bucket modulus is recorded in ``urls/_INDEX_META.json`` on first
    write and always wins afterwards (same invariant as the band index:
    a mismatched modulus would silently prune true re-crawl matches).
    """
    from iscc_specs_spark.operators.urls import canonical_url, url_dedup

    spark = batch_df.sparkSession
    url_buckets = _effective_index_buckets(state_dir, url_buckets, sub="urls")
    _record_index_buckets(state_dir, url_buckets, sub="urls")
    batch = (
        batch_df.select("url", "warc_ts")
        .withColumn("canon_url", canonical_url("url"))
        .localCheckpoint(eager=True)
    )

    kept = url_dedup(batch, canon_col="canon_url").localCheckpoint(eager=True)
    intra = (
        batch.join(
            kept.select("canon_url", F.col("url").alias("keep_url")),
            "canon_url",
        )
        .where(F.col("url") != F.col("keep_url"))
        .select(
            "url",
            F.col("keep_url").alias("dup_of"),
            "canon_url",
            F.lit("intra_batch").alias("src"),
        )
    )

    keeper = kept.withColumn("url_pfx", _url_pfx(url_buckets))
    new_pfx = sorted(
        r[0] for r in keeper.select("url_pfx").distinct().collect()
    )
    hist = read_url_index(spark, state_dir, batch_id, new_pfx)
    flags = intra
    if hist is not None and hist.head(1):
        first = (
            hist.groupBy("canon_url")
            .agg(F.min(F.struct("ingest_batch", "last_ts", "url")).alias("m"))
            .select("canon_url", F.col("m.url").alias("dup_of"))
        )
        recrawl = (
            keeper.join(first, "canon_url")
            # a re-crawl under the IDENTICAL spelling would flag itself
            # (url == dup_of): drop it — the page is not a dup of a
            # different spelling, and a self-loop flag would make the
            # documented pre-filter composition remove the url entirely
            # (same guard as the content stream's re-crawled-url case)
            .where(F.col("url") != F.col("dup_of"))
            .select(
                "url",
                "dup_of",
                "canon_url",
                F.lit("vs_history").alias("src"),
            )
        )
        flags = intra.unionByName(recrawl)

    for df, sub, parts in (
        (flags, "url_flags", ("ingest_batch",)),
        (
            keeper.select("canon_url", "url", "last_ts", "url_pfx"),
            "urls",
            ("ingest_batch", "url_pfx"),
        ),
    ):
        (
            df.withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*parts)
            .parquet(f"{state_dir}/{sub}")
        )


def start_url_dedup_stream(
    pages_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
    url_buckets: int = INDEX_BUCKETS,
) -> StreamingQuery:
    """Streaming re-crawl dedup: flag every page whose canonical url was
    already ingested (or arrives under several spellings in one batch)
    BEFORE any kernel work — the cheapest duplicate class handled at the
    door, exactly where the batch curation plan's ⓪a stage sits. Compose
    by running this stream's flags as a pre-filter for the incremental
    content-dedup stream, or feed ``read_url_flags`` into curate_state's
    edge list."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        process_url_batch(batch_df, batch_id, state_dir, url_buckets)

    return _start_stream(pages_stream, sink, checkpoint_dir, trigger_once)
