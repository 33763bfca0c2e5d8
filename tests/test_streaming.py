from __future__ import annotations

import os

from iscc_specs_spark.operators.codegen import compute_codes
from iscc_specs_spark.sources.pages import generate_pages
from iscc_specs_spark.streaming.ingest import read_pages_stream, start_codes_stream


def test_streaming_codes_match_batch(spark, tmp_path):
    src = str(tmp_path / "pages_src")
    out = str(tmp_path / "codes_out")
    ckpt = str(tmp_path / "ckpt")

    pages = generate_pages(spark, 120, partitions=2)
    # two separate file drops → at least two micro-batches
    pages.where("url like '%/p/1%'").write.parquet(src + "/drop1")
    pages.where("url not like '%/p/1%'").write.parquet(src + "/drop2")
    # file source scans a single dir: move drops into it as files
    import shutil

    os.makedirs(src + "/all")
    n = 0
    for d in ("drop1", "drop2"):
        for f in os.listdir(f"{src}/{d}"):
            if f.endswith(".parquet"):
                shutil.move(f"{src}/{d}/{f}", f"{src}/all/b{n}.parquet")
                n += 1

    q = start_codes_stream(
        read_pages_stream(spark, src + "/all", max_files_per_trigger=1),
        out, ckpt,
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out).drop("ingest_batch")
    want = compute_codes(pages, ("text", "data"))
    g = {r["url"]: r for r in got.collect()}
    w = {r["url"]: r for r in want.collect()}
    assert set(g) == set(w) and len(g) == 120
    for url in w:
        assert g[url]["content_id"] == w[url]["content_id"]
        assert g[url]["instance_id"] == w[url]["instance_id"]

    # restart with same checkpoint: no new batches, no duplicates (idempotent)
    q2 = start_codes_stream(read_pages_stream(spark, src + "/all"), out, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == 120


def test_incremental_dedup_stream(spark, tmp_path):
    """Second micro-batch's near-dups of first-batch docs get flagged
    vs_history; replay with the same checkpoint is idempotent."""
    from iscc_specs_spark.streaming.ingest import start_incremental_dedup_stream

    src = str(tmp_path / "pages_src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt2")

    # block 0 of the generator plants a duplicate cluster at positions 0..k-1
    pages = generate_pages(spark, 40, partitions=1).localCheckpoint(eager=True)
    first = pages.where("url like '%/p/0'")         # cluster base doc
    rest = pages.where("url not like '%/p/0'")      # includes its edit variants
    os.makedirs(src)
    first.coalesce(1).write.parquet(src + "/tmp1")
    rest.coalesce(1).write.parquet(src + "/tmp2")
    import shutil

    for i, d in enumerate(("tmp1", "tmp2")):
        for f in os.listdir(f"{src}/{d}"):
            if f.endswith(".parquet"):
                shutil.move(f"{src}/{d}/{f}", f"{src}/b{i}.parquet")

    q = start_incremental_dedup_stream(
        read_pages_stream(spark, src, max_files_per_trigger=1), state, ckpt
    )
    q.awaitTermination(180)

    codes = spark.read.parquet(state + "/codes")
    assert codes.count() == 40
    flags = spark.read.parquet(state + "/dup_flags")
    hist_hits = {
        (r["url"], r["dup_of"]) for r in flags.where("src = 'vs_history'").collect()
    }
    # the base doc arrived in batch 0; its variants in batch 1 must flag it
    assert any(dup_of.endswith("/p/0") for _, dup_of in hist_hits), hist_hits

    # replay: no new input → state unchanged (exactly-once)
    n_flags = flags.count()
    q2 = start_incremental_dedup_stream(read_pages_stream(spark, src), state, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(state + "/codes").count() == 40
    assert spark.read.parquet(state + "/dup_flags").count() == n_flags


def test_pending_batch_replay_is_idempotent(spark, tmp_path):
    """A batch retried after failure-between-state-write-and-checkpoint-commit
    (its own partition already on disk) must produce byte-identical flags —
    in particular no hamming-0 self-matches against its own prior write."""
    from iscc_specs_spark.streaming.ingest import process_dedup_batch

    state = str(tmp_path / "state_replay")
    pages = generate_pages(spark, 40, partitions=2)
    codes = compute_codes(pages, ("text", "data")).localCheckpoint(eager=True)
    b0 = codes.where("url like '%/p/0'")
    b1 = codes.where("url not like '%/p/0'")

    process_dedup_batch(b0, 0, state)
    process_dedup_batch(b1, 1, state)

    def snap():
        return sorted(
            map(tuple, spark.read.parquet(state + "/dup_flags").collect())
        )

    clean = snap()
    assert any(r[2] == "vs_history" for r in clean), "fixture must cross-match"

    # replay batch 1: state_dir/codes already holds ingest_batch=1
    process_dedup_batch(b1, 1, state)
    replayed = snap()
    assert replayed == clean
    assert not any(url == dup_of for url, dup_of, _, _ in replayed)


def test_history_bands_probed_from_maintained_index(spark, tmp_path):
    """The vs-history probe must read the persisted band index, not re-band
    the accumulated codes table (O(|history|) kernel work per micro-batch).

    Proof by corruption: after batch 0 lands, zero out minhash+simhash in
    the *history codes* partition (keeping cid/tophash, which verification
    uses). A later near-dup batch can then only find its vs_history
    candidate through the band rows persisted at batch-0 time — an
    implementation that re-derives bands from history codes sees garbage
    signatures and finds nothing."""
    from pyspark.sql import functions as F

    from iscc_specs_spark.streaming.ingest import process_dedup_batch

    state = str(tmp_path / "state_bandidx")
    pages = generate_pages(spark, 40, partitions=2)
    codes = compute_codes(pages, ("text", "data")).localCheckpoint(eager=True)
    # block 0: positions 0..1 are a planted duplicate pair (k=2)
    b0 = codes.where("url like '%/p/0'")
    b1 = codes.where("url like '%/p/1'")

    process_dedup_batch(b0, 0, state)
    assert os.path.isdir(state + "/bands/ingest_batch=0")

    # corrupt the signatures in history CODES (band index stays intact)
    corrupted = (
        spark.read.parquet(state + "/codes")
        .where("ingest_batch = 0")
        .withColumn(
            "minhash", F.transform("minhash", lambda x: F.lit(0).cast("long"))
        )
        .withColumn("simhash", F.lit(123456789).cast("long"))
        .localCheckpoint(eager=True)  # break file lineage before overwrite
    )
    (
        corrupted.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch")
        .parquet(state + "/codes")
    )

    process_dedup_batch(b1, 1, state)
    flags = spark.read.parquet(state + "/dup_flags")
    hits = {
        (r["url"], r["dup_of"])
        for r in flags.where("src = 'vs_history'").collect()
    }
    assert any(
        url.endswith("/p/1") and dup_of.endswith("/p/0") for url, dup_of in hits
    ), hits
    assert os.path.isdir(state + "/bands/ingest_batch=1")


def test_read_dup_flags_empty_state(spark, tmp_path):
    """A stream whose batches emitted zero flags leaves an empty partitioned
    dup_flags dir; read_dup_flags must return an empty, correctly-typed
    DataFrame instead of a schema-inference failure (and the same for a
    state dir where no batch ran at all)."""
    from iscc_specs_spark.streaming.ingest import (
        FLAGS_SCHEMA,
        process_dedup_batch,
        read_dup_flags,
    )

    # absent state dir
    missing = read_dup_flags(spark, str(tmp_path / "nonexistent"))
    assert missing.count() == 0
    assert [f.name for f in missing.schema.fields] == [
        "url", "dup_of", "src", "ingest_batch"
    ]

    # batch of singletons only → zero flags written
    state = str(tmp_path / "state_noflags")
    pages = generate_pages(spark, 40, partitions=1)
    codes = compute_codes(pages, ("text", "data")).localCheckpoint(eager=True)
    singles = codes.where(
        "url like '%/p/15' or url like '%/p/16' or url like '%/p/17'"
    )
    process_dedup_batch(singles, 0, state)
    flags = read_dup_flags(spark, state)
    assert flags.count() == 0
    assert flags.schema == spark.createDataFrame([], FLAGS_SCHEMA).schema


def test_streaming_image_codes_match_batch(spark, tmp_path):
    """Image assets arriving in two micro-batch drops produce the same
    Content-ID-Image codes as one batch pass (real PNG decode kernel)."""
    from iscc_specs_spark.operators.multimodal import image_codes, synthetic_assets
    from iscc_specs_spark.streaming.ingest import (
        read_assets_stream,
        start_image_codes_stream,
    )

    src = str(tmp_path / "assets_src")
    out = str(tmp_path / "image_codes_out")
    ckpt = str(tmp_path / "ckpt_img")

    assets = synthetic_assets(spark, n=30).localCheckpoint(eager=True)
    os.makedirs(src)
    assets.where("asset_id < 15").coalesce(1).write.parquet(src + "/tmp1")
    assets.where("asset_id >= 15").coalesce(1).write.parquet(src + "/tmp2")
    import shutil

    n = 0
    for d in ("tmp1", "tmp2"):
        for f in os.listdir(f"{src}/{d}"):
            if f.endswith(".parquet"):
                shutil.move(f"{src}/{d}/{f}", f"{src}/b{n}.parquet")
                n += 1

    q = start_image_codes_stream(
        read_assets_stream(spark, src, max_files_per_trigger=1), out, ckpt
    )
    q.awaitTermination(120)

    got = {
        r["asset_id"]: r["image_cid"]
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["asset_id"]: r["image_cid"] for r in image_codes(assets).collect()
    }
    assert got == want and len(got) == 10  # every 3rd of 30 is an image


def test_streaming_av_codes_match_batch(spark, tmp_path):
    """A/V assets arriving in two micro-batch drops produce the same
    engine-defined fingerprints and failure classes as one batch pass
    (real WAV-PCM / animated-GIF sampling kernels)."""
    from iscc_specs_spark.operators.multimodal import av_codes, synthetic_assets
    from iscc_specs_spark.streaming.ingest import (
        read_assets_stream,
        start_av_codes_stream,
    )

    src = str(tmp_path / "av_src")
    out = str(tmp_path / "av_codes_out")
    ckpt = str(tmp_path / "ckpt_av")

    assets = synthetic_assets(spark, n=30).localCheckpoint(eager=True)
    os.makedirs(src)
    assets.where("asset_id < 15").coalesce(1).write.parquet(src + "/tmp1")
    assets.where("asset_id >= 15").coalesce(1).write.parquet(src + "/tmp2")
    import shutil

    n = 0
    for d in ("tmp1", "tmp2"):
        for f in os.listdir(f"{src}/{d}"):
            if f.endswith(".parquet"):
                shutil.move(f"{src}/{d}/{f}", f"{src}/b{n}.parquet")
                n += 1

    q = start_av_codes_stream(
        read_assets_stream(spark, src, max_files_per_trigger=1), out, ckpt
    )
    q.awaitTermination(120)

    got = {
        r["asset_id"]: (r["av_code"], r["decode_status"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["asset_id"]: (r["av_code"], r["decode_status"])
        for r in av_codes(assets).collect()
    }
    assert got == want and len(got) == 20  # 10 audio + 10 video of 30


def test_curate_state_matches_batch_clusters(spark, tmp_path):
    """Curation over accumulated streaming state produces the same cluster
    partition and the same canonical picks as the batch pipeline on the
    identical corpus (edge sets differ — incremental vs global banding —
    but the induced partition must agree on this fixture)."""
    from iscc_specs_spark.operators.cluster import assign_clusters
    from iscc_specs_spark.operators import lsh
    from iscc_specs_spark.plans.dedup import canonical_pick
    from iscc_specs_spark.streaming.ingest import (
        curate_state,
        process_dedup_batch,
    )

    state = str(tmp_path / "state_curate")
    pages = generate_pages(spark, 60, partitions=2)
    codes = compute_codes(pages, ("text", "data")).localCheckpoint(eager=True)
    parity = "cast(regexp_extract(url, '(\\\\d+)$', 1) as long) % 2"
    process_dedup_batch(codes.where(f"{parity} = 0"), 0, state)
    process_dedup_batch(codes.where(f"{parity} = 1"), 1, state)

    got = curate_state(spark, state)
    want = canonical_pick(
        codes.select("url", "warc_ts"),
        assign_clusters(codes.select("url"), lsh.dup_pairs(codes)),
    )
    g = {r["url"]: (r["cluster_id"], r["is_canonical"]) for r in got.collect()}
    w = {r["url"]: (r["cluster_id"], r["is_canonical"]) for r in want.collect()}
    assert set(g) == set(w) and len(g) == 60
    # same partition: same cluster label (both use min-url labels) and the
    # same canonical member per cluster
    assert g == w


def test_cross_history_hot_bucket_hub_routed(spark, tmp_path):
    """A history band bucket over bucket_cap routes new members to the
    bucket's min-url hub instead of emitting one candidate per history
    member — per-batch candidate volume stays O(|new|) as a mega-cluster
    ages. Verified with a fabricated 100-member identical-signature
    history bucket and cap 64."""
    from pyspark.sql import functions as F

    from iscc_specs_spark.streaming.ingest import process_dedup_batch

    state = str(tmp_path / "state_hot")
    mh = list(range(64))  # identical minhash → identical band keys

    def mk(urls, cid):
        rows = [
            (u, cid, 7777, mh, f"top_{u}", None) for u in urls
        ]
        return spark.createDataFrame(
            rows,
            "url string, cid_body long, simhash long, minhash array<long>, "
            "tophash string, warc_ts timestamp",
        )

    hist_urls = [f"https://h.example/p/{i:04d}" for i in range(100)]
    process_dedup_batch(mk(hist_urls, cid=5), 0, state, bucket_cap=64)
    process_dedup_batch(
        mk(["https://new.example/p/1"], cid=5), 1, state, bucket_cap=64
    )

    flags = spark.read.parquet(state + "/dup_flags").where(
        "src = 'vs_history'"
    )
    got = [(r["url"], r["dup_of"]) for r in flags.collect()]
    # exactly ONE flag, routed to the bucket hub (min history url)
    assert got == [("https://new.example/p/1", hist_urls[0])], got


def test_hot_bucket_hub_preserves_cluster_recall(spark, tmp_path):
    """A new true near-dup arriving into a >cap template-farm bucket gets
    exactly one hub edge, and curation still places it in the SAME cluster
    as every farm member — hub routing trades pair recall for bounded
    candidate volume without losing cluster recall."""
    from iscc_specs_spark.streaming.ingest import (
        curate_state,
        process_dedup_batch,
    )

    state = str(tmp_path / "state_hub_recall")
    mh = list(range(64))
    farm = [f"https://farm.example/p/{i:04d}" for i in range(100)]
    rows = [(u, 5, 7777, mh, f"top_{u}", None) for u in farm]
    process_dedup_batch(
        _mini_codes(spark, rows), 0, state, bucket_cap=64
    )
    process_dedup_batch(
        _mini_codes(spark, [("https://new.example/p/1", 5, 7777, mh, "t_n", None)]),
        1, state, bucket_cap=64,
    )
    curated = curate_state(spark, state)
    clusters = {r["url"]: r["cluster_id"] for r in curated.collect()}
    want = clusters[farm[0]]
    assert all(clusters[u] == want for u in farm)
    assert clusters["https://new.example/p/1"] == want


def _mini_codes(spark, rows):
    """(url, cid_body, simhash, minhash, tophash, warc_ts) rows — the slim
    schema process_dedup_batch needs."""
    return spark.createDataFrame(
        rows,
        "url string, cid_body long, simhash long, minhash array<long>, "
        "tophash string, warc_ts timestamp",
    )


def test_band_index_probe_prunes_partitions(spark, tmp_path):
    """The vs-history probe must statically prune the band index to the new
    batch's own band_pfx partitions — per-batch probe I/O bounded by prefix
    coverage, not index size.

    Proof by poison row: a band-index row whose (band_id, band_hash) DOES
    collide with the new batch but which sits under a band_pfx partition
    directory the new batch's prefixes don't cover. Its codes row is a
    hamming-0 match, so ANY implementation that lists that partition would
    emit a vs_history flag for it; a partition-pruning probe never reads
    the file. A genuine twin under the CORRECT prefix pins the probe as
    still live (the test can't pass via a broken/empty probe)."""
    from pyspark.sql import functions as F

    from iscc_specs_spark.operators import lsh
    from iscc_specs_spark.streaming.ingest import (
        INDEX_BUCKETS,
        band_pfx,
        process_dedup_batch,
    )

    state = str(tmp_path / "state_prune")
    mh = [7919 * i + 13 for i in range(64)]
    new_url = "https://new.example/p/1"
    genuine = "https://genuine.example/p/0"
    poison = "https://poison.example/p/0"

    # batch 0: the genuine near-dup (same signature → same band keys, same
    # correctly-computed band_pfx partitions)
    process_dedup_batch(
        _mini_codes(spark, [(genuine, 5, 4242, mh, "top_g", None)]), 0, state
    )
    assert any(
        d.startswith("band_pfx=")
        for d in os.listdir(state + "/bands/ingest_batch=0")
    )

    # the new batch's band keys and their prefixes (what the probe will push)
    new_batch = _mini_codes(spark, [(new_url, 5, 4242, mh, "top_n", None)])
    nb = (
        lsh.minhash_bands(new_batch)
        .union(lsh.simhash_bands(new_batch))
        .withColumn("p", band_pfx(INDEX_BUCKETS))
    )
    keys = nb.select("band_id", "band_hash", "p").collect()
    new_pfx = {r["p"] for r in keys}
    assert len(new_pfx) < INDEX_BUCKETS, "fixture needs uncovered prefixes"
    wrong_pfx = min(set(range(INDEX_BUCKETS)) - new_pfx)
    k = keys[0]

    # poison: codes row is a hamming-0 match in history, band row carries a
    # genuinely-colliding key but lives in an uncovered partition directory
    (
        _mini_codes(spark, [(poison, 5, 4242, mh, "top_p", None)])
        .drop("warc_ts")
        .withColumn("warc_ts", F.lit(None).cast("timestamp"))
        .write.mode("append")
        .parquet(state + "/codes/ingest_batch=0")
    )
    (
        spark.createDataFrame(
            [(poison, k["band_id"], k["band_hash"])],
            "url string, band_id int, band_hash long",
        )
        .write.mode("append")
        .parquet(f"{state}/bands/ingest_batch=0/band_pfx={wrong_pfx}")
    )

    process_dedup_batch(new_batch, 1, state)
    hits = {
        (r["url"], r["dup_of"])
        for r in spark.read.parquet(state + "/dup_flags")
        .where("src = 'vs_history'")
        .collect()
    }
    assert (new_url, genuine) in hits, hits       # probe is live
    assert all(d != poison for _, d in hits), (   # uncovered dir never read
        f"probe scanned a band_pfx partition outside the batch's prefixes: {hits}"
    )


def test_band_index_probe_plan_is_pruned_scan(spark, tmp_path):
    """read_band_index's plan must carry BOTH partition columns as
    PartitionFilters (static pruning) and contain no Python/banding subtree
    — the probe is a pure pruned parquet scan (pins the round-3 regression:
    history is never re-banded per micro-batch)."""
    from iscc_specs_spark.streaming.ingest import (
        process_dedup_batch,
        read_band_index,
    )

    state = str(tmp_path / "state_plan")
    mh = list(range(64))
    process_dedup_batch(
        _mini_codes(spark, [("https://a.example/p/0", 5, 7, mh, "t", None)]),
        0,
        state,
    )
    df = read_band_index(spark, state, batch_id=99, new_pfx=[3, 5, 11])
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = next(
        (ln for ln in plan.splitlines() if "PartitionFilters" in ln), ""
    )
    assert "ingest_batch" in pf and "band_pfx" in pf, plan
    for banned in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert banned not in plan, plan


def test_index_bucket_modulus_survives_restart(spark, tmp_path):
    """The band index's on-disk bucket modulus must win over a mismatched
    index_buckets parameter after a restart: probe prefixes computed with
    a different modulus would prune away true vs-history matches
    SILENTLY. _INDEX_META.json records the modulus at first write; a later
    batch asking for a different value derives the stored one and still
    flags the cross-batch near-dups."""
    import json

    from iscc_specs_spark.streaming.ingest import process_dedup_batch

    state = str(tmp_path / "state_modulus")
    pages = generate_pages(spark, 40, partitions=2)
    codes = compute_codes(pages, ("text", "data")).localCheckpoint(eager=True)
    b0 = codes.where("url like '%/p/0'")
    b1 = codes.where("url not like '%/p/0'")

    process_dedup_batch(b0, 0, state, index_buckets=64)
    with open(state + "/bands/_INDEX_META.json") as f:
        assert json.load(f) == {"index_buckets": 64}

    # restart with a DIFFERENT requested modulus: stored layout must win
    process_dedup_batch(b1, 1, state, index_buckets=8)
    flags = spark.read.parquet(state + "/dup_flags").collect()
    assert any(r["src"] == "vs_history" for r in flags), (
        "cross-batch near-dups lost under a mismatched bucket modulus"
    )
    with open(state + "/bands/_INDEX_META.json") as f:
        assert json.load(f) == {"index_buckets": 64}  # unchanged


def test_legacy_band_index_migrates_on_first_contact(spark, tmp_path):
    """A pre-band_pfx band index (partitioned by ingest_batch only) must be
    rewritten to the (ingest_batch, band_pfx) layout the first time a batch
    touches it — otherwise the batch's own (ingest_batch, band_pfx) write
    creates mixed partition depths and the NEXT batch's index read fails
    with 'Conflicting directory structures' (the stream survives exactly
    one batch). Pins the round-5 advice finding."""
    import shutil

    from iscc_specs_spark.streaming.ingest import process_dedup_batch

    state = str(tmp_path / "state_legacy")
    pages = generate_pages(spark, 60, partitions=2)
    codes = compute_codes(pages, ("text", "data")).localCheckpoint(eager=True)
    b0 = codes.where("url like '%/p/0'")
    b1 = codes.where("url like '%/p/1'")
    b2 = codes.where("url not like '%/p/0' and url not like '%/p/1'")

    process_dedup_batch(b0, 0, state)

    # downgrade bands/ to the legacy layout: drop band_pfx, repartition by
    # ingest_batch only, no _INDEX_META.json (predates both features)
    legacy_rows = (
        spark.read.parquet(state + "/bands").drop("band_pfx")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(state + "/bands")
    (
        legacy_rows.write.mode("overwrite")
        .partitionBy("ingest_batch")
        .parquet(state + "/bands")
    )
    assert not any(
        d.startswith("band_pfx=")
        for d in os.listdir(state + "/bands/ingest_batch=0")
    )

    # first contact migrates; the batch after that is the one that used to
    # die on the mixed directory structure
    process_dedup_batch(b1, 1, state)
    process_dedup_batch(b2, 2, state)

    bands = spark.read.parquet(state + "/bands")
    assert "band_pfx" in bands.columns
    for b in (0, 1, 2):
        assert any(
            d.startswith("band_pfx=")
            for d in os.listdir(f"{state}/bands/ingest_batch={b}")
        ), f"ingest_batch={b} not in the (ingest_batch, band_pfx) layout"
    assert not os.path.exists(state + "/bands__migrating")
    assert not os.path.exists(state + "/bands__legacy")

    # the migrated index still finds cross-batch near-dups (generate_pages
    # plants near-dup variants across the url space)
    flags = spark.read.parquet(state + "/dup_flags")
    assert flags.where("src = 'vs_history'").count() > 0


def test_curate_state_one_row_per_recrawled_url(spark, tmp_path):
    """A url ingested by more than one batch (a re-crawl) has one codes row
    per batch — curation must still emit exactly ONE (url, cluster,
    canonical) row, not N (or N² through the members join)."""
    from iscc_specs_spark.streaming.ingest import (
        curate_state,
        process_dedup_batch,
    )

    state = str(tmp_path / "state_recrawl")
    pages = generate_pages(spark, 20, partitions=2)
    codes = compute_codes(pages, ("text", "data")).localCheckpoint(eager=True)
    process_dedup_batch(codes, 0, state)
    process_dedup_batch(codes, 1, state)  # every url re-crawled

    got = curate_state(spark, state).collect()
    urls = [r["url"] for r in got]
    assert len(urls) == len(set(urls)) == 20, "one output row per url"


def test_curate_state_empty_state_is_schema_stable(spark, tmp_path):
    from iscc_specs_spark.streaming.ingest import curate_state

    out = curate_state(spark, str(tmp_path / "never_written"))
    assert out.columns == ["url", "cluster_id", "is_canonical"]
    assert out.count() == 0


def test_interrupted_migration_swap_finishes_without_rebuild(spark, tmp_path):
    """Crash window: the staged (complete, meta-marked) copy exists while
    bands/ was re-created as a meta-only dir by a replay. The migration
    must FINISH the swap (cheap rename), not delete both copies and leave
    the backfill path to rebuild the index from scratch; an incomplete
    staging (no meta marker) must be discarded, never renamed in."""
    import shutil

    from iscc_specs_spark.streaming.ingest import (
        _migrate_legacy_band_index,
        process_dedup_batch,
    )

    state = str(tmp_path / "state_swap")
    pages = generate_pages(spark, 30, partitions=2)
    codes = compute_codes(pages, ("text", "data")).localCheckpoint(eager=True)
    process_dedup_batch(codes, 0, state)
    n_rows = spark.read.parquet(state + "/bands").count()

    # simulate: swap built and meta-marked, bands re-created meta-only
    os.rename(state + "/bands", state + "/bands__migrating")
    os.makedirs(state + "/bands")
    shutil.copy(
        state + "/bands__migrating/_INDEX_META.json",
        state + "/bands/_INDEX_META.json",
    )
    _migrate_legacy_band_index(spark, state, 16)
    assert not os.path.exists(state + "/bands__migrating")
    assert spark.read.parquet(state + "/bands").count() == n_rows

    # incomplete staging (no meta marker): discarded, bands untouched
    os.makedirs(state + "/bands__migrating")
    with open(state + "/bands__migrating/part-incomplete.parquet", "wb"):
        pass
    _migrate_legacy_band_index(spark, state, 16)
    assert not os.path.exists(state + "/bands__migrating")
    assert spark.read.parquet(state + "/bands").count() == n_rows
