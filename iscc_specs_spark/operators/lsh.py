"""Candidate generation + verification.

Three candidate sources, one verification predicate:

  * exact:   Instance-ID tophash equality (cheap groupBy — removes the worst
             LSH skew up front: empty pages / byte-identical mirrors collapse
             to one representative before any banding).
  * minhash: LSH banding over the 64-value MinHash signature, b bands × r
             rows (default 16×4: P(collide) = 1-(1-s^4)^16 ≈ 0.996 at
             signature similarity s=0.75).
  * simhash: 4 × 16-bit sub-keys of the 64-bit text SimHash (pigeonhole:
             Hamming ≤ 3 ⇒ at least one sub-key collides exactly).

Everything here is native Spark SQL — band hashes via F.xxhash64 (JVM,
whole-stage codegen), verification via bit_count(XOR) — no Python UDFs.

Skew mitigation (explicit, per north_rule — AQE skew-join splits join
partitions but cannot fix an O(k²) hot LSH bucket): bucket sizes are counted
first (reusing the banding shuffle), buckets ≤ cap self-join into pairs,
oversized buckets connect hub-and-spoke to their min-url member — O(k)
edges that preserve connectivity for clustering instead of O(k²); every
capped bucket is observable in the metrics output.

Scale regime note (measured at the 4M-page size point): the simhash track's
key space is 4 sub-keys × 2^16, so by pigeonhole its AVERAGE bucket crosses
any fixed cap once n ≳ cap·2^16 (~4.2M pages at cap=64) — every sim bucket
goes hub-and-spoke and the track's candidate volume becomes a flat ~4 edges
per page, all exactly verified downstream (correctness unaffected; the
minhash track, whose 64-bit band keys never saturate, carries the targeted
recall). At 10^9+ pages the sim track should shard into p permuted tables
keyed on wider prefixes (Manku et al. 2007's rotation scheme) — table count
and prefix width are config, not architecture; the banding/bucket/verify
machinery here is unchanged by that swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BANDS = 16
DEFAULT_ROWS = 4

# verification thresholds (Hamming over 64-bit bodies; reference robustness
# envelope: 1-word edit → CID-T distance ≈ 2, tests/test_iscc.py:103-105)
CID_T_MAX_HAMMING = 10
SIMHASH_MAX_HAMMING = 3


def exact_rep_table(codes: DataFrame) -> DataFrame:
    """(tophash, rep_url, group_size): one representative per byte-identical
    group. Map-side partial aggregation; single shuffle on tophash."""
    return codes.groupBy("tophash").agg(
        F.min("url").alias("rep_url"), F.count("*").alias("group_size")
    )


def exact_pairs(codes: DataFrame, reps: DataFrame) -> DataFrame:
    """Hub-and-spoke edges inside each exact-duplicate group.

    ``reps`` may be the (tophash, rep_url) table from exact_rep_table OR the
    slim code table (whose url IS the group representative) — only the
    tophash→representative mapping is consumed."""
    rep_col = "rep_url" if "rep_url" in reps.columns else "url"
    return (
        codes.select("tophash", "url")
        .join(
            reps.select("tophash", F.col(rep_col).alias("_rep")), "tophash"
        )
        .where(F.col("url") != F.col("_rep"))
        .select(
            F.col("_rep").alias("url_a"),
            F.col("url").alias("url_b"),
            F.lit("exact").alias("src"),
        )
    )


def rep_codes(codes: DataFrame, reps: DataFrame | None = None) -> DataFrame:
    """Slim per-representative code table that feeds LSH (exact-dup groups
    collapse to their representative — degenerate-signature skew never
    reaches the band join).

    One ``min_by`` aggregation on tophash — shares its exchange with
    :func:`exact_rep_table` (same grouping key → ReusedExchange) instead of
    the former semi-join (which cost two extra shuffles). ``reps`` is
    accepted for API compatibility and unused."""
    picked = codes.groupBy("tophash").agg(
        F.min_by(
            F.struct("url", "cid_body", "simhash", "minhash"), F.col("url")
        ).alias("m")
    )
    return picked.select(
        "m.url", "m.cid_body", "m.simhash", "m.minhash", "tophash"
    )


def minhash_bands(
    codes: DataFrame, bands: int = DEFAULT_BANDS, rows: int = DEFAULT_ROWS,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(url, *keep, band_id, band_hash) — native explode of xxhash64 band
    keys; ``keep`` columns pass through unchanged (e.g. the streaming band
    index preserves ``ingest_batch`` for partition attribution)."""
    structs = [
        F.struct(
            F.lit(i).alias("band_id"),
            F.xxhash64(
                F.lit(i), *[F.col("minhash")[j] for j in range(i * rows, (i + 1) * rows)]
            ).alias("band_hash"),
        )
        for i in range(bands)
    ]
    return codes.select(
        "url", *keep, F.explode(F.array(*structs)).alias("b")
    ).select(
        "url", *keep,
        F.col("b.band_id").alias("band_id"),
        F.col("b.band_hash").alias("band_hash"),
    )


def simhash_bands(
    codes: DataFrame, subkeys: int = 4, keep: tuple[str, ...] = ()
) -> DataFrame:
    """(url, *keep, band_id, band_hash) from 16-bit SimHash sub-keys;
    band_id offset by 1000 to keep the key space disjoint from minhash
    bands."""
    width = 64 // subkeys
    mask = (1 << width) - 1
    structs = [
        F.struct(
            F.lit(1000 + i).alias("band_id"),
            (F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(F.lit(mask))).alias(
                "band_hash"
            ),
        )
        for i in range(subkeys)
    ]
    return codes.select("url", *keep, F.explode(F.array(*structs)).alias("b")).select(
        "url", *keep,
        F.col("b.band_id").alias("band_id"),
        F.col("b.band_hash").alias("band_hash"),
    )


def _band_structs(bands: int, rows: int, subkeys: int = 4) -> list:
    """Band-key struct expressions for one combined explode (minhash LSH
    bands + simhash sub-key bands in a single projection pass)."""
    out = [
        F.struct(
            F.lit(i).alias("band_id"),
            F.xxhash64(
                F.lit(i), *[F.col("minhash")[j] for j in range(i * rows, (i + 1) * rows)]
            ).alias("band_hash"),
        )
        for i in range(bands)
    ]
    width = 64 // subkeys
    mask = (1 << width) - 1
    out += [
        F.struct(
            F.lit(1000 + i).alias("band_id"),
            (F.shiftrightunsigned(F.col("simhash"), i * width).bitwiseAND(F.lit(mask)))
            .cast("long").alias("band_hash"),
        )
        for i in range(subkeys)
    ]
    return out


BAND_PFX_BUCKETS = 64


def band_pfx(buckets: int = BAND_PFX_BUCKETS):
    """Partition-prefix expression over a (band_id, band_hash) row — the
    shared at-rest bucketing key for band tables (batch stage table in
    plans/dedup.py, streaming maintained index in streaming/ingest.py):
    a reader probing a known key set prunes to pmod-matching partition
    directories instead of scanning the table."""
    return F.pmod(
        F.xxhash64(F.col("band_id"), F.col("band_hash")), F.lit(buckets)
    ).cast("int")


def band_rows_table(
    slim: DataFrame, bands: int = DEFAULT_BANDS, rows: int = DEFAULT_ROWS
) -> DataFrame:
    """(m struct(url,cid_body,simhash,tophash), band_id, band_hash) — the
    banded representative table with the verification payload riding along
    (see verified_bucket_pairs). Exposed so plans/dedup.py can write it as
    a band_pfx-partitioned stage table and feed the SAME at-rest rows to
    the metrics pass and the pair generator."""
    payload = F.struct(
        F.col("url"), F.col("cid_body"), F.col("simhash"), F.col("tophash")
    )
    return slim.select(
        payload.alias("m"),
        F.explode(F.array(*_band_structs(bands, rows))).alias("b"),
    ).select(
        "m",
        F.col("b.band_id").alias("band_id"),
        F.col("b.band_hash").alias("band_hash"),
    )


def verified_bucket_pairs(
    slim: DataFrame,
    bands: int = DEFAULT_BANDS,
    rows: int = DEFAULT_ROWS,
    bucket_cap: int = 64,
    cid_max: int = CID_T_MAX_HAMMING,
    sim_max: int = SIMHASH_MAX_HAMMING,
    band_rows: DataFrame | None = None,
) -> DataFrame:
    """Banding + candidate generation + exact verification in one shuffle
    chain — no post-hoc join back to the code table.

    The verification fields (cid_body, simhash, tophash ≈ 80 B) ride along
    with each band row, so in-bucket pairs are verified inline by native
    bit_count/XOR on the exploded combination structs. Compared to the
    join-based verifier this removes two wide shuffles of the code table
    and three query stages; the banding shuffle grows by ~4× in bytes but
    stays a fraction of the code table (the 512 B minhash column — needed
    only for the reported jaccard estimate, not the dup predicate — never
    shuffles; it is re-attached to the few surviving pairs afterwards).

    Oversized buckets (> bucket_cap, e.g. template farms): hub-and-spoke
    edges to the bucket-min url, O(k) not O(k²), never collected into one
    row; their verification happens on the (small) residual via
    verify_pairs. Returns (url_a, url_b, cid_hamming, simhash_hamming,
    exact_dup) for capped buckets plus unverified hub edges flagged
    verified=false.

    ``band_rows``: pass a precomputed band table (e.g. the band_pfx-
    partitioned stage table plans/dedup.py writes) to skip the in-plan
    banding; must have band_rows_table's (m, band_id, band_hash) shape.
    """
    if band_rows is None:
        band_rows = band_rows_table(slim, bands, rows)
    else:
        band_rows = band_rows.select("m", "band_id", "band_hash")

    sizes = band_rows.groupBy("band_id", "band_hash").agg(
        F.count("*").alias("bucket_n")
    )
    # Skew split: hot buckets (> bucket_cap) are FEW by construction — one
    # row per mega-bucket — so their key list broadcasts at any corpus
    # size. Routing rows via broadcast semi/anti joins means no shuffle in
    # this plan ever hash-partitions by a hot (band_id, band_hash) key with
    # unbounded rows behind it: the cold join has ≤ bucket_cap rows per key
    # by construction, and the hot path's only wide op is a partial-agg min.
    hot_keys = sizes.where(F.col("bucket_n") > bucket_cap).select(
        "band_id", "band_hash"
    )
    cold_rows = band_rows.join(
        F.broadcast(hot_keys), ["band_id", "band_hash"], "left_anti"
    )
    # cold buckets are ≤ bucket_cap by construction (the anti-join removed
    # every larger one), so the former join-back against `sizes` only ever
    # supplied the ≥2 filter — size(ms) after the gather gives that for
    # free, one join fewer in the chain
    members = cold_rows.groupBy("band_id", "band_hash").agg(
        F.collect_list("m").alias("ms")
    ).where(F.size("ms") >= 2)
    combos = F.expr(
        f"""
        flatten(transform(ms, (x, i) ->
          filter(transform(ms, (y, j) ->
            IF(j > i AND (
                 bit_count(x.cid_body ^ y.cid_body) <= {cid_max}
                 OR bit_count(x.simhash ^ y.simhash) <= {sim_max}
                 OR x.tophash = y.tophash),
               struct(least(x.url, y.url) AS url_a,
                      greatest(x.url, y.url) AS url_b,
                      bit_count(x.cid_body ^ y.cid_body) AS cid_hamming,
                      bit_count(x.simhash ^ y.simhash) AS simhash_hamming,
                      x.tophash = y.tophash AS exact_dup),
               NULL)), p -> p IS NOT NULL)))
        """
    )
    pairs_small = (
        members.select(F.explode(combos).alias("p"))
        .select("p.url_a", "p.url_b", "p.cid_hamming", "p.simhash_hamming", "p.exact_dup")
        .dropDuplicates(["url_a", "url_b"])
        .withColumn("verified", F.lit(True))
    )

    big = band_rows.join(
        F.broadcast(hot_keys), ["band_id", "band_hash"], "left_semi"
    ).select("band_id", "band_hash", F.col("m.url").alias("url"))
    # map-side partial min per bucket → hubs is one row per hot bucket
    # (small) → broadcast back; the hot keys never drive a shuffle partition
    hubs = big.groupBy("band_id", "band_hash").agg(F.min("url").alias("hub"))
    pairs_big = (
        big.join(F.broadcast(hubs), ["band_id", "band_hash"])
        .where(F.col("url") != F.col("hub"))
        .select(
            F.col("hub").alias("url_a"), F.col("url").alias("url_b"),
            F.lit(None).cast("int").alias("cid_hamming"),
            F.lit(None).cast("int").alias("simhash_hamming"),
            F.lit(None).cast("boolean").alias("exact_dup"),
        )
        .dropDuplicates(["url_a", "url_b"])
        .withColumn("verified", F.lit(False))
    )
    return pairs_small.unionByName(pairs_big)


def candidate_pairs(band_table: DataFrame, bucket_cap: int = 64) -> DataFrame:
    """Bucket-join bands into candidate pairs with explicit skew handling.

    Buckets ≤ bucket_cap: full self-join (url_a < url_b).
    Buckets > bucket_cap: hub-and-spoke to min url (O(k) not O(k²)).
    Returns distinct (url_a, url_b, src).
    """
    sizes = band_table.groupBy("band_id", "band_hash").agg(F.count("*").alias("bucket_n"))
    # same partitioning key as the groupBy → exchange reuse, no extra shuffle
    tagged = band_table.join(sizes, ["band_id", "band_hash"])
    tagged = tagged.where(F.col("bucket_n") >= 2)

    # capped buckets: gather members per bucket (≤ bucket_cap, so the array
    # row is bounded) and emit the C(k,2) pairs with an in-array combination
    # explode — one shuffle on the bucket key instead of a bucket self-join
    # (the groupBy reuses the sizes exchange partitioning).
    small = tagged.where(F.col("bucket_n") <= bucket_cap).select(
        "band_id", "band_hash", "url"
    )
    members = small.groupBy("band_id", "band_hash").agg(
        F.collect_list("url").alias("ms")
    )
    combos = F.expr(
        "flatten(transform(ms, (x, i) -> "
        "  filter(transform(ms, (y, j) -> "
        "    IF(j > i, struct(least(x, y) AS url_a, greatest(x, y) AS url_b), "
        "       NULL)), p -> p IS NOT NULL)))"
    )
    pairs_small = members.select(F.explode(combos).alias("p")).select(
        "p.url_a", "p.url_b"
    )

    # oversized buckets (skew): never collect — hub-and-spoke join keeps the
    # plan streaming at any bucket cardinality, O(k) edges preserve
    # connectivity for clustering.
    big = tagged.where(F.col("bucket_n") > bucket_cap).select(
        "band_id", "band_hash", "url"
    )
    hubs = big.groupBy("band_id", "band_hash").agg(F.min("url").alias("hub"))
    pairs_big = (
        big.join(hubs, ["band_id", "band_hash"])
        .where(F.col("url") != F.col("hub"))
        .select(F.col("hub").alias("url_a"), F.col("url").alias("url_b"))
    )

    return (
        pairs_small.union(pairs_big)
        .distinct()
        .withColumn("src", F.lit("lsh"))
    )


def hamming64(a, b):
    """Native 64-bit Hamming distance column expression."""
    return F.bit_count(a.bitwiseXOR(b))


def verify_pairs(
    cand: DataFrame,
    codes_slim: DataFrame,
    cid_max: int = CID_T_MAX_HAMMING,
    sim_max: int = SIMHASH_MAX_HAMMING,
) -> DataFrame:
    """Exact verification of candidate pairs — all native expressions.

    dup iff  hamming(cid_body) ≤ cid_max
          OR hamming(simhash)  ≤ sim_max
          OR tophash equal.
    Also emits jaccard_est = (#equal minhash positions)/64.
    """
    a = codes_slim.select(
        F.col("url").alias("url_a"),
        F.col("cid_body").alias("cid_a"),
        F.col("simhash").alias("sim_a"),
        F.col("minhash").alias("mh_a"),
        F.col("tophash").alias("top_a"),
    )
    b = codes_slim.select(
        F.col("url").alias("url_b"),
        F.col("cid_body").alias("cid_b"),
        F.col("simhash").alias("sim_b"),
        F.col("minhash").alias("mh_b"),
        F.col("tophash").alias("top_b"),
    )
    joined = cand.join(a, "url_a").join(b, "url_b")
    eq_minhash = F.expr(
        "aggregate(zip_with(mh_a, mh_b, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), "
        "0, (acc, v) -> acc + v)"
    )
    out = joined.select(
        "url_a",
        "url_b",
        "src",
        hamming64(F.col("cid_a"), F.col("cid_b")).alias("cid_hamming"),
        hamming64(F.col("sim_a"), F.col("sim_b")).alias("simhash_hamming"),
        (eq_minhash / F.lit(64.0)).alias("jaccard_est"),
        (F.col("top_a") == F.col("top_b")).alias("exact_dup"),
    )
    return out.where(
        (F.col("cid_hamming") <= cid_max)
        | (F.col("simhash_hamming") <= sim_max)
        | F.col("exact_dup")
    )


def attach_jaccard(pairs: DataFrame, slim: DataFrame) -> DataFrame:
    """Join the (few) surviving pairs back to the minhash signatures for the
    reported jaccard estimate — survivors ≪ corpus, so these joins shuffle
    a bounded fraction of what the old join-everything verifier moved."""
    a = slim.select(F.col("url").alias("url_a"), F.col("minhash").alias("mh_a"))
    b = slim.select(F.col("url").alias("url_b"), F.col("minhash").alias("mh_b"))
    eq_minhash = F.expr(
        "aggregate(zip_with(mh_a, mh_b, (x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), "
        "0, (acc, v) -> acc + v)"
    )
    return (
        pairs.join(a, "url_a")
        .join(b, "url_b")
        .withColumn("jaccard_est", eq_minhash / F.lit(64.0))
        .drop("mh_a", "mh_b")
    )


def dup_pairs(
    codes: DataFrame,
    bands: int = DEFAULT_BANDS,
    rows: int = DEFAULT_ROWS,
    bucket_cap: int = 64,
    cid_max: int = CID_T_MAX_HAMMING,
    sim_max: int = SIMHASH_MAX_HAMMING,
    compute_jaccard: bool = False,
    materialize: bool = True,
    slim: DataFrame | None = None,
    band_rows: DataFrame | None = None,
) -> DataFrame:
    """codes → verified duplicate pairs (exact ∪ minhash-LSH ∪ simhash).

    Capped buckets verify inline during candidate generation
    (verified_bucket_pairs); only oversized-bucket hub edges take the
    residual join-verify path; jaccard estimates attach to survivors only.
    ``compute_jaccard`` defaults OFF (r07): the dup predicate never uses
    jaccard — it is reporting metadata — and the two attach joins are pure
    overhead for every caller that only consumes the pair set (clustering,
    the driver rows, the pipeline bench). Pass True where the jaccard
    column is actually persisted/read (plans/dedup.py's stage table).

    ``materialize=True`` checkpoints the slim representative table: it has
    ~6 downstream consumers (banding, sizes, verify sides, jaccard sides,
    exact pairs) and without materialization Spark re-expands — and
    re-shuffles — the full-corpus tophash aggregation once per consumer
    (visible in explain as duplicated min_by subtrees). At warehouse scale
    this would instead be a written stage table (plans/dedup.py).

    ``slim``: pass a precomputed (ideally already-materialized)
    representative table to share it with other consumers (e.g. the
    lsh_metrics pass in plans/dedup.py) instead of re-aggregating.
    """
    if slim is None:
        slim = rep_codes(codes)
        if materialize:
            slim = slim.localCheckpoint(eager=True)
    vb = verified_bucket_pairs(
        slim, bands, rows, bucket_cap, cid_max, sim_max, band_rows=band_rows
    )
    small_ok = (
        vb.where(F.col("verified"))
        .drop("verified")
        .withColumn("src", F.lit("lsh"))
    )
    residual = vb.where(~F.col("verified")).select(
        "url_a", "url_b", F.lit("lsh").alias("src")
    )
    residual_ok = verify_pairs(residual, slim, cid_max, sim_max)
    if compute_jaccard:
        small_full = attach_jaccard(small_ok, slim)
    else:
        small_full = small_ok.withColumn(
            "jaccard_est", F.lit(None).cast("double")
        )
        # keep both branches NULL: a pair surviving in both would otherwise
        # reach dropDuplicates with two rows differing only in jaccard_est —
        # which one wins is nondeterministic
        residual_ok = residual_ok.withColumn(
            "jaccard_est", F.lit(None).cast("double")
        )
    cols = [
        "url_a", "url_b", "src", "cid_hamming", "simhash_hamming",
        "jaccard_est", "exact_dup",
    ]
    verified = small_full.select(*cols).unionByName(
        residual_ok.select(*cols)
    ).dropDuplicates(["url_a", "url_b"])
    exact = exact_pairs(codes, slim).select(
        "url_a", "url_b", "src",
        F.lit(0).alias("cid_hamming"), F.lit(0).alias("simhash_hamming"),
        F.lit(1.0).alias("jaccard_est"), F.lit(True).alias("exact_dup"),
    )
    return verified.unionByName(exact)
