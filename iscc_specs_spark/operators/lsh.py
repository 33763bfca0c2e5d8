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
    """Hub-and-spoke edges inside each exact-duplicate group."""
    return (
        codes.select("tophash", "url")
        .join(reps.select("tophash", "rep_url"), "tophash")
        .where(F.col("url") != F.col("rep_url"))
        .select(
            F.col("rep_url").alias("url_a"),
            F.col("url").alias("url_b"),
            F.lit("exact").alias("src"),
        )
    )


def rep_codes(codes: DataFrame, reps: DataFrame) -> DataFrame:
    """Slim per-representative code table that feeds LSH (exact-dup groups
    collapse to their representative — degenerate-signature skew never
    reaches the band join)."""
    return codes.join(
        reps.select(F.col("rep_url").alias("url")), "url", "left_semi"
    ).select("url", "cid_body", "simhash", "minhash", "tophash")


def minhash_bands(
    codes: DataFrame, bands: int = DEFAULT_BANDS, rows: int = DEFAULT_ROWS
) -> DataFrame:
    """(url, band_id, band_hash) — native explode of xxhash64 band keys."""
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
        "url", F.explode(F.array(*structs)).alias("b")
    ).select("url", F.col("b.band_id").alias("band_id"), F.col("b.band_hash").alias("band_hash"))


def simhash_bands(codes: DataFrame, subkeys: int = 4) -> DataFrame:
    """(url, band_id, band_hash) from 16-bit SimHash sub-keys; band_id offset
    by 1000 to keep the key space disjoint from minhash bands."""
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
    return codes.select("url", F.explode(F.array(*structs)).alias("b")).select(
        "url", F.col("b.band_id").alias("band_id"), F.col("b.band_hash").alias("band_hash")
    )


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


def dup_pairs(
    codes: DataFrame,
    bands: int = DEFAULT_BANDS,
    rows: int = DEFAULT_ROWS,
    bucket_cap: int = 64,
    cid_max: int = CID_T_MAX_HAMMING,
    sim_max: int = SIMHASH_MAX_HAMMING,
) -> DataFrame:
    """codes → verified duplicate pairs (exact ∪ minhash-LSH ∪ simhash)."""
    reps = exact_rep_table(codes)
    slim = rep_codes(codes, reps)
    band_table = minhash_bands(slim, bands, rows).union(simhash_bands(slim))
    cand = candidate_pairs(band_table, bucket_cap)
    verified = verify_pairs(cand, slim, cid_max, sim_max)
    exact = exact_pairs(codes, reps).select(
        "url_a", "url_b", "src",
        F.lit(0).alias("cid_hamming"), F.lit(0).alias("simhash_hamming"),
        F.lit(1.0).alias("jaccard_est"), F.lit(True).alias("exact_dup"),
    )
    return verified.unionByName(exact)
