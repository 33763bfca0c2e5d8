"""Per-cluster Mixed Content-ID aggregation — fully native Spark SQL.

The reference's ``content_id_mixed`` (/root/reference/src/iscc/iscc.py:99-117)
is the one operator in the spec that is a true *aggregation*: it SimHashes
the first 8 decoded bytes of several Content-IDs into one 13-char code.
Pipeline exposure: one Mixed Content-ID per duplicate cluster — a compact
cluster-level signature (e.g. for cross-snapshot cluster matching).

Spark mapping (SURVEY.md §2.1): SimHash is a per-bit majority vote, which
distributes natively — no grouped UDF, no collect-per-cluster (a template
farm producing a 10⁶-member cluster would OOM any collect path; here it is
56 map-side-combinable SUMs):

  * the first 8 decoded bytes of a Content-ID are the constant header byte
    ``HEAD_CID_T`` plus the top 7 bytes of ``cid_body`` (kernel/codec.py),
    so only 56 bits vary per member;
  * unpack those 56 bits with native shift/mask expressions, ``groupBy
    (cluster_id).sum()`` per bit, threshold at ``2*sum >= n`` (ties → 1,
    kernel/sketches.py:36);
  * repack into the 64-bit majority digest (header byte is its own
    majority) and base58-encode with an unrolled divmod-58 chain — all
    whole-stage-codegen expressions, zero Python.

Scale: one shuffle on cluster_id with map-side partial aggregation; output
is one row per multi-member cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iscc_specs_spark.functions import base58_body as _base58_body
from iscc_specs_spark.kernel.codec import encode
from iscc_specs_spark.kernel.constants import HEAD_CID_M, HEAD_CID_T

_N_BITS = 56  # variable bits: top 7 bytes of the 8-byte cid body


def cluster_mixed_cid(codes: DataFrame, clusters: DataFrame) -> DataFrame:
    """(codes ⋈ clusters) → one Mixed Content-ID per multi-member cluster.

    codes must carry (url, cid_body); clusters (url, cluster_id).
    Single-member clusters are excluded (a mixed code of one element is
    just a re-headered copy — the reference requires ≥2 inputs in spirit).
    Bit-identical to kernel.codes.content_id_mixed over the members'
    content_id strings (tests/test_mixed.py).
    """
    joined = (
        codes.select("url", "cid_body")
        .where(F.col("cid_body").isNotNull())
        .join(clusters, "url")
    )
    # bit k (MSB-first) of the 56 variable bits = bit 63-k of cid_body
    bit_sums = [
        F.sum(
            F.shiftrightunsigned(F.col("cid_body"), 63 - k).bitwiseAND(F.lit(1))
        ).alias(f"s{k}")
        for k in range(_N_BITS)
    ]
    agg = (
        joined.groupBy("cluster_id")
        .agg(F.count("*").alias("n"), *bit_sums)
        .where(F.col("n") >= 2)
    )
    sim56 = None
    for k in range(_N_BITS):
        term = F.when(
            F.lit(2) * F.col(f"s{k}") >= F.col("n"), F.lit(1 << (55 - k))
        ).otherwise(F.lit(0)).cast("long")
        sim56 = term if sim56 is None else sim56 + term
    sim64 = (F.lit(HEAD_CID_T[0]).cast("long") * F.lit(1 << 56) + sim56).alias(
        "sim64"
    )
    out = agg.select("cluster_id", F.col("n"), sim64)
    return out.select(
        "cluster_id",
        F.concat(F.lit(encode(HEAD_CID_M)), _base58_body("sim64")).alias(
            "mixed_cid"
        ),
        F.col("n").cast("int").alias("n_members"),
    )
