"""Column-function API (iscc_specs_spark.functions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iscc_specs_spark import functions as IF
from iscc_specs_spark.kernel.codec import decode, distance, encode


def test_iscc_distance_matches_kernel(spark):
    codes = ["CTfr9HYQvLocS", "CTB71Wes7Qv2L", "CT7A4zpmccuEv"]

    def body(c):
        u = int.from_bytes(decode(c)[1:], "big")
        return u - (1 << 64) if u >= (1 << 63) else u

    rows = [
        (a, b, body(a), body(b))
        for a in codes
        for b in codes
    ]
    df = spark.createDataFrame(rows, "ca string, cb string, ba long, bb long")
    got = df.select(
        "ca", "cb", IF.iscc_distance(F.col("ba"), F.col("bb")).alias("d")
    ).collect()
    for r in got:
        assert r["d"] == distance(r["ca"], r["cb"])


def test_iscc_compose(spark):
    df = spark.createDataFrame(
        [("A", "B", "C", "D")], "m string, c string, d string, i string"
    )
    assert df.select(IF.iscc_compose("m", "c", "d", "i")).first()[0] == "A-B-C-D"


def test_base58_body_matches_codec(spark):
    vals = [0, 1, 57, 58, (1 << 56) + 12345, (1 << 62) + 99]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = [r[0] for r in df.select(IF.base58_body("x")).collect()]
    want = [encode(v.to_bytes(8, "big")) for v in vals]
    assert got == want


def test_iscc_compose_null_strict(spark):
    from pyspark.sql import functions as F

    from iscc_specs_spark import functions as IF

    df = spark.createDataFrame(
        [("CC", "CT", "CD", "CR"), ("CC", None, "CD", "CR")],
        "m string, c string, d string, i string",
    )
    got = df.select(IF.iscc_compose("m", "c", "d", "i").alias("iscc")).collect()
    assert got[0]["iscc"] == "CC-CT-CD-CR"
    assert got[1]["iscc"] is None  # never a silently-shortened 3-segment code
