from __future__ import annotations

from iscc_specs_spark.kernel.codes import content_id_mixed
from iscc_specs_spark.operators.mixed import cluster_mixed_cid


def test_cluster_mixed_cid(spark):
    codes = spark.createDataFrame(
        [
            ("u1", "CTfr9HYQvLocS"),
            ("u2", "CTB71Wes7Qv2L"),
            ("u3", "CTCQEnHuo9LuT"),
            ("u4", "CT7A4zpmccuEv"),
        ],
        "url string, content_id string",
    )
    clusters = spark.createDataFrame(
        [("u1", "c1"), ("u2", "c1"), ("u3", "c1"), ("u4", "s4")],
        "url string, cluster_id string",
    )
    got = {r["cluster_id"]: r for r in cluster_mixed_cid(codes, clusters).collect()}
    assert set(got) == {"c1"}  # singleton cluster excluded
    want = content_id_mixed(
        sorted(["CTfr9HYQvLocS", "CTB71Wes7Qv2L", "CTCQEnHuo9LuT"])
    )
    assert got["c1"]["mixed_cid"] == want
    assert got["c1"]["n_members"] == 3
    assert want.startswith("CM")  # mixed header
