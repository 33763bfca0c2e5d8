from __future__ import annotations

from iscc_specs_spark.kernel.codec import decode
from iscc_specs_spark.kernel.codes import content_id_mixed
from iscc_specs_spark.operators.mixed import cluster_mixed_cid


def _body(cid: str) -> int:
    """Signed-long view of the 8-byte code body (what the codes table
    carries as cid_body)."""
    u = int.from_bytes(decode(cid)[1:], "big")
    return u - (1 << 64) if u >= (1 << 63) else u


def test_cluster_mixed_cid(spark):
    cids = ["CTfr9HYQvLocS", "CTB71Wes7Qv2L", "CTCQEnHuo9LuT", "CT7A4zpmccuEv"]
    codes = spark.createDataFrame(
        [(f"u{i+1}", c, _body(c)) for i, c in enumerate(cids)],
        "url string, content_id string, cid_body long",
    )
    clusters = spark.createDataFrame(
        [("u1", "c1"), ("u2", "c1"), ("u3", "c1"), ("u4", "s4")],
        "url string, cluster_id string",
    )
    got = {r["cluster_id"]: r for r in cluster_mixed_cid(codes, clusters).collect()}
    assert set(got) == {"c1"}  # singleton cluster excluded
    want = content_id_mixed(sorted(cids[:3]))
    assert got["c1"]["mixed_cid"] == want
    assert got["c1"]["n_members"] == 3
    assert want.startswith("CM")  # mixed header


def test_cluster_mixed_cid_matches_kernel_many(spark):
    """Native per-bit majority == kernel content_id_mixed across clusters of
    varied sizes (incl. even sizes, which exercise the ties→1 rule)."""
    import itertools

    from iscc_specs_spark.kernel.codes import content_id_text

    texts = [f"document number {i} with some words " * 3 for i in range(12)]
    cids = [content_id_text(t) for t in texts]
    sizes = [2, 3, 4]  # clusters c0: 2 members, c1: 3, c2: 4 (+ leftovers)
    rows, want = [], {}
    it = iter(range(len(cids)))
    for ci, sz in enumerate(sizes):
        members = list(itertools.islice(it, sz))
        for m in members:
            rows.append((f"u{m}", cids[m], _body(cids[m]), f"c{ci}"))
        want[f"c{ci}"] = (content_id_mixed(sorted(cids[m] for m in members)), sz)
    codes = spark.createDataFrame(
        [(u, c, b) for u, c, b, _ in rows],
        "url string, content_id string, cid_body long",
    )
    clusters = spark.createDataFrame(
        [(u, cl) for u, _, _, cl in rows], "url string, cluster_id string"
    )
    got = {r["cluster_id"]: r for r in cluster_mixed_cid(codes, clusters).collect()}
    assert set(got) == set(want)
    for cl, (code, n) in want.items():
        assert got[cl]["mixed_cid"] == code, cl
        assert got[cl]["n_members"] == n
