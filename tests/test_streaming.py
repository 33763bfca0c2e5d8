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
