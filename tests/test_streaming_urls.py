"""Streaming canonical-URL crawl dedup (streaming/ingest.py:
process_url_batch / start_url_dedup_stream): intra-batch keeper pick,
vs-history re-crawl flagging off the maintained (ingest_batch, url_pfx)
index, replay idempotence, static probe pruning."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from iscc_specs_spark.streaming import ingest as I


def _ts(s: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, warc_ts timestamp")


def test_url_batch_intra_then_history(spark, tmp_path):
    state = str(tmp_path / "state")
    b1 = [
        ("https://a.example/p", _ts(10)),
        ("https://www.a.example/p#x", _ts(30)),  # keeper: latest crawl
        ("https://b.example/q", _ts(5)),
    ]
    I.process_url_batch(_pages(spark, b1), 0, state)
    flags = {
        (f["url"], f["dup_of"], f["src"])
        for f in I.read_url_flags(spark, state).collect()
    }
    assert flags == {
        ("https://a.example/p", "https://www.a.example/p#x", "intra_batch"),
    }

    # batch 1: a third spelling of page a (re-crawl) + a brand-new page
    b2 = [
        ("HTTPS://A.EXAMPLE/p?utm_source=z", _ts(60)),
        ("https://c.example/r", _ts(61)),
    ]
    I.process_url_batch(_pages(spark, b2), 1, state)
    flags = {
        (f["url"], f["dup_of"], f["src"])
        for f in I.read_url_flags(spark, state).collect()
    }
    assert (
        "HTTPS://A.EXAMPLE/p?utm_source=z",
        "https://www.a.example/p#x",
        "vs_history",
    ) in flags
    assert sum(1 for f in flags if f[2] == "vs_history") == 1

    # the index holds one keeper per canonical url per batch
    idx = I.read_url_index(spark, state, batch_id=99)
    assert idx.where(F.col("ingest_batch") == 0).count() == 2
    assert idx.where(F.col("ingest_batch") == 1).count() == 2


def test_url_batch_replay_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    I.process_url_batch(
        _pages(spark, [("https://a.example/p", _ts(1))]), 0, state
    )
    b2 = _pages(
        spark,
        [("https://a.example/p?utm_source=re", _ts(2)),
         ("https://d.example/x", _ts(3))],
    )
    I.process_url_batch(b2, 1, state)
    before = sorted(
        map(tuple, I.read_url_flags(spark, state).collect())
    )
    # replayed batch: must not match its own prior write (no self-flag),
    # must overwrite its own partitions byte-for-byte semantically
    I.process_url_batch(b2, 1, state)
    after = sorted(map(tuple, I.read_url_flags(spark, state).collect()))
    assert before == after
    assert sum(1 for f in after if f[3] == "vs_history") == 1


def test_url_index_probe_prunes_partitions(spark, tmp_path):
    """Static pruning, proven two ways (same protocol as the band index
    tests): the probe plan carries both partition columns as
    PartitionFilters, and a poison index row — same canonical url, BETTER
    first-arrival sort key, but planted under an uncovered url_pfx
    directory — is never read, while the genuine history row still flags."""
    state = str(tmp_path / "state")
    genuine = "https://a.example/p"
    I.process_url_batch(_pages(spark, [(genuine, _ts(10))]), 0, state)

    # the probe's prefix for canon(a) and a deliberately-wrong partition
    canon_pfx = (
        spark.read.parquet(f"{state}/urls")
        .select("canon_url", "url_pfx").collect()
    )
    assert len(canon_pfx) == 1
    canon, right = canon_pfx[0]["canon_url"], canon_pfx[0]["url_pfx"]
    wrong = (right + 1) % I.INDEX_BUCKETS
    # poison: earlier ts AND lexicographically smaller url — a full-scan
    # probe would pick it as dup_of; a pruning probe never lists its dir
    spark.createDataFrame(
        [(canon, "https://0poison.example/p", _ts(1))],
        "canon_url string, url string, last_ts timestamp",
    ).write.mode("append").parquet(
        f"{state}/urls/ingest_batch=0/url_pfx={wrong}"
    )

    # plan shape: both partition columns pushed as PartitionFilters
    df = I.read_url_index(spark, state, batch_id=1, new_pfx=[right])
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = next(
        (ln for ln in plan.splitlines() if "PartitionFilters" in ln), ""
    )
    assert "ingest_batch" in pf and "url_pfx" in pf, plan

    # behavior: re-crawl flags against the genuine keeper, never the poison
    I.process_url_batch(
        _pages(spark, [("https://www.a.example/p", _ts(20))]), 1, state
    )
    hits = {
        (f["url"], f["dup_of"])
        for f in I.read_url_flags(spark, state)
        .where("src = 'vs_history'").collect()
    }
    assert ("https://www.a.example/p", genuine) in hits, hits
    assert all("0poison" not in d for _, d in hits), hits


def test_url_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def drop(rows, part):
        spark.createDataFrame(
            [
                (u, t, bytearray(b""), "text body here", "en")
                for u, t in rows
            ],
            I.PAGES_SCHEMA,
        ).coalesce(1).write.mode("append").parquet(src)

    drop([("https://a.example/p", _ts(10)),
          ("https://b.example/q", _ts(11))], 0)
    q = I.start_url_dedup_stream(
        I.read_pages_stream(spark, src, max_files_per_trigger=1),
        state,
        ckpt,
    )
    q.awaitTermination()
    assert I.read_url_flags(spark, state).count() == 0

    # second drop: a re-crawl spelling of page a — restartable stream picks
    # it up as a new batch and flags it against the indexed keeper
    drop([("https://www.a.example/p?utm_source=x", _ts(20))], 1)
    q = I.start_url_dedup_stream(
        I.read_pages_stream(spark, src, max_files_per_trigger=1),
        state,
        ckpt,
    )
    q.awaitTermination()
    flags = I.read_url_flags(spark, state).collect()
    assert len(flags) == 1
    f = flags[0]
    assert f["url"] == "https://www.a.example/p?utm_source=x"
    assert f["dup_of"] == "https://a.example/p"
    assert f["src"] == "vs_history"


def test_identical_spelling_recrawl_no_self_flag(spark, tmp_path):
    """A later batch re-crawling the EXACT same url spelling must not flag
    the url against itself (url == dup_of): the documented pre-filter
    composition would otherwise drop the page from both sides and lose it
    entirely."""
    state = str(tmp_path / "state_selfflag")
    I.process_url_batch(
        _pages(spark, [("https://ex.com/a", _ts(0))]), 0, state
    )
    I.process_url_batch(
        _pages(spark, [("https://ex.com/a", _ts(60))]), 1, state
    )
    flags = I.read_url_flags(spark, state).collect()
    assert all(r["url"] != r["dup_of"] for r in flags), flags
    # a genuinely different spelling of the same canonical url IS flagged
    I.process_url_batch(
        _pages(spark, [("https://ex.com/a#frag", _ts(120))]), 2, state
    )
    flags = I.read_url_flags(spark, state).collect()
    assert [(r["url"], r["dup_of"]) for r in flags if r["src"] == "vs_history"] == [
        ("https://ex.com/a#frag", "https://ex.com/a")
    ]
