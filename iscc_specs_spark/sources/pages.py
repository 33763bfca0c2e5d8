"""Deterministic synthetic Common-Crawl-style ``pages`` table with planted
near-duplicate clusters and ground truth (FIXTURES.md F1).

Schema (BASELINE.json input_hint): url STRING, warc_ts TIMESTAMP,
html BINARY, text STRING, lang STRING.  Every row is a pure function of
``doc_id`` and the seed — byte-identical per url across runs, partitionings
and parallelism levels (the per-row invariant).

Planted structure per 20-id block (scale-free, so the same generator covers
1k unit-test rows and 10^12-row design targets):
  * positions 0..k-1 (k = 2 + block%7): one duplicate cluster — position 0 is
    the base, others are edit variants cycling through EDIT_CLASSES
  * remaining positions: singletons
  * doc_id % 101 == 100: member of one giant "template farm" cluster (~1%,
    the LSH hot-band skew fixture)
  * doc_id % 211 == 210: empty text (degenerate-signature fixture)
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 0x15CC
EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)

EDIT_CLASSES = ("exact", "subst", "insert", "delete", "swap", "boiler", "htmlnoise")

_CONS = "bcdfghklmnprstvz"
_VOWS = "aeiou"
_SYLL = [c + v for c in _CONS for v in _VOWS]  # 80 syllables
_N_WORDS = 800


def _word(i: int) -> str:
    s1 = _SYLL[(i * 7 + 3) % len(_SYLL)]
    s2 = _SYLL[(i * 13 + 5) % len(_SYLL)]
    s3 = _SYLL[(i * 29 + 11) % len(_SYLL)] if i % 3 else ""
    return s1 + s2 + s3


WORDS = [_word(i) for i in range(_N_WORDS)]

_FARM_RNG = np.random.default_rng(SEED ^ 0xFA12)
FARM_WORDS = [WORDS[int(j)] for j in _FARM_RNG.integers(0, _N_WORDS, 300)]
BOILER = " ".join(WORDS[i % _N_WORDS] for i in range(17, 27))


def _base_words(base_id: int, scale: int = 1) -> list[str]:
    rng = np.random.default_rng(SEED ^ (base_id * 2654435761 % (1 << 63)))
    n = int(rng.integers(30, 600)) * scale
    return [WORDS[int(j)] for j in rng.integers(0, _N_WORDS, n)]


def _row(
    doc_id: int, scale: int = 1
) -> tuple[str, int, str, str, str, str, bytes]:
    """Pure function (doc_id, scale) → (url, ts_seconds, text, lang,
    cluster_id, edit_class, html).  ``scale`` multiplies document length
    (scale=1 ≈ 2 KB text; scale=4 ≈ 8 KB, a realistic web-page size) while
    preserving the planted cluster structure."""
    if doc_id % 101 == 100:
        words = list(FARM_WORDS) * scale
        words[doc_id % 50] = WORDS[doc_id % _N_WORDS]  # tiny per-member edit
        cluster, edit = "farm", "farm"
        title = "template farm landing page"
    elif doc_id % 211 == 210:
        words = []
        cluster, edit = "empty", "empty"
        title = "empty page"
    else:
        block = doc_id // 20
        pos = doc_id % 20
        k = 2 + block % 7
        if pos < k:
            base_id = block * 20
            words = _base_words(base_id, scale)
            cluster = f"c{base_id}"
            if pos == 0:
                edit = "exact-base"
            else:
                edit = EDIT_CLASSES[(pos - 1) % len(EDIT_CLASSES)]
                n = len(words)
                at = (doc_id * 31) % n
                if edit == "subst":
                    words[at] = WORDS[(doc_id * 7) % _N_WORDS]
                elif edit == "insert":
                    words.insert(at, WORDS[(doc_id * 11) % _N_WORDS])
                elif edit == "delete":
                    del words[at]
                elif edit == "swap":
                    j = (at + 1) % n
                    words[at], words[j] = words[j], words[at]
                elif edit == "boiler":
                    words = words + BOILER.split()
                # "exact" and "htmlnoise": text identical to base
            title = f"doc {base_id:010d} {words[0] if words else ''}"
        else:
            words = _base_words(doc_id * 1_000_003 + 7, scale)
            cluster = f"s{doc_id}"
            edit = "singleton"
            title = f"doc {doc_id:010d} {words[0] if words else ''}"
    text = " ".join(words)
    url = f"https://site{doc_id % 1000:04d}.example/p/{doc_id}"
    lang = ("en", "de", "fr", "es")[doc_id % 4]
    noise = f"<!-- v{doc_id} -->" if (doc_id % 211 != 210 and doc_id % 101 != 100
                                      and edit == "htmlnoise") else ""
    html = (
        f"<html><head><title>{title}</title>{noise}</head>"
        f"<body><p>{text}</p></body></html>"
    ).encode("utf-8")
    return url, doc_id, text, lang, cluster, edit, html


def _make_generate(scale: int = 1):
    def _generate(batches):
        for pdf in batches:
            rows = [_row(int(i), scale) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "url": [r[0] for r in rows],
                    "warc_ts": pd.to_datetime(
                        [EPOCH + _dt.timedelta(seconds=r[1]) for r in rows]
                    ),
                    "html": [r[6] for r in rows],
                    "text": [r[2] for r in rows],
                    "lang": [r[3] for r in rows],
                    "cluster_id": [r[4] for r in rows],
                    "edit_class": [r[5] for r in rows],
                }
            )

    return _generate


_FULL_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "cluster_id string, edit_class string"
)


def generate_pages_with_truth(
    spark: SparkSession,
    n_docs: int,
    partitions: int | None = None,
    scale_words: int = 1,
    start: int = 0,
) -> DataFrame:
    """pages + ground-truth columns; distributed and deterministic.

    ``start`` offsets the doc_id range (rows are ``[start, start+n_docs)``)
    so a corpus can be synthesized in arrival-ordered slices — the union of
    consecutive slices is byte-identical to one full-range call, which is
    what lets the streaming-recall harness feed the SAME planted corpus
    through ``process_dedup_batch`` batch by batch."""
    partitions = partitions or max(spark.sparkContext.defaultParallelism, 4)
    return (
        spark.range(start, start + n_docs, numPartitions=partitions)
        .mapInPandas(_make_generate(scale_words), schema=_FULL_SCHEMA)
    )


def generate_pages(
    spark: SparkSession,
    n_docs: int,
    partitions: int | None = None,
    scale_words: int = 1,
) -> DataFrame:
    return generate_pages_with_truth(spark, n_docs, partitions, scale_words).drop(
        "cluster_id", "edit_class"
    )


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver-provided ``documents`` parquet (doc_id, text, lang,
    source, n_chars) to the north-rule pages shape, deterministically."""
    from pyspark.sql import functions as F

    # driver tables are single small parquet files → one input split; spread
    # the (Python-UDF-heavy) downstream work across the executor threads.
    # At real scale the table scan supplies splits and this repartition
    # would be dropped (it is a full shuffle of the source).
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism * 2
    )
    title = F.concat(F.lit("doc "), F.lpad(F.col("doc_id").cast("string"), 10, "0"))
    html = F.concat(
        F.lit("<html><head><title>"), title,
        F.lit("</title></head><body><p>"), F.coalesce(F.col("text"), F.lit("")),
        F.lit("</p></body></html>"),
    )
    return docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/p/"), F.col("doc_id")
        ).alias("url"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("doc_id"))).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.col("lang"),
    )
