"""Bucketed stage tables (sources/storage.py): co-located joins must be
exchange-free, and a fresh session must re-attach the on-disk buckets.

Broadcast is disabled inside these tests: at test size Spark would rather
broadcast the 500-row side, which hides the property under test — at 100 TB
neither side of codes ⋈ clusters broadcasts, and the bucketed layout is
what removes the shuffle."""

from __future__ import annotations

import re
from contextlib import contextmanager

from pyspark.sql import functions as F

from iscc_specs_spark.sources.storage import StageStore


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _shuffles(txt: str) -> list[str]:
    # shuffle exchanges only (BroadcastExchange is a different operator);
    # formatted explain prints each node's detail header as "(n) Exchange"
    return re.findall(r"\(\d+\) Exchange\s", txt)


@contextmanager
def _no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _tables(spark, store):
    codes = spark.range(0, 500).select(
        F.concat(F.lit("https://ex.com/p/"), F.col("id")).alias("url"),
        (F.col("id") * 37 % 101).alias("body"),
    )
    clusters = spark.range(0, 500).select(
        F.concat(F.lit("https://ex.com/p/"), F.col("id")).alias("url"),
        (F.col("id") % 25).alias("cluster_id"),
    )
    a = store.write_bucketed(codes, "codes_b", key="url", buckets=8)
    b = store.write_bucketed(clusters, "clusters_b", key="url", buckets=8)
    return a, b


def test_cobucketed_join_has_no_exchange(spark, tmp_path):
    store = StageStore(str(tmp_path / "s"), "cfg1")
    a, b = _tables(spark, store)
    with _no_broadcast(spark):
        joined = a.join(b, "url")
        txt = _plan(joined)
        assert "SortMergeJoin" in txt
        assert not _shuffles(txt), txt
        assert joined.count() == 500

        # negative control: the same join over plain (unbucketed) parquet
        # stages DOES shuffle — the assertion above is not vacuous
        pa = store.write(a, "codes_plain")
        pb = store.write(b, "clusters_plain")
        assert _shuffles(_plan(pa.join(pb, "url")))


def test_bucketed_resume_reattaches_catalog_entry(spark, tmp_path):
    store = StageStore(str(tmp_path / "s2"), "cfg1")
    a, b = _tables(spark, store)
    n = a.join(b, "url").count()

    # simulate a fresh session: external tables drop from the catalog but
    # their files stay; read_bucketed re-issues the recorded DDL
    spark.sql(f"DROP TABLE {store._table_name('codes_b')}")
    spark.sql(f"DROP TABLE {store._table_name('clusters_b')}")
    assert store.has("codes_b"), "files + manifest must survive the drop"
    a2 = store.read_bucketed(spark, "codes_b")
    b2 = store.read_bucketed(spark, "clusters_b")
    with _no_broadcast(spark):
        joined = a2.join(b2, "url")
        assert not _shuffles(_plan(joined)), _plan(joined)
        assert joined.count() == n
