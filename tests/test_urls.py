"""URL canonicalization + crawl dedup (operators/urls.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iscc_specs_spark.operators import urls as U


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(U.canonical_url("url").alias("c")).collect()[0]["c"]


def test_canonical_rules(spark):
    cases = {
        # fragment, host/scheme case, www
        "HTTPS://WWW.Site7.EXAMPLE/p/9#frag": "https://site7.example/p/9",
        # default port + trailing slash
        "https://site7.example:443/p/9/": "https://site7.example/p/9",
        "http://site7.example:80/a": "http://site7.example/a",
        # NON-default port survives
        "https://site7.example:8443/p/9": "https://site7.example:8443/p/9",
        # :80 on https is not a default port
        "https://site7.example:80/p/9": "https://site7.example:80/p/9",
        # tracking params dropped, survivors sorted, '?' vanishes when empty
        "https://s.example/p?utm_source=feed&utm_campaign=x": "https://s.example/p",
        "https://s.example/p?b=2&a=1": "https://s.example/p?a=1&b=2",
        "http://www.s.example:80/p/?a=1&gclid=g&b=2": "http://s.example/p?a=1&b=2",
        # already-canonical is a fixed point
        "https://s.example/p?a=1&b=2": "https://s.example/p?a=1&b=2",
        # path case is preserved (only scheme+host lowercase)
        "https://S.example/Path/X": "https://s.example/Path/X",
    }
    for raw, want in cases.items():
        assert _canon(spark, raw) == want, raw


def test_url_dedup_latest_wins_min_url_tiebreak(spark):
    rows = [
        # one canonical page, three spellings; latest ts = 30 twice → min url
        ("https://a.example/p", 10),
        ("https://www.a.example/p#x", 30),
        ("HTTPS://A.EXAMPLE/p?utm_source=z", 30),
        # a singleton
        ("https://b.example/q?a=1", 5),
    ]
    out = {
        r["canon_url"]: r
        for r in U.url_dedup(
            spark.createDataFrame(rows, "url string, warc_ts long")
        ).collect()
    }
    assert len(out) == 2
    a = out["https://a.example/p"]
    assert a["n_variants"] == 3 and a["last_ts"] == 30
    assert a["url"] == "HTTPS://A.EXAMPLE/p?utm_source=z"  # min of the two ts=30
    b = out["https://b.example/q?a=1"]
    assert b["n_variants"] == 1 and b["url"] == "https://b.example/q?a=1"


def test_registered_domain(spark):
    cases = {
        "https://www.news.example.com/a": "example.com",
        "https://a.b.co.uk/x?y=1": "b.co.uk",
        "HTTP://Sub.Site.ORG:8080/p": "site.org",
        "https://site7.example/p/9": "site7.example",
        "https://localhost/x": "localhost",
        "https://deep.sub.tree.example.net/": "example.net",
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r["url"]: r["d"]
        for r in df.select("url", U.registered_domain("url").alias("d")).collect()
    }
    for raw, want in cases.items():
        assert got[raw] == want, raw


def test_domain_stats_order_independent_quality(spark):
    rows = [
        ("https://www.a.example/1", "x " * 20 + "the of and", "en"),
        ("https://a.example/2?utm_source=1", "y", "de"),
        ("https://b.co.uk/1", "z " * 50 + "the is", "en"),
    ]
    out = {
        r["domain"]: r
        for r in U.domain_stats(
            spark.createDataFrame(rows, "url string, text string, lang string")
        ).collect()
    }
    assert set(out) == {"a.example", "b.co.uk"}
    a = out["a.example"]
    assert a["n_docs"] == 2 and a["n_langs"] == 2
    # integer millionths sum makes the average reduction-order-exact
    assert a["sum_q_millionths"] == round(a["avg_quality"] * 2 * 1e6)
    assert out["b.co.uk"]["n_docs"] == 1


def test_crawl_variants_collapse(spark):
    docs = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    crawl = U.crawl_variants(docs)
    assert crawl.count() == 60
    out = U.url_dedup(crawl, ts_col="ts")
    # 6 spelling classes over doc_id, 3 consecutive ids per logical page:
    # every group of 3 collapses to <= 3 canonical urls (https clean,
    # https?a=1&b=2, http?a=1&b=2 depending on which classes hit the page)
    n = out.count()
    assert n < 60
    # canonicalization is idempotent on its own output
    again = out.select(U.canonical_url("canon_url").alias("c"), "canon_url")
    assert again.where(F.col("c") != F.col("canon_url")).count() == 0
