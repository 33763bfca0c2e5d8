"""URL canonicalization + URL-level crawl dedup.

A Common-Crawl-shaped corpus keys every page by ``url`` (the input table is
``(url, warc_ts, html, text, lang)``), and the same page routinely arrives
under many spellings: scheme/host case, a ``www.`` prefix, an explicit
default port, tracking query parameters, parameter order, trailing slashes
and fragments. Canonicalizing BEFORE content dedup removes the cheapest
duplicate class with zero kernel work — string functions only, no shuffle —
and ``url_dedup`` then keeps exactly one crawl record per canonical url
(latest ``warc_ts`` wins; ties break to the lexicographically smallest
original url, so the pick is deterministic under re-crawls).

Canonical form (engine-defined, applied identically by the DuckDB oracle
twin in ``oracles.py``):

1. drop the ``#fragment``;
2. lowercase the scheme and the host; strip one leading ``www.``;
3. strip an explicit default port (``:80`` for http, ``:443`` for https);
4. strip trailing ``/`` from the path;
5. drop tracking parameters (``utm_*``, ``gclid``, ``fbclid``, ``ref``,
   ``sessionid``), sort the survivors byte-wise, rejoin with ``&`` (the
   ``?`` disappears when nothing survives).

Everything is Catalyst built-ins (regexp_extract / filter / array_sort on
a short per-row array — the interpreted-HOF cost documented in CLAUDE.md
applies to per-element work over thousands of elements, not to a handful
of query parameters), so the operator is whole-stage-codegen resident and
a pure projection: at 100 TB it rides the scan with no exchange.

``url_dedup`` is two aggregations on the same key: (max ts, variant count)
then min(url) among latest-ts rows. Both shuffles hash on ``canon_url`` —
the second join is co-partitioned with the first's output, and canonical
urls cannot be skewed hubs (a url's variant count is bounded by crawl
frequency, not corpus size).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_RE = r"^(utm_[^=]*|gclid|fbclid|ref|sessionid)(=.*)?$"

# second-level labels under which a third label is the registrable domain
# (engine-defined shortlist, not a full public-suffix list — the rule is
# deterministic and its DuckDB twin applies the identical set)
SUFFIX_2LD = ("co", "com", "net", "org", "ac", "gov", "edu")


def canonical_url(url: Column | str) -> Column:
    """Canonical form of ``url`` (see module docstring for the rules)."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")  # 1. fragment
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[^:/?#]+://([^/?#]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")  # 2. www.
    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.regexp_replace(host, r":80$", ""),
    ).when(
        (scheme == "https") & host.endswith(":443"),
        F.regexp_replace(host, r":443$", ""),
    ).otherwise(host)  # 3. default port
    path = F.regexp_extract(u, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")  # 4. trailing slash
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_RE),
        )
    )  # 5. tracking params + order
    qpart = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qpart)


def registered_domain(url: Column | str) -> Column:
    """Registrable domain of ``url``: lowercase host, ``www.`` and port
    stripped, then the last 2 labels — or 3 when the second-to-last label
    is a :data:`SUFFIX_2LD` entry (``a.b.co.uk`` → ``b.co.uk``)."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.regexp_extract(u, r"^[^:/?#]+://([^/?#]*)", 1))
    host = F.regexp_replace(F.regexp_replace(host, r"^www\.", ""), r":\d+$", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    take3 = (n >= 3) & F.element_at(labels, -2).isin(*SUFFIX_2LD)
    return F.when(take3, F.array_join(F.slice(labels, -3, 3), ".")).otherwise(
        F.when(n >= 2, F.array_join(F.slice(labels, -2, 2), ".")).otherwise(host)
    )


def domain_stats(
    pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-registrable-domain corpus statistics — the aggregation behind
    domain-level filtering (C4 / RefinedWeb prune whole domains on these).

    Returns ``(domain, n_docs, n_tokens, sum_q_millionths, avg_quality,
    n_langs)``. The quality average is computed order-independently: the
    per-doc ``quality_score`` (already rounded to 6 dp) is scaled to an
    integer millionths sum, so Spark and the DuckDB twin produce the exact
    same double regardless of aggregation order — float ``avg()`` over a
    shuffled table is NOT reduction-order-stable, an integer sum is.

    Scale shape: quality scoring is a zero-shuffle codegen projection, so
    the whole operator is scan → project → one exchange on ``domain``
    (map-side partial aggregation; domains are bounded hot keys only in
    the sense of crawl frequency, and the partial agg absorbs them).
    """
    from iscc_specs_spark.operators.textstats import quality_scores

    rows = quality_scores(
        pages.select(
            F.col(url_col).alias("url"),
            F.col(lang_col).alias("lang"),
            F.col(text_col).alias("text"),
        ),
        id_col="url",
        keep_cols=("lang",),
    )
    return domain_rollup(rows)


def domain_rollup(rows: DataFrame) -> DataFrame:
    """The per-domain aggregation of :func:`domain_stats` over ALREADY
    scored rows ``(url, lang, n_tokens, quality_score)`` — split out so a
    plan that stages per-doc quality once (plans/curate.py's domain gate)
    can derive the rollup from the staged table instead of running the
    full-corpus quality projection a second time."""
    return (
        rows.select(
            registered_domain("url").alias("domain"),
            "n_tokens",
            (F.round(F.col("quality_score") * 1e6)).cast("long").alias("q_m"),
            "lang",
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("q_m").alias("sum_q_millionths"),
            F.count_distinct("lang").alias("n_langs"),
        )
        .select(
            "domain",
            "n_docs",
            "n_tokens",
            "sum_q_millionths",
            F.round(
                F.col("sum_q_millionths") / 1e6 / F.col("n_docs"), 6
            ).alias("avg_quality"),
            "n_langs",
        )
    )


def crawl_variants(
    docs: DataFrame, id_col: str = "doc_id", keep_id: bool = False
) -> DataFrame:
    """Deterministic messy crawl records ``(url, ts)`` from a documents
    table — the driver-contract fixture for :func:`url_dedup` (the DuckDB
    twin rebuilds the identical rows in SQL, ``oracles.py:url_dedup_sql``).

    Every 3 consecutive doc_ids share one logical page; ``doc_id % 6``
    picks the spelling: clean, SHOUTED host + fragment, explicit :443 +
    trailing slash, utm-tracked, unordered params, or http + :80 + www +
    gclid. ``ts`` staggers deterministically so the latest-crawl pick is
    data-dependent, not positional.
    """
    i = F.col(id_col).cast("long")
    site = (F.floor(i / 3) % 40).cast("string")
    page = F.floor(i / 3).cast("string")
    k = i % 6
    url = (
        F.when(k == 0, F.concat(F.lit("https://site"), site, F.lit(".example/p/"), page))
        .when(k == 1, F.concat(F.lit("HTTPS://WWW.Site"), site, F.lit(".EXAMPLE/p/"), page, F.lit("#frag")))
        .when(k == 2, F.concat(F.lit("https://site"), site, F.lit(".example:443/p/"), page, F.lit("/")))
        .when(k == 3, F.concat(F.lit("https://site"), site, F.lit(".example/p/"), page, F.lit("?utm_source=feed&utm_campaign=x")))
        .when(k == 4, F.concat(F.lit("https://site"), site, F.lit(".example/p/"), page, F.lit("?b=2&a=1")))
        .otherwise(F.concat(F.lit("http://www.site"), site, F.lit(".example:80/p/"), page, F.lit("?a=1&gclid=g&b=2")))
    )
    ts = (F.lit(1700000000).cast("long") + (i * 37) % 100000).alias("ts")
    cols = ([F.col(id_col)] if keep_id else []) + [url.alias("url"), ts]
    return docs.select(*cols)


def url_dedup(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    canon_col: str | None = None,
) -> DataFrame:
    """One crawl record per canonical url.

    Returns ``(canon_url, url, last_ts, n_variants)`` where ``url`` is the
    kept original spelling: the latest ``ts_col`` wins and ties break to
    the smallest original url. ``ts_col`` may be a timestamp or any
    orderable type. Pass ``canon_col`` when the input already carries the
    canonical form (e.g. the streaming batch canonicalizes once and reuses
    it for the history-index prefix).
    """
    canon = pages.select(
        (
            F.col(canon_col) if canon_col else canonical_url(url_col)
        ).alias("canon_url"),
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("ts"),
    )
    latest = canon.groupBy("canon_url").agg(
        F.max("ts").alias("last_ts"),
        F.count("*").alias("n_variants"),
    )
    return (
        canon.join(latest, "canon_url")
        .where(F.col("ts") == F.col("last_ts"))
        .groupBy("canon_url", "last_ts", "n_variants")
        .agg(F.min("url").alias("url"))
        .select("canon_url", "url", "last_ts", "n_variants")
    )
