"""Connected components on an edge DataFrame via alternating large-star /
small-star rounds (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC 2014) — O(log n) rounds, no collect_list (hot hubs like a
template-farm star stay as min-aggregations + joins, never materialized as
one row).

Each round is two shuffles; lineage is cut with localCheckpoint every round
(swap for ``checkpoint(dir)`` on a real cluster).  Convergence = stable
(count, xor-of-hashes) edge-set fingerprint — one cheap aggregate per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Attach every neighbor v > u to min(Γ(u) ∪ {u})."""
    sym = edges.select("u", "v").union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", "u").alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Within each node's ≤-neighborhood, attach everything to the min."""
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    moved = (
        directed.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edges = mins.select(F.col("u"), F.col("m").alias("v"))
    return moved.union(self_edges).distinct()


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame, max_iter: int = 30, src: str = "url_a", dst: str = "url_b"
) -> DataFrame:
    """pairs(url_a, url_b) → (url, cluster_id) for every node that appears in
    an edge; cluster_id = min url of the component.  Singleton handling is
    the caller's (left join + coalesce to own url)."""
    edges = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col("u") != F.col("v")
    ).distinct()
    # materialize the input edge list BEFORE iterating: each star round
    # references `edges` several times (unions + joins), and a lazy upstream
    # DAG would be re-executed once per reference inside round 0 (measured
    # 5× wall blow-up with a lazy LSH pair plan upstream)
    edges = edges.localCheckpoint(eager=True)
    prev = None
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        fp = _fingerprint(edges)
        if fp == prev:
            break
        prev = fp
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
    # after convergence every edge is (node → component min)
    return edges.select(F.col("u").alias("url"), F.col("v").alias("cluster_id"))


def assign_clusters(pages_urls: DataFrame, pairs: DataFrame) -> DataFrame:
    """Every url → cluster_id (own url when singleton)."""
    comp = connected_components(pairs)
    return (
        pages_urls.select("url")
        .join(comp, "url", "left")
        .select("url", F.coalesce("cluster_id", "url").alias("cluster_id"))
    )
