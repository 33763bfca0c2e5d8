"""Per-cluster Mixed Content-ID aggregation.

The reference's ``content_id_mixed`` (/root/reference/src/iscc/iscc.py:99-117)
is the one operator in the spec that is a true *aggregation*: it SimHashes
the decoded headers+bodies of several Content-IDs into one 13-char code.
Pipeline exposure: one Mixed Content-ID per duplicate cluster — a compact
cluster-level signature (e.g. for cross-snapshot cluster matching).

Spark mapping (SURVEY.md §2.1): grouped ``applyInPandas`` — the only
grouped-UDF in the engine; groups are duplicate clusters (bounded size in
practice; a pathological mega-cluster is capped upstream by the LSH bucket
caps and hub-and-spoke edges, so collect-per-group is safe here).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from iscc_specs_spark.kernel.codes import content_id_mixed

OUT_SCHEMA = "cluster_id string, mixed_cid string, n_members int"


def cluster_mixed_cid(codes: DataFrame, clusters: DataFrame) -> DataFrame:
    """(codes ⋈ clusters) → one Mixed Content-ID per multi-member cluster.

    codes must carry (url, content_id); clusters (url, cluster_id).
    Single-member clusters are excluded (a mixed code of one element is
    just a re-headered copy — the reference requires ≥2 inputs in spirit).
    """
    joined = codes.select("url", "content_id").join(clusters, "url")

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        cids = sorted(pdf["content_id"].dropna().tolist())
        if len(cids) < 2:
            return pd.DataFrame(
                {"cluster_id": [], "mixed_cid": [], "n_members": []}
            ).astype({"cluster_id": str, "mixed_cid": str, "n_members": int})
        return pd.DataFrame(
            {
                "cluster_id": [pdf["cluster_id"].iloc[0]],
                "mixed_cid": [content_id_mixed(cids)],
                "n_members": [len(cids)],
            }
        )

    return joined.groupBy("cluster_id").applyInPandas(agg, schema=OUT_SCHEMA)
