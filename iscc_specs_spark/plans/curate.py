"""End-to-end training-data curation plan.

The complete pipeline a 100 TB pre-training corpus actually runs, composed
from the engine's operators in the cost-correct order:

pages → ⓪ quality gate (narrow native-SQL scoring + filter — cheap
pruning BEFORE any expensive kernel work) → ①–④ near-dup detection +
clustering + canonical pick (plans/dedup.py:run_dedup, resumable) →
⑤ final corpus (canonical survivors only) with token accounting.

Every stage materializes through the same StageStore seam as run_dedup
(parquet snapshot + manifest + per-stage metrics), so a killed run resumes
from the last completed stage and the funnel — docs in, dropped-by-
quality, dropped-as-duplicate, docs out, tokens out — is recorded where an
auditor can read it.

Scale notes: the quality gate is a pure projection+filter (whole-stage
codegen, zero shuffle) so it prunes the corpus before the Python codegen
stage ever sees it; everything downstream inherits run_dedup's posture
(skew-capped LSH, O(log n) connected components, broadcast canonical
window per cluster id).
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iscc_specs_spark.operators.textstats import quality_scores, token_counts
from iscc_specs_spark.plans.dedup import DedupConfig, run_dedup
from iscc_specs_spark.sources.storage import StageStore, config_hash


@dataclass
class CurateConfig:
    min_quality: float = 0.35
    dedup: DedupConfig = field(default_factory=DedupConfig)
    lineage: bool = True


def run_curation(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    cfg: CurateConfig | None = None,
) -> dict:
    """Returns {"corpus": final DataFrame, "metrics": funnel dict, ...}."""
    cfg = cfg or CurateConfig()
    store = StageStore(
        out_dir, config_hash(asdict(cfg)), lineage=cfg.lineage
    )

    # ⓪ quality gate — native SQL, no shuffle; score every page, keep the
    # ones above threshold. Both sides are recorded (kept pages feed the
    # pipeline; the scored table itself is the audit trail).
    if store.has("scored"):
        scored = store.read(spark, "scored")
    else:
        scored = store.write(
            pages.join(quality_scores(pages, id_col="url"), "url"),
            "scored",
        )
    kept = scored.where(F.col("quality_score") >= cfg.min_quality)

    # ①–④ dedup on the surviving pages (resumable sub-plan, own manifest)
    dd = run_dedup(spark, kept, f"{out_dir}/dedup", cfg.dedup)

    # ⑤ final corpus: canonical representative per cluster only, with
    # per-document token accounting for downstream data budgeting
    if store.has("corpus"):
        corpus = store.read(spark, "corpus")
    else:
        canonical = dd["canonical"].where(F.col("is_canonical"))
        corpus = store.write(
            # drop the gate's n_tokens so token_counts' full accounting
            # (n_chars / n_tokens / n_bpe_tokens) is the single source
            kept.drop("n_tokens")
            .join(canonical.select("url", "cluster_id"), "url")
            .join(token_counts(kept, id_col="url"), "url"),
            "corpus",
        )

    n_in = pages.count()
    n_kept = kept.count()
    n_out = corpus.count()
    tokens_out = corpus.agg(F.sum("n_tokens")).collect()[0][0] or 0
    metrics = {
        "docs_in": n_in,
        "docs_dropped_quality": n_in - n_kept,
        "docs_dropped_duplicate": n_kept - n_out,
        "docs_out": n_out,
        "tokens_out": int(tokens_out),
    }
    store.record_metrics("funnel", metrics)
    return {
        "scored": scored,
        "corpus": corpus,
        "dedup": dd,
        "metrics": metrics,
        "store": store,
    }
