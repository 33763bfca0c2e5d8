"""Structured Streaming ingest: continuous pages → codes.

The reference has zero streaming semantics (SURVEY.md §1.2) and the
north-rule resumability is batch snapshot/restart — but a production crawl
delivers pages continuously, so the engine also exposes the codegen stage as
a streaming sink:

    pages stream (file source over the same pages schema)
      → compute_codes (the identical Arrow-vectorized mapInPandas stage —
        mapInPandas is streaming-capable, no separate code path)
      → foreachBatch append into a codes table partitioned by ingest batch

Exactly-once: Spark's streaming checkpoint (offset log + commit log) makes
each micro-batch replay idempotent; the sink writes each batch into its own
``ingest_batch=<id>`` partition directory with dynamic partition overwrite,
so a replayed batch overwrites itself instead of duplicating. Downstream
(LSH/clustering) runs as periodic batch jobs over the accumulated table —
near-dup clustering is a global fixpoint, not a per-window computation, so
windowed streaming state would be the wrong tool (documented deviation in
SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from iscc_specs_spark.operators.codegen import compute_codes

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def read_pages_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over parquet drops of the pages schema (a stand-in
    for a Kafka/WARC-fetcher source; swapping the source format is a one-line
    change here)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )


def start_codes_stream(
    pages_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    tracks: tuple[str, ...] = ("text", "data"),
    trigger_once: bool = True,
) -> StreamingQuery:
    """pages stream → codes table, exactly-once via checkpoint + per-batch
    partition overwrite."""
    codes = compute_codes(pages_stream, tracks)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(out_dir)
        )

    writer = (
        codes.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
