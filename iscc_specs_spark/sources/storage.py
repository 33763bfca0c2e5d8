"""Storage seam: parquet stage tables with snapshot manifests.

North-rule target is Iceberg; this sandbox has no Iceberg jars, so each
stage writes a plain parquet directory plus a ``manifest.json`` snapshot
record (stage name, config fingerprint, row count, wall time, per-partition
lineage).  Swapping ``format("parquet")`` for ``format("iceberg")`` +
snapshot-id bookkeeping is localized to this module (SURVEY.md §7.1).

Resume contract: a stage is reusable iff its directory has Spark's
``_SUCCESS`` marker AND the manifest's config hash matches the current run
config.  Stage writes are idempotent (overwrite).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def config_hash(cfg: dict[str, Any]) -> str:
    return hashlib.sha256(
        json.dumps(cfg, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


class StageStore:
    def __init__(self, root: str, cfg_hash: str, lineage: bool = True):
        self.root = root
        self.cfg_hash = cfg_hash
        self.lineage = lineage
        os.makedirs(root, exist_ok=True)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.root, f"{stage}.manifest.json")

    def has(self, stage: str) -> bool:
        mp = self._manifest_path(stage)
        ok = os.path.exists(os.path.join(self._dir(stage), "_SUCCESS")) and os.path.exists(mp)
        if not ok:
            return False
        with open(mp) as f:
            manifest = json.load(f)
        return manifest.get("config_hash") == self.cfg_hash

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(self._dir(stage))

    def record_metrics(self, name: str, metrics: dict) -> None:
        """Side-channel metrics file (e.g. a curation funnel) next to the
        stage manifests, keyed by the same config hash."""
        with open(os.path.join(self.root, f"{name}.metrics.json"), "w") as f:
            json.dump({"config_hash": self.cfg_hash, **metrics}, f, indent=1)

    def manifest(self, stage: str) -> dict:
        with open(self._manifest_path(stage)) as f:
            return json.load(f)

    # --- bucketed stage tables (exchange-free co-located joins) ---------
    #
    # Hash-bucketed at-rest layout is the 100 TB lever partitionBy cannot
    # provide: two stage tables bucketed by the same key into the same
    # bucket count join WITHOUT any Exchange — Spark's bucketed scan
    # already satisfies the join's distribution requirement, so a resumed
    # run's codes ⋈ clusters (url) or any downstream key-probe moves zero
    # bytes over the network. Bucketing metadata lives in the session
    # catalog, not the parquet footers, so re-attaching an existing
    # bucketed directory in a NEW session just re-issues the CREATE TABLE
    # DDL (schema + CLUSTERED BY recorded in the manifest) over the same
    # LOCATION — the resume contract stays file-based.

    def _table_name(self, stage: str) -> str:
        slug = hashlib.sha256(
            os.path.abspath(self.root).encode()
        ).hexdigest()[:12]
        return f"stage_{slug}_{stage}"

    def write_bucketed(
        self,
        df: DataFrame,
        stage: str,
        key: str,
        buckets: int = 64,
        extra_metrics: dict | None = None,
    ) -> DataFrame:
        """Materialize a stage hash-bucketed (and per-file sorted) by
        ``key`` as an external table at the stage directory; returns the
        catalog-backed DataFrame whose scans carry the bucket spec."""
        spark = df.sparkSession
        tbl = self._table_name(stage)
        path = self._dir(stage)
        t0 = time.monotonic()
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            df.write.mode("overwrite")
            .option("path", path)
            .bucketBy(buckets, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(tbl)
        )
        wall_ms = int((time.monotonic() - t0) * 1000)
        out = spark.table(tbl)
        rows = out.count()
        manifest = {
            "stage": stage,
            "snapshot_id": f"{stage}-{self.cfg_hash}",
            "config_hash": self.cfg_hash,
            "rows": rows,
            "wall_ms": wall_ms,
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "bucket_by": {"key": key, "buckets": buckets},
            "schema_ddl": df._jdf.schema().toDDL(),
            "metrics": extra_metrics or {},
        }
        with open(self._manifest_path(stage), "w") as f:
            json.dump(manifest, f, indent=1)
        return out

    def read_bucketed(self, spark: SparkSession, stage: str) -> DataFrame:
        """Read a bucketed stage back WITH its bucket spec. If the table
        is not in this session's catalog (fresh session resuming an
        on-disk run), re-register the external table from the manifest's
        recorded schema + bucket spec over the existing directory."""
        tbl = self._table_name(stage)
        if not spark.catalog.tableExists(tbl):
            m = self.manifest(stage)
            b = m["bucket_by"]
            spark.sql(
                f"CREATE TABLE {tbl} ({m['schema_ddl']}) USING PARQUET "
                f"CLUSTERED BY ({b['key']}) SORTED BY ({b['key']}) "
                f"INTO {b['buckets']} BUCKETS "
                f"LOCATION '{self._dir(stage)}'"
            )
        return spark.table(tbl)

    def write(
        self,
        df: DataFrame,
        stage: str,
        extra_metrics: dict | None = None,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        """Materialize a stage; returns the re-read DataFrame (cuts lineage,
        making every downstream stage restartable from disk)."""
        t0 = time.monotonic()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        path = self._dir(stage)
        writer.parquet(path)
        wall_ms = int((time.monotonic() - t0) * 1000)

        spark = df.sparkSession
        out = spark.read.parquet(path)
        lineage_rows: list[dict] = []
        if self.lineage:
            lineage_rows = [
                {"partition_id": int(r["pid"]), "rows": int(r["rows"])}
                for r in out.groupBy(F.spark_partition_id().alias("pid"))
                .agg(F.count("*").alias("rows"))
                .collect()
            ]
        rows = sum(r["rows"] for r in lineage_rows) if lineage_rows else out.count()
        manifest = {
            "stage": stage,
            "snapshot_id": f"{stage}-{self.cfg_hash}",
            "config_hash": self.cfg_hash,
            "rows": rows,
            "wall_ms": wall_ms,
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "partition_by": partition_by or [],
            "partitions": lineage_rows,
            "metrics": extra_metrics or {},
        }
        with open(self._manifest_path(stage), "w") as f:
            json.dump(manifest, f, indent=1)
        return out
