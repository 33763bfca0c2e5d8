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
