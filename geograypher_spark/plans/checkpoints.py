"""Content-hash checkpoint tables + per-partition lineage metrics.

Reference analog: file-stage checkpointing with skip-if-exists
(``cameras/cameras.py:1317-1397``: ``line_segments.npz`` /
``edge_weights.json`` / ``communities.npz``) and content-hash memoization
(``meshes/meshes.py:1720-1737`` pix2face cache keyed by mesh+camera+scale
sha256; ``cameras/cameras.py:104-134`` camera hash).

Spark-first form (north_rule: "resumable from checkpoint with per-partition
lineage + metrics"):

- a stage writes its output DataFrame to ``<root>/<stage>/<key>/data``
  through a ``TableFormat`` (``sources/table_format.py``) — Parquet
  directories in this sandbox, Iceberg catalog tables when the runtime
  jar + catalog conf are present (``IcebergFormat``; the swap is a
  constructor argument, not a rewrite) — where ``key`` = sha256 of the
  stage name, its parameters, and the keys of its input stages — a
  lineage DAG by construction
- re-running the same pipeline skips any stage whose key directory already
  has a _SUCCESS marker
- every materialization also records per-partition row counts + a
  lineage record (inputs, params, wall time) to ``<key>/lineage.json``
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def content_key(stage: str, params: dict, input_keys: list[str]) -> str:
    """Deterministic stage key: sha256 over stage name + canonical params +
    sorted input keys (X13 analog)."""
    blob = json.dumps(
        {"stage": stage, "params": params, "inputs": sorted(input_keys)},
        sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:24]


@dataclass
class CheckpointedStage:
    key: str
    path: str
    skipped: bool
    row_count: int
    n_partitions: int
    wall_s: float


@dataclass
class CheckpointManager:
    spark: SparkSession
    root: str
    records: list[CheckpointedStage] = field(default_factory=list)
    fmt: "TableFormat | None" = None  # default ParquetFormat

    def __post_init__(self):
        if self.fmt is None:
            from ..sources.table_format import ParquetFormat

            self.fmt = ParquetFormat()

    def _dir(self, stage: str, key: str) -> str:
        return os.path.join(self.root, stage, key)

    def run(
        self,
        stage: str,
        params: dict,
        inputs: list[str],
        build,  # Callable[[], DataFrame]
    ) -> tuple[DataFrame, str]:
        """Run-or-resume one stage. ``build`` is only called on a cache
        miss. Returns (DataFrame read back from the checkpoint, stage_key).
        Reading back (not reusing the in-memory plan) guarantees the
        downstream plan is cut at the checkpoint — a true lineage barrier."""
        key = content_key(stage, params, inputs)
        d = self._dir(stage, key)
        data_dir = os.path.join(d, "data")
        t0 = time.time()
        skipped = self.fmt.exists(self.spark, data_dir)
        if not skipped:
            df = build()
            self.fmt.write(df, data_dir)
        out = self.fmt.read(self.spark, data_dir)
        # per-partition row-count metrics (A16 analog, north_rule)
        part_counts = (
            out.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid").count().collect())
        rows = int(sum(r["count"] for r in part_counts))
        lineage = {
            "stage": stage, "key": key, "params": params, "inputs": inputs,
            "row_count": rows,
            "partition_rows": {int(r["_pid"]): int(r["count"]) for r in part_counts},
            "skipped": skipped,
            "wall_s": round(time.time() - t0, 3),
            "ts": time.time(),
        }
        with open(os.path.join(d, "lineage.json"), "w") as fh:
            json.dump(lineage, fh, indent=2, sort_keys=True)
        self.records.append(CheckpointedStage(
            key=key, path=data_dir, skipped=skipped, row_count=rows,
            n_partitions=len(part_counts), wall_s=lineage["wall_s"]))
        return out, key

    def lineage(self) -> list[dict]:
        out = []
        for rec in self.records:
            with open(os.path.join(os.path.dirname(rec.path), "lineage.json")) as fh:
                out.append(json.load(fh))
        return out
