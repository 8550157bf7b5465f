"""SparkSession factory tuned for the record-linkage workload.

Local-mode defaults mirror a multi-executor cluster layout: shuffle
partitions ~= cores, AQE on (incl. skew-join splitting), Arrow on for
the pandas-UDF scoring path. On a real cluster the same builder is
used with ``master`` left to spark-submit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sparksimjoin",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores=None -> leave master untouched (spark-submit decides) unless
    no master is configured, in which case local[*].

    driver_memory=None -> $SPARKSIMJOIN_DRIVER_MEM or 12g. The default
    is deliberately RIGHT-SIZED, not maximal: with a huge heap G1
    wanders a tens-of-GB young gen across the address space, ballooning
    RSS far beyond the workload's live set. On memory-oversubscribed
    virtualized hosts that triggers hypervisor demand-faulting (pages
    host-evicted, ~ms per first touch — measured 6 MB/s fill speed in
    bad windows; see BENCH/BASELINE.md round-4 root-cause entry), which
    multiplied allocation-heavy stages 7-40x. The same discipline is
    the right call on a real cluster: size executor heaps to the
    workload (execution memory spills gracefully when tight) instead
    of handing each executor the machine.
    """
    n = cores or int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or os.cpu_count() or 4
    driver_memory = (driver_memory
                     or os.environ.get("SPARKSIMJOIN_DRIVER_MEM") or "12g")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Djava.io.tmpdir=/tmp")
    )
    if not os.environ.get("SPARK_MASTER_SET"):
        builder = builder.master(f"local[{n}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
