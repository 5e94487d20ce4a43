"""SparkSession factory tuned for this engine.

Local-mode defaults match the test/bench environment (local[N], single JVM)
while the config choices — AQE, adaptive coalescing, Arrow — are the ones
that matter on a real multi-executor cluster at 100 TB:

- AQE re-plans joins at runtime (broadcast conversion, skew-join splitting),
  which is our substitute for the reference's rule-based index-vs-scan
  choice (core:sql/OCommandExecutorSQLSelect.java:372-429).
- shuffle.partitions sized to cores locally; on a cluster AQE coalesces, so
  a high static number is safe.
- Arrow on: every Pandas UDF in the pipeline ops batch-transfers.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "orientdb_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or min(os.cpu_count() or 4, 32)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # the reference's implicit comparison coercion is lenient — a failed
        # string→number/date parse just doesn't match
        # (core:sql/filter/OSQLFilterCondition.java:73-103); ANSI-off gives
        # the same null-on-malformed-cast semantics
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
