"""SparkSession factory with scale-oriented defaults.

Settings chosen for the 100 TB design point and applied identically in tests
and benchmarks:
- AQE on (runtime coalescing + skew-join splitting),
- Arrow execution for all pandas UDFs (the engine's only Python surface),
- explicit shuffle partition count (local default 32 = core count; a cluster
  deployment sets this to ~2-3x total cores),
- broadcast threshold left at default so small build sides (lookup tables,
  polygon covers) broadcast automatically; the engine also broadcasts
  explicitly where it knows better than the stats.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "balrog_spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or \
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        inner = master[master.find("[") + 1:master.find("]")] \
            if "[" in master else "32"
        shuffle_partitions = 32 if inner == "*" else max(int(inner), 4)
    builder = (
        SparkSession.builder.master(master).appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # UI off by default (saves startup + port churn in tests); the
        # shuffle-volume measurement tools set SPARK_GRAFT_UI=true to read
        # per-stage metrics from the UI REST endpoint
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI",
                                                   "false"))
        .config("spark.sql.session.timeZone", "UTC")
    )
    # shuffle to tmpfs when available: local-mode shuffles are tiny vs RAM
    # and disk-backed /tmp serializes the reduce side at high parallelism
    # (on a real cluster this maps to NVMe-backed spark.local.dir)
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        builder = (builder
                   .config("spark.local.dir", f"{shm}/spark-local")
                   .config("spark.shuffle.compress", "false")
                   .config("spark.shuffle.spill.compress", "false"))
    return builder.getOrCreate()
