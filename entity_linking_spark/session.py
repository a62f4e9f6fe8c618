"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
same confs apply per-executor (AQE, adaptive skew join, Arrow). The defaults
are chosen for the 100 TB design point: AQE on (runtime re-plan + skew-join
splitting), Arrow-batched pandas UDFs, UTC session timezone so results are
comparable across engines, and shuffle partitions sized to the parallelism
actually available rather than the historic 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "entity_linking_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores=None`` → ``local[$SPARK_GRAFT_CPUS]``. ``master`` overrides
    the master URL entirely (e.g. ``local-cluster[8,1,4096]`` for the
    multi-executor-JVM scaling evidence). On a cluster this module is a
    no-op passthrough: spark-submit owns the master URL and the builder
    just layers engine confs on top.
    """
    n = cores or cpu_count()
    builder = (
        SparkSession.builder.master(master or f"local[{n}]")
        .appName(app_name)
        # shuffle width ~ parallelism; AQE coalesces small post-shuffle
        # partitions at runtime so slight over-provisioning is free.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(n, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # finer post-shuffle targets so AQE coalescing never drops below
        # the core count on mid-size local data (default 64MB advisory
        # collapses a 100MB shuffle onto 2 cores)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        # AQE coalescing is byte-based and cannot see per-row compute cost:
        # with the default 1MB minPartitionSize a ~1MB pair-scoring stage
        # coalesces to ONE task and the Arrow UDF work serializes (measured
        # 4.1s single-task stage at sf0.1). A 64k floor keeps cheap-bytes/
        # expensive-compute stages wide; at real scale partitions are far
        # above 1MB and this floor is inert.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
