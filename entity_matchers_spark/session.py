"""SparkSession factory with scale-oriented defaults.

The reference repo hand-manages parallelism with multiprocessing pools
(/root/reference/OpenEA_Mod/src/openea/modules/utils/util.py:19-34); in Spark
that collapses into partition parallelism — the knobs that matter are shuffle
partitioning, AQE (runtime re-planning + skew-join splitting), and Arrow batch
size for the pandas-UDF scoring stage.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "entity-matchers-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox; on a
    real cluster, leave it unset and let spark-submit supply it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # local[N] → N shuffle partitions; a cluster would use 2-3x total cores.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else cpus
        shuffle_partitions = int(cpus) if n == "*" else int(n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing is sized by shuffle *bytes*; compute-bound stages
        # (pandas-UDF scoring, levenshtein over long strings) have tiny
        # inputs but huge CPU cost — keep small shuffles wide rather than
        # collapsing them to 1 task. At 100 TB these floors are no-ops.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local mode: driver == executor — size the heap for all cores
        # (32 threads on 8g thrash GC and flatten the core-count scaling)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def default_partitions(spark: SparkSession) -> int:
    """Compute-stage width: total cores in local mode, defaultParallelism on
    a cluster. Used to repartition compute-bound stages whose *data* is too
    small for size-based planning to parallelize (scoring UDFs, verify
    joins) — at production scale the same repartition is the shuffle the
    stage would do anyway."""
    return spark.sparkContext.defaultParallelism
