"""SparkSession factory with scale-oriented defaults.

The sandbox runs ``local[N]`` in one JVM; the conf below is nevertheless
written for a 1000-executor cluster: AQE on (runtime coalescing + skew-join
splitting), Arrow enabled for every pandas UDF boundary, and shuffle
partitions sized explicitly rather than left at the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "information-retrieval-system-spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(parallelism, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{parallelism}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # single-JVM local mode: the "cluster memory" IS the driver heap;
        # undersizing it makes high-parallelism runs GC-bound (observed:
        # 8g heap cost 25% throughput at local[32] on the build)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "32g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # the sandbox host overcommits CPU (hypervisor steal + other
        # JVMs); under a long starvation window the local-mode executor
        # can miss 60 consecutive 10s heartbeats to its own driver and
        # self-terminate mid-suite.  Longer interval + network timeout
        # ride out the stall; on a real cluster these are the same knobs
        # used for GC-heavy executors.
        .config("spark.executor.heartbeatInterval", "30s")
        .config("spark.network.timeout", "600s")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
