"""SparkSession factory with scale-oriented defaults.

Local-mode testing stands in for the multi-executor cluster; all knobs
are chosen so the same plan shape survives a 1000-executor / 100 TB
deployment: AQE on (runtime coalesce + skew-join splitting), Arrow
enabled for the vectorized UDF path, shuffle partitions sized to cores
locally (cluster: 2-3× total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "hepcrawl-spark",
              cpus: int | None = None,
              shuffle_partitions: int | None = None,
              master: str | None = None) -> SparkSession:
    """``master`` overrides the default ``local[cpus]`` — e.g.
    ``local-cluster[4,8,8192]`` for multi-executor-JVM benchmarking
    (separate heaps: the honest sandbox analog of N vs 4N executors).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder
        .master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # broadcast small dims (robots/politeness tables) aggressively
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # metastore-backed (bucketed) tables live under /tmp, never in
        # the repo working dir
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE",
                               "/tmp/hepcrawl-spark-warehouse"))
        .config("spark.driver.extraJavaOptions",
                "-Dderby.system.home=/tmp/hepcrawl-spark-derby")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # ship the package to executor python workers (the pip-less
        # local analog of `spark-submit --py-files hepcrawl_spark.zip`)
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
    )
    return builder.getOrCreate()
