"""SparkSession factory tuned for both local testing and cluster scale.

The reference keeps all state in a single FastAPI process (lazy singletons,
``src/api/routes.py:180-307``); our equivalent of "the engine is up" is a
configured SparkSession. Every knob here is chosen for the 100 TB posture:

- AQE on (runtime coalescing, skew-join splitting) so the same plan that
  passes tests on local[32] re-plans itself on a 1000-executor cluster.
- shuffle partitions sized by env (32 locally; a cluster deployment would
  raise it or rely on AQE's coalescing from a high initial value).
- Arrow enabled: every pandas UDF boundary (chunker, embedder, NFKC) moves
  columnar batches, not pickled rows.
- UTC session timezone so date/timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "backend_fastapi_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a real cluster ``master`` comes from spark-submit; locally we default
    to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    nparts = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(nparts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # JVM unified logging (e.g. "[warning][gc,alloc] ... GCLocker"
        # under spill pressure) defaults to STDOUT; stdout must stay
        # machine-parseable (bench.py's headline JSON line is consumed
        # by tailing it), so route JVM warnings to stderr. The default
        # stdout config SURVIVES a plain stderr spec (verified with
        # jcmd VM.log list: both "stdout all=warning" and the new rule
        # coexist), so stdout must be disabled explicitly first.
        .config(
            "spark.driver.extraJavaOptions",
            "-Xlog:disable -Xlog:all=warning:stderr",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
