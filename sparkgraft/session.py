"""SparkSession factory for the sparkgraft engine.

One shared, cached session per process (SURVEY.md §6: the ~9 s JVM startup
must be amortized across every query the driver runs). Config targets both
worlds: correctness-critical settings (UTC session timezone so timestamps
hash-match the DuckDB oracle) and the scale posture (AQE on, skew-join
splitting on, Arrow for the pandas-UDF path). On a real cluster the same
builder works — only `master` and memory sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # Local-mode driver heap: the driver JVM IS the executor in local[N],
    # and Spark's 1g default starves 32 task threads (MemoryStore cache
    # evictions, OOM under cached iterative queries at sf0.1). The sf1
    # rehearsal showed 8g still OOMs a 32-thread 140M-row shuffle
    # (~150 MB execution memory per task slot); 32g is 25% of this box
    # and leaves the task slots ~600 MB each. On a cluster executor
    # sizing replaces this. Override with $SPARK_GRAFT_DRIVER_MEM.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
    # Shuffle sizing: ~cores locally; AQE coalesces down at tiny SFs and
    # splits skewed partitions at huge ones, so this is a ceiling not a law.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for pandas UDFs / toPandas — the only sanctioned
    # Python-side data path (SURVEY.md §2.10 policy).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # DuckDB oracle timestamps are UTC-naive; pin the session so Spark's
    # session-TZ timestamps render identically.
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}


def get_session(app_name: str = "sparkgraft", master: str | None = None) -> SparkSession:
    """Return the process-wide SparkSession, creating it on first call.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``),
    matching the driver's bench invocation.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for key, value in _DEFAULTS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
