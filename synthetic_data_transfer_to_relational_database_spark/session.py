"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (single JVM), but every
config here is chosen to also be the right default on a 1000-executor
cluster: AQE for runtime re-planning (partition coalescing, skew-join
splitting, dynamic broadcast), Arrow for any Python exchange, UTC session
time so results are timezone-stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "sdt-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_shuffle = shuffle_partitions or int(os.environ.get("SPARK_SQL_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        # Size the single local JVM to the machine (r12): pyspark's 1g
        # default heap gave local[32] ~32 MB per task slot — an order
        # tighter than any real executor (prod runs 1–4 GB per core) —
        # and it was the hidden variable behind GC-locker thrash and
        # broadcast-build deaths in the 10× corpus disease sweep
        # (SCALE.md "Heap sizing"). 8g is still conservative for a
        # 128 GiB host and leaves room for concurrent JVMs (pytest,
        # driver sims, bench children). Only effective when this call
        # launches the JVM; ignored on an already-running session.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
        # AQE: coalesce post-shuffle partitions, split skewed joins,
        # convert to broadcast at runtime when a side turns out small.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        # Arrow-batched transfer for pandas UDFs / toPandas.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Timezone-stable results regardless of host TZ.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.maxResultSize", "2g")
        # PySpark 4's per-API-call user-stack capture (error-context
        # decoration) walks the Python stack on EVERY functions.* call —
        # measured ~0.7s of pure inspect/IPython-probe overhead while
        # constructing one wide generated table's plan. An engine builds
        # plans programmatically, so the call-site breadcrumb has no
        # reader here; the JVM exception text is unaffected.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # When a checkpoint dir is configured (skew.checkpoint_pinned's
        # reliable mode), GC checkpoint files with their RDDs instead of
        # accumulating a snapshot per derivation call in shared storage.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
