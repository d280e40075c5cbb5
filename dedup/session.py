"""SparkSession factory with scale-minded defaults.

AQE is on (runtime partition coalescing + skew-join splitting — the engine
leans on it for hot-band skew, SURVEY §4), Arrow transport is on (every heavy
per-row op is a pandas UDF / mapInPandas stage).
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession

# repo root containing the `dedup` package — appended to executor PYTHONPATH
# so pandas-UDF workers can unpickle our functions no matter where the driver
# process was launched from (spark-submit ships a zip via --py-files instead).
_PKG_ROOT = str(Path(__file__).resolve().parent.parent)


def build_session(app_name: str = "dedup-spark",
                  master: str | None = None,
                  shuffle_partitions: int | None = None,
                  extra_conf: dict | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and master == "local[*]":
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("DEDUP_SHUFFLE_PARTITIONS", "32"))
    worker_pythonpath = os.pathsep.join(
        p for p in (_PKG_ROOT, os.environ.get("PYTHONPATH")) if p)
    b = (
        SparkSession.builder.appName(app_name)
        .config("spark.executorEnv.PYTHONPATH", worker_pythonpath)
        .config("spark.yarn.appMasterEnv.PYTHONPATH", worker_pythonpath)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # Python worker pooling: Spark 4.1 leaves the fork-daemon off by
        # default; without it every pandas-UDF task pays a full worker spawn
        # (measured 2.5x wall on UDF-heavy stages at local[32])
        .config("spark.python.use.daemon", "true")
        .config("spark.python.worker.reuse", "true")
        .config("spark.python.worker.idleTimeoutSeconds", "600")
        .config("spark.driver.memory", os.environ.get("DEDUP_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
