"""SparkSession construction with scale-appropriate defaults.

Local testing runs ``local[N]`` but every default here is chosen for a
multi-executor cluster at large scale:

- AQE on (runtime coalescing, skew-join splitting),
- Arrow on (the critical-path kernel exchanges via Arrow batches),
- ``mapKeyDedupPolicy=LAST_WIN`` so tag-list→map normalization keeps the
  last duplicate tag key, matching the reference's dict semantics
  (``/root/reference/traceframe/traceframe.py:261-265`` — later keys win).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "traceframe-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster callers pass ``None`` with a pre-set master in spark-submit.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        # events.parquet carries TIMESTAMP(NANOS); read as long nanos
        # (ordering-compatible; convert at the edge where wall time is needed)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate IGNORES every builder config when a session already
    # exists (notebooks, shared runtimes) — re-apply the runtime-settable
    # correctness confs so tag-map LAST_WIN semantics, the UTC timezone
    # contract, and nano reads hold regardless of who built the session
    for k, v in {
        "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        "spark.sql.adaptive.enabled": "true",
    }.items():
        spark.conf.set(k, v)
    return spark
