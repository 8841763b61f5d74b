"""SparkSession factory.

Local-mode settings mirror what a 1000-executor cluster profile would set
per-executor: AQE enabled (runtime re-plan, skew-join handling, partition
coalescing), shuffle partitions sized to cores (not the 200 default), UTC
session timezone (parquet testdata is written tz-naive; DuckDB oracle reads
it UTC-naive — see /opt/skills/guides/pyspark_guide.md pitfalls), and Arrow
enabled for the few pandas-UDF code paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "flight-price-analysis-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a tuned local SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or all cores.
    ``shuffle_partitions`` defaults to the core count — at 100 TB on a real
    cluster this is instead sized so post-shuffle partitions land ~128-256 MB
    (AQE coalescing makes the exact number forgiving).
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    n_cores = os.cpu_count() or 8 if cpus == "*" else int(cpus)
    shuffle_partitions = shuffle_partitions or n_cores

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
