"""Readers for the driver-generated parquet testdata (TESTDATA.md).

Parquet is the engine's bronze/silver storage format of choice: columnar,
self-describing schema, predicate pushdown + column pruning reach the scan
(check ``.explain`` for ``PushedFilters`` / ``ReadSchema``), splittable for
1000-executor parallelism. The reference's MySQL staging table
(``scripts/init_mysql.sql:6-26``) maps to a parquet bronze layer here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Schema-first scan: parquet carries the schema; no inference runs.

    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects; it is read via the
    ``legacy.parquet.nanosAsLong`` conf and truncated to microseconds
    (exactly what DuckDB's reader does with nanos), keeping TimestampType
    downstream.
    """
    if name not in TABLES:
        raise ValueError(f"unknown testdata table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
