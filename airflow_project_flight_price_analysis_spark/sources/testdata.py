"""Readers for the driver-generated parquet testdata (TESTDATA.md).

Parquet is the engine's bronze/silver storage format of choice: columnar,
self-describing schema, predicate pushdown + column pruning reach the scan
(check ``.explain`` for ``PushedFilters`` / ``ReadSchema``), splittable for
1000-executor parallelism. The reference's MySQL staging table
(``scripts/init_mysql.sql:6-26``) maps to a parquet bronze layer here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
    """Schema-first scan: parquet carries the schema; no inference runs."""
    if name not in TABLES:
        raise ValueError(f"unknown testdata table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
