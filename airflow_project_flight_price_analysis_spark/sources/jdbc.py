"""JDBC source/sink wrappers — parity with the reference's MySQL/Postgres
I/O (SURVEY.md §2.1 S4-S8; ``dags/tasks/ingestion.py:76-119``,
``transformation.py:50-51``), shaped for scale.

The reference reads whole tables into one process and builds IN-list SQL
strings by concatenation (an injection-prone anti-pattern, S5). Here:

- **Partitioned reads**: ``read_jdbc`` requires a numeric/date partition
  column + bounds so the scan fans out over ``num_partitions`` executor
  connections instead of one driver-side cursor. Spark pushes column
  pruning and (DSv2) filters/aggregates into the remote query.
- **Keyed membership** is a join on a DataFrame of keys (left_semi /
  left_anti), never string-built SQL.
- **Writes**: ``write_jdbc`` appends/overwrites through executor batches
  (``batchsize``); overwrite uses ``truncate=true`` so the remote DDL
  (types, indexes, grants) survives — fixing the reference's
  ``if_exists='replace'`` type-loss bug (S8).

Exercised end-to-end against embedded Apache Derby (bundled in Spark's
jars/) in tests/test_jdbc_integration.py: round-trip, partitioned-read
fan-out, truncate-on-overwrite type preservation, and keyed-membership
joins. The driver testdata path uses parquet throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def read_jdbc(spark: SparkSession, url: str, table: str, *,
              partition_column: str | None = None,
              lower_bound: int | str | None = None,
              upper_bound: int | str | None = None,
              num_partitions: int = 8,
              fetchsize: int = 10_000,
              properties: dict[str, str] | None = None) -> DataFrame:
    """Partitioned JDBC scan. Without a partition column the read is a
    single remote cursor — acceptable only for dimension-sized tables."""
    reader: DataFrameReader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned read needs lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(df: DataFrame, url: str, table: str, *,
               mode: str = "append",
               batchsize: int = 10_000,
               truncate_on_overwrite: bool = True,
               properties: dict[str, str] | None = None) -> None:
    """Executor-parallel JDBC write. ``overwrite`` truncates instead of
    dropping so remote schema/DDL is preserved (S8 divergence-fix)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if mode == "overwrite" and truncate_on_overwrite:
        writer = writer.option("truncate", "true")
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
