"""Structured Streaming incremental ingestion — SURVEY.md §2.1 S2, §3.1.

The reference hand-rolls a micro-batch stream consumer: a line-offset in
an Airflow Variable, reset-on-shrink, commit-after-write
(``dags/tasks/ingestion.py:27-43,125-127``). Structured Streaming's file
source + checkpoint IS that machinery, natively:

- position tracking        → checkpoint file-source log (exact file set)
- reset-on-shrink          → unnecessary (files are immutable units)
- commit-after-write       → ``foreachBatch`` runs the batch writes, then
                             the checkpoint commits — same at-least-once +
                             idempotent-sink = effective exactly-once
- hash-dedup ledger        → the same D1 anti-join inside ``foreachBatch``

At 100 TB: ``maxFilesPerTrigger`` bounds batch size (the reference's
CHUNK_SIZE analog); the ledger anti-join co-partitions by hash prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.star import dedup_against_ledger
from ..sources.flights_csv import BRONZE_SCHEMA, RENAME_MAP

from pyspark.sql import functions as F


def read_flights_stream(spark: SparkSession, input_dir: str,
                        max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming CSV source over a landing directory (schema-first; new
    files = new data, mirroring the reference's append-only CSV log)."""
    reader = spark.readStream.schema(BRONZE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.option("header", "true").csv(input_dir)
    return df.withColumnsRenamed(RENAME_MAP)


def start_stream_ingest(spark: SparkSession, input_dir: str,
                        bronze_path: str, ledger_path: str,
                        checkpoint: str) -> StreamingQuery:
    """foreachBatch idempotent sink: ledger anti-join → append bronze →
    append ledger (write order preserved from the reference,
    ``ingestion.py:118-119,127``)."""

    def sink(batch: DataFrame, epoch_id: int) -> None:
        sess = batch.sparkSession
        try:
            ledger = sess.read.parquet(ledger_path)
        except Exception:
            ledger = None
        fresh = dedup_against_ledger(batch, ledger)
        fresh = fresh.withColumn("load_timestamp", F.current_timestamp())
        fresh.persist()
        try:
            if fresh.count():
                fresh.drop("row_hash").write.mode("append").parquet(bronze_path)
                fresh.select("row_hash", "load_timestamp").write.mode("append").parquet(ledger_path)
        finally:
            fresh.unpersist()

    return (
        read_flights_stream(spark, input_dir)
        .writeStream
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
