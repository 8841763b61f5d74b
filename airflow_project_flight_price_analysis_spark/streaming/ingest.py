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
    # enforceSchema=false: validate each file's header against the
    # schema names instead of binding columns positionally (see
    # read_flights_csv — a reordered vendor header must fail loudly,
    # not silently swap columns into bronze)
    df = (reader.option("header", "true")
          .option("enforceSchema", "false").csv(input_dir))
    return df.withColumnsRenamed(RENAME_MAP)


def make_ingest_sink(bronze_path: str, ledger_path: str):
    """Build the foreachBatch sink (exposed so tests can replay an epoch
    directly — the exactly-once claim is a *replay* property, which a
    happy-path stream run never exercises)."""

    def sink(batch: DataFrame, epoch_id: int) -> None:
        from ..operators.star import read_ledger

        sess = batch.sparkSession
        ledger = read_ledger(sess, ledger_path)
        # Checkpoint/ledger coherence (shared guard — see
        # streaming/coherence.py; the stakes HERE are history loss: a
        # reset checkpoint restarting at epoch 0 would dynamic-overwrite
        # the historical epoch-0 bronze and ledger partitions, silently
        # deleting already-ingested rows AND their dedup hashes).
        if ledger is not None:
            from .coherence import check_epoch_coherence

            check_epoch_coherence(ledger, int(epoch_id), what="ingest")
            # replay discipline (r7 review — neardup.py has had this
            # filter from the start): dedup against the PRE-epoch
            # ledger only. A crash mid-ledger-write can leave a PARTIAL
            # epoch_id=N partition; replaying N against it would treat
            # the partially-written hashes as "seen", compute fresh =
            # a strict subset, and dynamic-overwrite the COMPLETE
            # bronze partition with that subset — permanent row loss.
            ledger = ledger.filter(F.col("epoch_id") < int(epoch_id))
        fresh = dedup_against_ledger(batch, ledger)
        fresh = (
            fresh.withColumn("load_timestamp", F.current_timestamp())
            .withColumn("epoch_id", F.lit(int(epoch_id)))
        )
        fresh.persist()
        try:
            if fresh.count():
                (fresh.drop("row_hash")
                 .write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("epoch_id")
                 .parquet(bronze_path))
                (fresh.select("row_hash", "load_timestamp", "epoch_id")
                 .write.mode("overwrite")
                 .option("partitionOverwriteMode", "dynamic")
                 .partitionBy("epoch_id")
                 .parquet(ledger_path))
        finally:
            fresh.unpersist()

    return sink


def start_stream_ingest(spark: SparkSession, input_dir: str,
                        bronze_path: str, ledger_path: str,
                        checkpoint: str,
                        max_files_per_trigger: int | None = None,
                        ) -> StreamingQuery:
    """foreachBatch replay-idempotent sink: ledger anti-join → write
    bronze → write ledger (write order preserved from the reference,
    ``ingestion.py:118-119,127``).

    Exactly-once mechanics: foreachBatch is at-least-once, so both writes
    key on ``epoch_id`` with dynamic partition overwrite instead of blind
    appends. A crash between the bronze and ledger writes replays the
    epoch; the replay recomputes the same ``fresh`` set (the ledger still
    lacks those hashes) and *overwrites* the epoch's partition rather
    than appending a duplicate copy — at-least-once delivery + per-epoch
    idempotent writes = exactly-once bronze contents."""
    return (
        read_flights_stream(spark, input_dir, max_files_per_trigger)
        .writeStream
        .foreachBatch(make_ingest_sink(bronze_path, ledger_path))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
