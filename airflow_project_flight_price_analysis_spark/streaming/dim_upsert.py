"""Streaming dimension maintenance over the transactional snapshot table
(round 3 — X7 × D5).

The batch pipeline upserts dims once per run; a streaming pipeline meets
the same reference semantics (insert-if-new, ``dags/tasks/
transformation.py:26-43``) continuously: each micro-batch's candidate
rows are upserted into a :class:`SnapshotTable` inside ``foreachBatch``.

Exactly-once mechanics, mirroring ``ingest.py``'s epoch argument:
``foreachBatch`` is at-least-once, and the insert-if-new apply is
*naturally idempotent* — a replayed epoch re-offers keys the table
already holds, the anti-join drops them, and the snapshot-commit
protocol guarantees the replay can't interleave-corrupt a concurrent
writer (it rebases and retries on conflict). No epoch bookkeeping is
needed for correctness; the replayed commit is an empty-diff snapshot.

Scale posture: the upsert rewrites the dimension (small by construction);
the micro-batch side is only the batch's distinct keys. Backpressure via
``maxFilesPerTrigger`` on the source, as in ingest.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..operators.transactional import SnapshotTable


def make_dim_upsert_sink(table_root: str, key: str):
    """foreachBatch sink: insert-if-new upsert of each micro-batch into
    the snapshot table at ``table_root`` (exposed for direct replay
    tests, like ``make_ingest_sink``)."""

    def sink(batch: DataFrame, epoch_id: int) -> None:
        if not batch.isEmpty():
            SnapshotTable(table_root).upsert(batch.sparkSession, batch, key)

    return sink


def start_dim_stream(source: DataFrame, table_root: str, key: str,
                     checkpoint: str) -> StreamingQuery:
    """Wire a streaming DataFrame of dimension candidates into the
    transactional insert-if-new sink (availableNow: drain-and-stop)."""
    return (
        source.writeStream
        .foreachBatch(make_dim_upsert_sink(table_root, key))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
