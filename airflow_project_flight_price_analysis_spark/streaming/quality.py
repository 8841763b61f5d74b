"""Streaming data-quality quarantine — the dead-letter-queue pattern.

The streaming twin of x97's batch expectation battery
(plans/mining.py): each micro-batch is split by a conjunction of
expectation predicates; passing rows append to the good path, failing
rows append to a quarantine path ANNOTATED with which checks failed —
so a bad upstream feed degrades into a reviewable quarantine instead of
either poisoning the table or crashing the stream (the streaming
generalization of the reference's row-count validation gate,
validation.py O4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_violations(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Annotate each row with ``violations``: the sorted array of check
    names whose predicate FAILED (empty array = clean row). Checks are
    ordinary Column predicates, evaluated map-side in one pass; a NULL
    predicate result counts as a failure (unknown ≠ pass)."""
    flags = [
        F.when(expr.isNull() | ~expr, F.lit(name)) for name, expr in
        sorted(checks.items())
    ]
    return df.withColumn(
        "violations",
        F.array_compact(F.array(*flags)).cast("array<string>"),
    )


def make_quarantine_sink(
    checks: dict[str, Column], good_path: str, quarantine_path: str
):
    """foreachBatch sink splitting each micro-batch on the expectation
    battery: clean rows append to ``good_path`` (without the audit
    column); violating rows append to ``quarantine_path`` with the
    ``violations`` array and the epoch id. One evaluation of the checks
    serves both branches (the annotated frame is persisted for its two
    consumers and released before the epoch commits)."""

    def sink(batch: DataFrame, epoch_id: int) -> None:
        annotated = with_violations(batch, checks).persist()
        try:
            clean = annotated.filter(F.size("violations") == 0).drop(
                "violations"
            )
            bad = annotated.filter(F.size("violations") > 0).withColumn(
                "epoch_id", F.lit(int(epoch_id))
            )
            clean.write.mode("append").parquet(good_path)
            if bad.limit(1).count():
                bad.write.mode("append").parquet(quarantine_path)
        finally:
            annotated.unpersist()

    return sink


def start_quality_stream(
    source: DataFrame,
    checks: dict[str, Column],
    good_path: str,
    quarantine_path: str,
    checkpoint_dir: str,
    *,
    available_now: bool = False,
):
    """Wire a streaming source through the quarantine sink with a
    checkpoint (restart-safe: foreachBatch re-delivers an uncommitted
    epoch; parquet append makes replay at-least-once on the good path —
    pair with the ledger dedup of streaming/ingest.py when exactly-once
    matters)."""
    writer = (
        source.writeStream.foreachBatch(
            make_quarantine_sink(checks, good_path, quarantine_path)
        )
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
