"""Streaming sketch maintenance (the X6 × X7 bridge, r13).

A 24/7 ingest pipeline can't re-profile the whole corpus per
micro-batch; the mergeable sketches (operators/profiling.py) exist so
each batch contributes a BOUNDED summary that folds into a running
one. This module runs that fold through the real streaming engine:
``foreachBatch`` computes the batch-local sketch distributed, then
merges the ≤ k-row result into an accumulator driver-side (the
bounded-collect class — every collect here is capped at k rows by the
sketch's own definition, never by the data).

Correctness is the merge LAW, not luck: bottom-k of a union equals
bottom-k of the concatenated member bottom-ks (each member keeps all
its values below its own kth minimum), so the final sketch is
IDENTICAL no matter how the backlog splits into micro-batches — which
is exactly what lets the x124 face sit behind the DuckDB oracle gate:
the oracle computes the one-shot batch sketch and the stream must
reproduce it value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_kmv_sketch(stream_df: DataFrame, key_col: str, k: int,
                      prefilter_denom: int | None = None,
                      ) -> tuple[list[int], int]:
    """Fold a KMV distinct sketch over a streaming DataFrame: run the
    backlog to completion (availableNow) with ``foreachBatch``
    computing each micro-batch's bottom-k (distributed — the same
    prefilter-pushed ``kmv_sketch_table`` plan the batch path uses) and
    merging it into the running sketch by union → re-bottom-k.

    Returns ``(sorted sketch hashes — ≤ k, number of micro-batches
    processed)``. State is O(k) on the driver; per-batch work is one
    scan of the batch capped at k rows after TakeOrdered."""
    from ..operators.profiling import kmv_sketch_table  # noqa: PLC0415

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    state: dict = {"hs": set(), "batches": 0}

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        bk = kmv_sketch_table(batch_df, key_col, k, prefilter_denom)
        state["hs"] = set(sorted(
            state["hs"] | {r.h for r in bk.collect()})[:k])
        state["batches"] += 1

    q = (
        stream_df.writeStream.foreachBatch(_merge)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(state["hs"]), state["batches"]


def stream_cms_sketch(stream_df: DataFrame, key_col: str,
                      depth: int = 4, width: int = 256,
                      ) -> tuple[list[tuple[int, int, int]], int]:
    """Fold a count-min sketch over a streaming DataFrame: per
    micro-batch, build the batch-local counter table distributed
    (operators/profiling.count_min_sketch_table — ≤ depth·width rows by
    construction) and ADD it counter-wise into the running sketch —
    the x54/x57 merge algebra for frequencies, exact by linearity:
    counter[i][b] = Σ over batches of the batch's counter, no matter
    how the backlog splits. Returns ``(sorted (i, b, cnt) rows,
    n_batches)``; driver state is O(depth·width)."""
    from ..operators.profiling import count_min_sketch_table  # noqa: PLC0415

    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    state: dict = {"counters": {}, "batches": 0}

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        bk = count_min_sketch_table(batch_df, key_col, depth, width)
        for r in bk.collect():  # ≤ depth·width rows — bounded collect
            key = (r.i, r.b)
            state["counters"][key] = state["counters"].get(key, 0) + r.cnt
        state["batches"] += 1

    q = (
        stream_df.writeStream.foreachBatch(_merge)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        sorted((i, b, c) for (i, b), c in state["counters"].items()),
        state["batches"],
    )
