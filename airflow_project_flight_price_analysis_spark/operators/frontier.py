"""Multi-objective frontier and interval-union operators.

Reusable cores of q64 (Pareto skyline) and q69 (gaps-and-islands
interval merge), extracted so the algorithms are property-testable on
arbitrary generated frames (tests/test_properties.py), not only on the
registered queries' testdata.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

PARETO_PRUNE_BUCKETS = 64


def pareto_frontier_2d(
    df: DataFrame, x_col: str, y_col: str, *,
    buckets: int = PARETO_PRUNE_BUCKETS,
) -> DataFrame:
    """Rows not dominated under maximize-(x, y): no other row is >= on
    both axes and > on at least one. PRECONDITION: ``x_col`` values are
    tie-free (callers pin this; q64's distinct-spend precondition test).

    Plan: broadcast (min, max) of x -> bucket each point; per-bucket max
    y -> suffix-max over strictly-higher buckets, broadcast back: any
    point with y <= a higher bucket's max is dominated (higher bucket =>
    strictly higher x) and is dropped BEFORE the sort; exact sweep on
    the survivors (sort x DESC, keep iff y exceeds the running max).
    Dominators needed by the sweep always survive pruning (a pruned
    point's dominator transitively dominates whatever it dominated), so
    the sweep over survivors is exact while the global sort input stays
    survivor-scale.
    """
    bounds = df.agg(F.min(x_col).alias("lo"), F.max(x_col).alias("hi"))
    bucketed = df.crossJoin(F.broadcast(bounds)).withColumn(
        "__bucket",
        F.least(
            F.lit(buckets - 1),
            F.floor(
                (F.col(x_col) - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) + F.lit(1e-12))
                * buckets
            ),
        ),
    ).drop("lo", "hi")
    bucket_max = bucketed.groupBy("__bucket").agg(
        F.max(y_col).alias("__bmax")
    )
    w_above = W.orderBy(F.desc("__bucket")).rowsBetween(
        W.unboundedPreceding, -1
    )
    thr = bucket_max.select(
        "__bucket", F.max("__bmax").over(w_above).alias("__thr")
    )
    survivors = bucketed.join(F.broadcast(thr), "__bucket").filter(
        F.col("__thr").isNull() | (F.col(y_col) > F.col("__thr"))
    )
    w_sweep = W.orderBy(F.desc(x_col)).rowsBetween(W.unboundedPreceding, -1)
    return (
        survivors.withColumn("__prev_max", F.max(y_col).over(w_sweep))
        .filter(
            F.col("__prev_max").isNull()
            | (F.col(y_col) > F.col("__prev_max"))
        )
        .drop("__bucket", "__thr", "__prev_max")
    )


def merge_intervals(
    df: DataFrame, key_col: str, start_col: str, end_col: str
) -> DataFrame:
    """Merge overlapping or touching intervals per key into maximal
    islands: a new island starts iff its start STRICTLY exceeds the
    running max of all previous ends (per key, start-ordered), so
    overlapping intervals merge and touching intervals (start == a
    previous end) merge too; only a strict gap separates islands.
    Returns one row per (key, island) with ``i_start``/``i_end``.

    One shuffle keyed on ``key_col``; the running max and the island-id
    cumulative sum share that single sorted pass; no self-join.
    """
    w = W.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "__new_island",
        F.when(
            prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
        ).otherwise(0),
    ).withColumn(
        "island",
        F.sum("__new_island").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return flagged.groupBy(key_col, "island").agg(
        F.min(start_col).alias("i_start"), F.max(end_col).alias("i_end")
    )
