"""Distributed order-statistics ranking without a single-partition sort.

``distributed_rank`` assigns the exact 1-based rank of each row within
its group under a total order — the operation a per-group ``Window``
computes with ONE sort task per group, which serializes on the biggest
group at 100 TB (a 5-segment Gini over 10^9 customers would run 5 sort
tasks). Here the sort parallelism is the number of RANGE partitions
instead:

1. ``repartitionByRange(group_cols + order_cols)`` — rows land in
   range-contiguous shuffle partitions, each group's rows split across
   a RUN of consecutive partitions;
2. a window over (group, partition-id) ranks LOCALLY — the partition-id
   key caps every sort at one shuffle partition's rows (the exchange it
   introduces is pid-keyed and fully parallel, never a single reducer);
3. per-(group, partition-id) counts cumulate over the tiny
   |partitions|-scale frame and broadcast back as offsets;
4. rank = local rank + offset of the preceding partitions of the same
   group.

The result is identical to the per-group window rank for ANY range
boundary choice (boundaries only shift which offset each local rank
adds), so the operator is deterministic even though
``repartitionByRange`` samples its boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def distributed_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    rank_col: str = "rank",
) -> DataFrame:
    """Exact per-group ``row_number`` under (order_cols) with sort
    parallelism = range partitions, not groups. ``order_cols`` must be
    a total order within each group (include a unique tie-breaker)."""
    ranged = df.repartitionByRange(*group_cols, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = W.partitionBy(*group_cols, "__pid").orderBy(*order_cols)
    local = ranged.withColumn("__lrank", F.row_number().over(w_local))
    counts = local.groupBy(*group_cols, "__pid").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    w_off = (
        W.partitionBy(*group_cols)
        .orderBy("__pid")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
    ).select(*group_cols, "__pid", "__off")
    return (
        local.join(F.broadcast(offsets), [*group_cols, "__pid"])
        .withColumn(rank_col, (F.col("__lrank") + F.col("__off")).cast("long"))
        .drop("__pid", "__lrank", "__off")
    )


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group under (order_cols) — the row_number ≤ k
    form Spark's planner prunes with ``WindowGroupLimit``: each task
    keeps a k-row heap per group BEFORE the window sort, so the shuffle
    carries at most k rows per (group, partition) instead of the whole
    group (the q56 LATERAL-decorrelation plan, as a library call).
    Pass ``F.desc(...)`` columns in ``order_cols`` for largest-first;
    include a unique tie-breaker for determinism.
    """
    w = W.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
