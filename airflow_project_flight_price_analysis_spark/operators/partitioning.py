"""Physical-layout levers for 100 TB scale: bucketed co-located joins and
salt-based skew mitigation.

The reference runs single-process pandas and has no notion of data layout
(SURVEY.md §4); these operators are the Spark-native mechanisms that make
its workloads survive a 1000-executor cluster:

- **Bucketing** (`bucketize`, `bucketed_join`): persist both sides of a
  recurring large-large join (lineitem ⋈ orders — the engine's one
  genuine shuffle, plans/kpi.py) pre-hash-partitioned on the join key.
  Catalyst then plans a SortMergeJoin with **zero Exchange** on either
  side — the shuffle is paid once at write time and amortized over every
  subsequent query. Verified by test_partitioning (asserts no
  shuffle-Exchange in the joined plan).

- **Salting** (`salted_agg`, `salted_join`): a skewed key (one airline
  with 40% of bookings; one hot route) makes one reducer the straggler.
  `salted_agg` does the classic two-phase aggregate: partial per
  (key, salt) → final per key; legal for any algebraic aggregate
  (sum/count/min/max — avg decomposes into sum+count). `salted_join`
  spreads a skewed fact key across `n_salts` reducers and replicates the
  (small) build side per salt — the manual form of what AQE skew-join
  does adaptively (session.py enables AQE; this exists for plans AQE
  can't fix, e.g. a skewed *aggregation* key or a non-AQE environment).

Salts are deterministic (hash of a unique column, not ``rand()``), so
re-runs and retried tasks produce identical partitions — nondeterministic
salting breaks task-retry idempotency under Spark's recompute-on-failure
model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def bucketize(df: DataFrame, table_name: str, key: str, num_buckets: int = 8,
              sort: bool = True) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    At 100 TB: bucket count is chosen so each bucket file lands in the
    128-256 MB range per partition; the sort makes the later SMJ skip its
    sort entirely (both sides pre-sorted within buckets).
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table_name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key_left: str, key_right: str) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys — planned
    as an Exchange-free SortMergeJoin."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[key_left] == right[key_right])


def _salt(col: Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) from a (unique-ish) column."""
    return F.pmod(F.xxhash64(col), F.lit(n_salts)).cast("int")


def salted_agg(df: DataFrame, group_key: str, salt_source: str,
               aggs: dict[str, str], n_salts: int = 16) -> DataFrame:
    """Two-phase skew-proof aggregation: partial aggregate per
    (group_key, salt), then final per group_key.

    ``aggs`` maps output column → one of sum/count/min/max (the algebraic
    aggregates that re-combine losslessly; count re-combines via sum).
    """
    partial_exprs, final_exprs = [], []
    for out, kind in aggs.items():
        if kind == "count":
            partial_exprs.append(F.count("*").alias(out))
            final_exprs.append(F.sum(out).alias(out))
        elif kind in ("sum", "min", "max"):
            fn = getattr(F, kind)
            partial_exprs.append(fn(out).alias(out))
            final_exprs.append(fn(out).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {kind!r}")
    return (
        df.withColumn("__salt", _salt(F.col(salt_source), n_salts))
        .groupBy(group_key, "__salt")
        .agg(*partial_exprs)
        .groupBy(group_key)
        .agg(*final_exprs)
    )


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                salt_source: str, n_salts: int = 16) -> DataFrame:
    """Skew-proof equi-join: the fact side gets a deterministic salt, the
    dim side is replicated once per salt value (explode of a literal
    range — dim must be the small side), and the join key becomes
    (key, salt) so a hot key spreads over ``n_salts`` reducers."""
    salted_fact = fact.withColumn("__salt", _salt(F.col(salt_source), n_salts))
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_fact.join(replicated_dim, [key, "__salt"]).drop("__salt")
