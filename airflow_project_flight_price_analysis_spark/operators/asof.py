"""General as-of join — the union-then-scan plan, extracted from q32
(plans/temporal.py) into a reusable operator.

For every left row, attach the value columns of the most recent right
row with the same key at-or-before (backward, inclusive) the left row's
timestamp. No join, no range explosion: both sides union into one
stream, ONE shuffle on the key, and one ordered window carries the
latest right values forward — at scale the window sort piggybacks the
shuffle's sort order. Property-tested against a brute-force per-row
reference on arbitrary generated event sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    *,
    right_tiebreak: str | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Backward inclusive as-of: left columns + ``asof_<v>`` for each
    ``v`` in ``value_cols`` (NULL when no right row precedes).

    Tie rule: a right row sharing the left row's exact timestamp IS
    seen (right sorts before left on ties — the q32 inclusive-bound
    rule). Among several right rows at one timestamp, the winner is the
    LAST under ``right_tiebreak`` (pass a unique column for determinism;
    without one, equal-timestamp right rows with differing values make
    the result sort-tie dependent).

    ``tolerance_seconds`` additionally voids matches older than the
    given horizon (like pandas ``merge_asof(tolerance=...)``).
    """
    lt = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    )
    rt = right.select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__rts"),
        *[F.col(v).alias(f"__v_{v}") for v in value_cols],
        *(
            [F.col(right_tiebreak).alias("__tb")]
            if right_tiebreak
            else []
        ),
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    order = ["__ts", "__side"] + (["__tb"] if right_tiebreak else [])
    w = (
        W.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.withColumn(
        "__last_rts", F.last("__rts", ignorenulls=True).over(w)
    )
    for v in value_cols:
        carried = carried.withColumn(
            f"asof_{v}", F.last(f"__v_{v}", ignorenulls=True).over(w)
        )
    out = carried.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        horizon = (
            F.col("__ts").cast("double")
            - F.col("__last_rts").cast("double")
        ) <= tolerance_seconds
        for v in value_cols:
            out = out.withColumn(
                f"asof_{v}",
                F.when(horizon, F.col(f"asof_{v}")),
            )
    drop = ["__ts", "__side", "__rts", "__last_rts"] + [
        f"__v_{v}" for v in value_cols
    ]
    if right_tiebreak:
        drop.append("__tb")
    return out.drop(*drop)


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    *,
    lower_seconds: float,
    upper_seconds: float,
    how: str = "inner",
) -> DataFrame:
    """Time-range join without a range explosion: pairs every left row
    with the right rows of the same key whose timestamp lies in
    ``[left_ts + lower, left_ts + upper]`` (inclusive bounds; use a
    negative ``lower_seconds`` for look-back). The q35 banding rewrite,
    generalized:

    bucket the time axis at the band width; a qualifying right row can
    only fall in one of ceil(span/width)+1 consecutive buckets relative
    to the left row's, so exploding each LEFT row to those bucket keys
    turns the inequality join into an equi-join on (key, bucket) plus a
    residual BETWEEN filter. Each qualifying pair meets in exactly one
    bucket — no post-dedup. Shuffle key is (key, bucket): pair space is
    bounded by per-bucket population, never O(n²) — the same blocking
    idea as LSH banding.
    """
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    width = max(upper_seconds - lower_seconds, 1e-9)
    n_buckets = 2  # span == width -> a right row lands in bucket(l+lower)
    #               or the one above (inclusive upper edge)
    lb = F.floor(
        (F.col(left_ts).cast("double") + lower_seconds) / F.lit(width)
    )
    l_exp = left.withColumn(
        "__bucket",
        F.explode(F.array(*[lb + i for i in range(n_buckets)])),
    )
    # right keys ride under reserved names so the equi-join never
    # collides with (or is ambiguous against) same-named left columns
    r_keyed = right.select(
        *[F.col(k).alias(f"__rk_{i}") for i, k in enumerate(key_cols)],
        *[F.col(c) for c in right.columns if c not in key_cols],
    ).withColumn(
        "__bucket", F.floor(F.col(right_ts).cast("double") / F.lit(width))
    )
    delta = F.col(right_ts).cast("double") - F.col(left_ts).cast("double")
    cond = (
        (delta >= lower_seconds)
        & (delta <= upper_seconds)
        & (l_exp["__bucket"] == r_keyed["__bucket"])
    )
    for i, k in enumerate(key_cols):
        cond = cond & (l_exp[k] == r_keyed[f"__rk_{i}"])
    matched = l_exp.join(r_keyed, cond, "inner").drop(
        "__bucket", *[f"__rk_{i}" for i in range(len(key_cols))]
    )
    if how == "inner":
        return matched
    # left join = matched pairs + null-extended never-matched left rows
    # (anti join preserves duplicate-left multiplicity exactly)
    unmatched = left.join(
        matched.select(*left.columns).distinct(), left.columns, "left_anti"
    )
    return matched.unionByName(unmatched, allowMissingColumns=True)
