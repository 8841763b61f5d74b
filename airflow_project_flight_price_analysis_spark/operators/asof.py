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

    The matched right row is carried as ONE struct (one
    ``last(ignorenulls)`` over the whole row, not one per value column),
    so every ``asof_*`` output — including genuine NULLs inside the
    matched row — comes from the same right row, and the tolerance gate
    keys on that row's own timestamp.
    """
    if "__rts" in value_cols:
        raise ValueError("value column name '__rts' is reserved")
    # reserved-name guard (the bloom.py rule, r7 review): a left side
    # already carrying one of the internals would be silently
    # overwritten-then-dropped (or die in a confusing union error)
    clash = [c for c in left.columns
             if c in ("__ts", "__side", "__r", "__last", "__tb")]
    if clash:
        raise ValueError(
            f"left columns {clash} collide with asof_join internals — "
            "rename them first"
        )
    lt = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    )
    rt = right.select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(v) for v in value_cols],
        ).alias("__r"),
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
    # left rows union in with __r = NULL (allowMissingColumns), so
    # last(ignorenulls) skips them but keeps a matched struct whose
    # FIELDS are null — NULLs in the matched row survive intact.
    carried = unioned.withColumn(
        "__last", F.last("__r", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1)
    match_ok = F.col("__last").isNotNull()
    if tolerance_seconds is not None:
        match_ok = match_ok & (
            (
                F.col("__ts").cast("double")
                - F.col("__last").getField("__rts").cast("double")
            )
            <= tolerance_seconds
        )
    for v in value_cols:
        out = out.withColumn(
            f"asof_{v}", F.when(match_ok, F.col("__last").getField(v))
        )
    drop = ["__ts", "__side", "__r", "__last"]
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
    # key_cols may (and usually do) exist on both sides — right keys are
    # renamed to reserved __rk_* names below. Any OTHER shared name
    # (including right_ts == left_ts) would make the delta expression and
    # the output columns ambiguous, so fail fast instead of silently
    # mis-resolving.
    collide = sorted(
        (set(right.columns) - set(key_cols)) & set(left.columns)
    )
    if collide:
        raise ValueError(
            "banded_range_join: left/right share non-key column names "
            f"{collide!r}; rename the right side before joining"
        )
    # width floor 1.0 SECOND, not an epsilon: with width=1e-9 the
    # bucket ids reach epoch/1e-9 ~ 1.7e18, far beyond double's 2^53
    # integer precision, so equal offsets could land in different
    # rounding-artifact buckets and exact matches would silently drop.
    # The 2-bucket cover proof only needs width >= span, which a 1 s
    # floor preserves for any lower==upper (exact-offset) join.
    width = max(upper_seconds - lower_seconds, 1.0)
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
    # left join = matched pairs + null-extended never-matched left rows.
    # The anti join must be NULL-SAFE: with plain column-name equality a
    # matched left row holding any NULL never equals its own copy and is
    # re-emitted as a spurious null-extended row. Matched keys ride under
    # fresh __m_* aliases (no attribute-ID overlap with `left`, so no
    # ambiguous-self-join resolution) and the condition is eqNullSafe per
    # column; anti join preserves duplicate-left multiplicity, and
    # duplicate rows are value-identical so they share one match status.
    m_keys = matched.select(
        *[F.col(c).alias(f"__m_{i}") for i, c in enumerate(left.columns)]
    ).distinct()
    anti_cond = None
    for i, c in enumerate(left.columns):
        e = left[c].eqNullSafe(F.col(f"__m_{i}"))
        anti_cond = e if anti_cond is None else anti_cond & e
    unmatched = left.join(m_keys, anti_cond, "left_anti")
    return matched.unionByName(unmatched, allowMissingColumns=True)
