"""Deterministic hash-based sampling operators.

The scale-path companion to x89's exact stratified sample
(plans/mining.py): exact k-of-n selection needs a per-stratum rank
(sort); the threshold variant here needs only a per-stratum
approx-quantile of the hash — no sort, no rank window — at the cost of
±epsilon on the stratum size. Same md5 hash: a row's HASH is a pure
function of row content, independent of partitioning, cluster size,
and engine. The THRESHOLD, however, comes from merging per-partition
``percentile_approx`` sketches, and sketch merge is partition-order
sensitive — so the sample is deterministic for a fixed partitioning,
but rows within ±epsilon of the quantile boundary may flip in or out
under a different cluster layout. (x89's exact rank form in
plans/mining.py has no such boundary sensitivity.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_hash64(key: Column) -> Column:
    """Uniform-ish 60-bit non-negative hash of a key column via md5
    (15 hex chars = 60 bits; skew.py scales against 2^60 accordingly) —
    reproducible across engines and runs (unlike ``rand(seed)``, whose
    row assignment depends on partition layout)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def stratified_threshold_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fraction: float,
    accuracy: int = 10_000,
) -> DataFrame:
    """≈``fraction`` of each stratum, selected by hash threshold: per
    stratum, the threshold is the ``fraction``-quantile of the rows'
    own hash values (``percentile_approx``), and a row is kept iff its
    hash falls at or below it. Versus the exact rank form:

    - no per-stratum sort — one pass for the |strata|-row threshold
      table (mergeable KLL sketch aggregate), one map-side filtered
      pass with the thresholds broadcast back;
    - stratum sizes are approximate (quantile-sketch error), exact
      allocation is NOT guaranteed;
    - NESTED: because a row's hash is fixed, the sample at a smaller
      fraction is a subset of the sample at a larger one on the same
      data (thresholds are monotone in the fraction) — the property
      that lets a pipeline carve 1% / 5% / 10% eval sets that contain
      each other.
    """
    h = content_hash64(F.col(key_col))
    hashed = df.withColumn("__h", h)
    thr = hashed.groupBy(strata_col).agg(
        F.percentile_approx("__h", fraction, accuracy).alias("__thr")
    ).select(F.col(strata_col).alias("__strat"), "__thr")
    # null-SAFE stratum match: the groupBy keeps a NULL stratum, but a
    # name-based equi-join would null-reject every row of it — the
    # NULL stratum would silently sample at 0% instead of ~fraction
    return (
        hashed.join(F.broadcast(thr),
                    F.col(strata_col).eqNullSafe(F.col("__strat")))
        .filter(F.col("__h") <= F.col("__thr"))
        .drop("__h", "__thr", "__strat")
    )
