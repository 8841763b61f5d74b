"""Slowly-changing-dimension (SCD2) upsert without a transactional table
format — SURVEY.md D5 generalized (the reference's insert-if-new dim
upsert, ``dags/tasks/transformation.py:26-43``, kept only the latest
version; SCD2 keeps history).

MERGE INTO needs Delta/Iceberg (jars absent in v1 — guide 'CDC/SCD2');
this emulates it with pure DataFrame ops:

    changed   = updates ⋈ current  WHERE any tracked attr differs
    closed    = current rows for CHANGED keys, end-dated
    new_rows  = updates (new keys + new versions), open-ended

Keys absent from the batch are left untouched (absence is not a
delete — incremental batches carry only what changed upstream); a
delete feed would arrive as explicit tombstone rows and close via its
own pass, out of scope here.

One shuffle on the business key; output = closed ∪ untouched ∪ new.
At 100 TB the dimension is partitioned by key-hash bucket and only
buckets containing changed keys rewrite (here: full rewrite, documented).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OPEN_END = "9999-12-31"


def _attrs_differ(attrs: list[str]) -> Column:
    cond = F.lit(False)
    for a in attrs:
        cond = cond | ~F.col(f"cur.{a}").eqNullSafe(F.col(f"upd.{a}"))
    return cond


def scd2_upsert(current: DataFrame, updates: DataFrame, key: str,
                attrs: list[str], effective_date: str) -> DataFrame:
    """Apply one batch of updates to an SCD2 dimension.

    ``current`` schema: key, attrs..., valid_from, valid_to (OPEN_END for
    live rows). ``updates`` schema: key, attrs... — one row per key.
    Returns the new full dimension state.

    Business keys must be NON-NULL: the change-detection full join and
    the semi/anti routing all use null-unsafe key equality, so a NULL
    key would silently re-insert forever instead of versioning (the
    ADVICE r5 anti-join bug class). Fails fast — a dimension with NULL
    business keys is a data-quality error upstream (route it through
    the DQ quarantine, streaming/quality.py), not an upsert input. The
    probe is ``limit(1)`` so it short-circuits on the first offender.
    """
    if updates.filter(F.col(key).isNull()).limit(1).count() > 0:
        raise ValueError(
            f"scd2_upsert: updates contain NULL business key {key!r}"
        )
    live = current.filter(F.col("valid_to") == OPEN_END).alias("cur")
    history = current.filter(F.col("valid_to") != OPEN_END)
    upd = updates.alias("upd")

    # inner join: change detection only needs keys present on BOTH
    # sides (new keys and absent keys route through the anti/semi
    # passes below — a full join would null-extend rows nothing reads)
    joined = live.join(upd, F.col(f"cur.{key}") == F.col(f"upd.{key}"))
    changed_keys = (
        joined.filter(_attrs_differ(attrs))
        .select(F.col(f"cur.{key}").alias(key))
    )

    # close the superseded live rows at the batch's effective date
    closed = (
        live.join(changed_keys, key, "left_semi")
        .withColumn("valid_to", F.lit(effective_date))
    )
    untouched_live = live.join(changed_keys, key, "left_anti")

    # brand-new keys + new versions of changed keys open at effective date
    existing_keys = live.select(key)
    new_keys = upd.join(existing_keys, key, "left_anti")
    new_versions = upd.join(changed_keys, key, "left_semi")
    inserts = (
        new_keys.unionByName(new_versions)
        .select(key, *attrs)
        .withColumn("valid_from", F.lit(effective_date))
        .withColumn("valid_to", F.lit(OPEN_END))
    )

    cols = [key, *attrs, "valid_from", "valid_to"]
    return (
        history.select(cols)
        .unionByName(closed.select(cols))
        .unionByName(untouched_live.select(cols))
        .unionByName(inserts.select(cols))
    )
