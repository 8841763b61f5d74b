"""Bloom-filter semi-join — an explicit, reusable runtime filter.

Spark injects runtime bloom filters into some joins on its own
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), but only where
the optimizer sees both sides of one equi-join in one plan. The cases a
curation pipeline actually hits — decontaminating a 100 TB corpus
against an eval-set fingerprint blocklist that lives in another table,
pre-filtering a stream against a ledger, pruning before a UDF-bearing
stage the optimizer won't push through — need the filter as a
first-class operator. Reference analog: none (extension surface;
SURVEY.md §2.9 'novel sketch' category).

Design (all JVM-side expressions, no UDFs):

- The filter is ONE ROW holding a ``map<int, bigint>`` of 64-bit words —
  a bitset in map form, built by exploding each build key into
  ``num_hashes`` bit positions (``pmod(xxhash64(key, seed_i), m)``), OR-
  folding masks per word (``bit_or`` aggregate — mergeable, so the build
  is one map-side-combined shuffle of at most ``m/64`` groups), and
  collapsing to a map. For m = 8M bits that is ~125k map entries ≈ 2 MB
  — broadcast-small at any corpus scale, because m is sized by the
  BUILD side (the blocklist), never the probe side.
- Membership is a map lookup per hash: ``element_at(words, word_idx) &
  mask == mask`` — evaluated map-side on the probe under the broadcast
  one-row cross join (the same scalar-statistic-attachment shape q84/x84
  use). No probe-side shuffle happens to evaluate the filter.
- ``bloom_semi_join`` composes prune + EXACT verify: survivors (true
  matches + ~fpp false positives) go through a normal ``left_semi``
  join, so the result is exactly the plain semi-join while the shuffle
  carries only survivors. With a selective blocklist the shuffled
  volume drops by ~the corpus/blocklist selectivity; the false-positive
  rate only costs extra VERIFY rows, never correctness.

Property-tested: zero false negatives by construction (every member's
bits are set), join equivalence vs the plain semi-join on arbitrary
generated data, and measured fpp ≈ theoretical on disjoint probes.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_parameters(expected_items: int, fpp: float = 0.01) -> tuple[int, int]:
    """Textbook sizing: m = -n·ln(p)/ln(2)², k = (m/n)·ln(2)."""
    if expected_items <= 0:
        return 64, 1
    m = int(-expected_items * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, (m + 63) // 64 * 64)  # whole words
    k = max(1, round(m / expected_items * math.log(2)))
    return m, k


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key.cast("string"), F.lit(i)), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def bloom_build(keys: DataFrame, key_col: str, *, num_bits: int,
                num_hashes: int) -> DataFrame:
    """One-row DataFrame ``(words: map<int,bigint>)`` — the bitset.
    NULL keys are dropped: they can never equi-join (NULL = NULL is
    unknown), and a NULL bit position would poison the map build."""
    pos = F.explode(
        F.array(*_positions(F.col(key_col), num_bits, num_hashes))
    ).alias("pos")
    words = (
        keys.filter(F.col(key_col).isNotNull()).select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"),
                F.pmod(F.col("pos"), F.lit(64)).cast("int")
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
    )
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))
        ).alias("words")
    )


def bloom_might_contain(bloom_words: Column, key: Column, *, num_bits: int,
                        num_hashes: int) -> Column:
    """Membership predicate: all ``num_hashes`` bits set (map-side).

    NULL keys are explicitly FALSE — matching equi-join semantics.
    Without the guard, ``xxhash64(NULL, seed)`` ignores the null child
    and returns the seed-only hash, so every NULL key would share ONE
    fixed position set and all NULL rows would flip to "might contain"
    the moment those bits happen to be set (guaranteed once any real
    key collides with them) — a caller using this as a standalone
    prefilter would pass every NULL row."""
    cond = F.lit(True)
    for p in _positions(key, num_bits, num_hashes):
        widx = (p / 64).cast("int")
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"),
            F.pmod(p, F.lit(64)).cast("int")
        )
        word = F.coalesce(
            F.element_at(bloom_words, widx), F.lit(0).cast("bigint")
        )
        cond = cond & (word.bitwiseAND(mask) == mask)
    return F.when(key.isNull(), F.lit(False)).otherwise(cond)


#: Internal column names the prune/semi-join plumbing introduces on the
#: probe side of a join.  A probe that already carries one of these would
#: make the filter/drop ambiguous at analysis time (ADVICE r7) — guard
#: explicitly, mirroring the ``__rk_*`` collision check in asof.py.
_RESERVED = ("__bloom_words", "__bloom_bk")


def _require_no_reserved(probe: DataFrame) -> None:
    clash = [c for c in probe.columns if c in _RESERVED]
    if clash:
        raise ValueError(
            f"probe columns {clash} collide with bloom-internal names "
            f"{_RESERVED} — rename them before bloom_prune/bloom_semi_join"
        )


def _require_same_key_type(probe: DataFrame, probe_col: str,
                           build: DataFrame, build_col: str) -> None:
    """The bloom positions hash ``key.cast('string')`` while the exact
    verify join compares natively — an int 5 probe against a double
    5.0 build would equi-join after numeric widening but hash as '5'
    vs '5.0' to different bits: a bloom FALSE NEGATIVE, breaking the
    never-a-false-negative contract. Same-type keys make string-cast
    equality coincide with join equality; enforce rather than hope."""
    pt = probe.schema[probe_col].dataType
    bt = build.schema[build_col].dataType
    if pt != bt:
        raise TypeError(
            f"bloom key type mismatch: probe[{probe_col}]: {pt} vs "
            f"build[{build_col}]: {bt} — cast one side first"
        )


def bloom_prune(probe: DataFrame, build_keys: DataFrame, probe_col: str,
                build_col: str, *, expected_items: int,
                fpp: float = 0.01) -> DataFrame:
    """Probe rows that MIGHT match the build keys (true matches + ~fpp
    false positives; never a false negative). Map-side on the probe.

    The broadcast filter row is carried under the reserved name
    ``__bloom_words`` (never a user-plausible name like ``words``), and
    probes already holding a reserved name are rejected up front."""
    _require_no_reserved(probe)
    _require_same_key_type(probe, probe_col, build_keys, build_col)
    m, k = bloom_parameters(expected_items, fpp)
    bloom = bloom_build(
        build_keys.select(F.col(build_col).alias("__bloom_bk")),
        "__bloom_bk", num_bits=m, num_hashes=k,
    ).select(F.col("words").alias("__bloom_words"))
    return (
        probe.crossJoin(F.broadcast(bloom))
        .filter(
            bloom_might_contain(
                F.col("__bloom_words"), F.col(probe_col),
                num_bits=m, num_hashes=k,
            )
        )
        .drop("__bloom_words")
    )


def bloom_semi_join(probe: DataFrame, build: DataFrame, probe_col: str,
                    build_col: str, *, expected_items: int,
                    fpp: float = 0.01) -> DataFrame:
    """Exactly ``probe.join(build, probe[probe_col] == build[build_col],
    'left_semi')`` — but the semi-join's shuffle carries only the
    bloom-surviving probe rows."""
    _require_no_reserved(probe)
    keys = build.select(F.col(build_col).alias("__bloom_bk"))
    pruned = bloom_prune(probe, keys, probe_col, "__bloom_bk",
                         expected_items=expected_items, fpp=fpp)
    return pruned.join(
        keys.distinct(), pruned[probe_col] == F.col("__bloom_bk"),
        "left_semi",
    )
