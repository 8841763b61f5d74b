"""Bloom-filter semi-join (operators/bloom.py): no false negatives,
exact semi-join equivalence, and sane false-positive rates."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from airflow_project_flight_price_analysis_spark.operators.bloom import (
    bloom_might_contain,
    bloom_build,
    bloom_parameters,
    bloom_prune,
    bloom_semi_join,
)

KEY = st.one_of(
    st.none(), st.text(alphabet="abcdefgh0123456789", min_size=0, max_size=12)
)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(KEY, min_size=1, max_size=40),   # probe keys
    st.lists(KEY, min_size=0, max_size=25),   # build keys
)
def test_bloom_semi_join_equals_plain_semi_join(spark, probe_keys, build_keys):
    """bloom_semi_join must be EXACTLY the plain left_semi join on
    arbitrary keys — duplicates preserved, empty build handled, and
    NULL keys on either side never match (plain-join semantics)."""
    probe = spark.createDataFrame(
        [(k, i) for i, k in enumerate(probe_keys)], "k string, pid int"
    )
    build = spark.createDataFrame(
        [(k,) for k in build_keys] or [], "bk string"
    )
    got = sorted(
        (r.k, r.pid)
        for r in bloom_semi_join(
            probe, build, "k", "bk",
            expected_items=max(len(build_keys), 1), fpp=0.05,
        ).collect()
    )
    want = sorted(
        (r.k, r.pid)
        for r in probe.join(
            build.distinct(), probe.k == F.col("bk"), "left_semi"
        ).collect()
    )
    assert got == want


def test_bloom_prune_no_false_negatives_and_bounded_fp(spark):
    """Every member survives the prune (zero false negatives by
    construction); disjoint probes survive at ≈ the configured fpp
    (allow generous slack — the point is orders of magnitude)."""
    n = 2000
    members = spark.range(n).select(
        F.concat(F.lit("m"), F.col("id")).alias("bk")
    )
    hits = bloom_prune(
        members.select(F.col("bk").alias("k")), members, "k", "bk",
        expected_items=n, fpp=0.01,
    ).count()
    assert hits == n  # no false negatives

    outsiders = spark.range(n).select(
        F.concat(F.lit("z"), F.col("id")).alias("k")
    )
    fp = bloom_prune(
        outsiders, members, "k", "bk", expected_items=n, fpp=0.01
    ).count()
    assert fp <= n * 0.05, fp  # ~1% target, 5% ceiling


def test_bloom_parameters_textbook_shape():
    m, k = bloom_parameters(1000, 0.01)
    assert m % 64 == 0 and m >= 9000  # ≈ 9.6 bits/item at 1%
    assert 5 <= k <= 9                # ≈ 7 hashes at 1%
    assert bloom_parameters(0) == (64, 1)


def test_bloom_probe_side_is_mapside(spark):
    """The prune must not shuffle the probe: the only exchange feeding
    the probe branch is the broadcast of the one-row filter."""
    probe = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    build = spark.range(50).select(F.col("id").cast("string").alias("bk"))
    pruned = bloom_prune(probe, build, "k", "bk", expected_items=50)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # one-row filter broadcast
    assert "EvalPython" not in plan


def test_might_contain_is_false_for_null_keys(spark):
    """NULL keys must be FALSE (equi-join semantics). xxhash64 ignores
    a NULL child and hashes the seed alone, so without the explicit
    guard every NULL key shares one fixed position set — this pins the
    guard with a blocklist chosen to SET those seed-only bits (the
    blocklist key equals the seed-only fingerprint's own hash chain
    start: an empty-ish bitset can't mask the bug, so we assert on a
    saturated one instead)."""
    from pyspark.sql import functions as F

    from airflow_project_flight_price_analysis_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
        bloom_parameters,
    )

    # tiny m -> the handful of blocklist keys saturates most words, so
    # the seed-only position set is almost surely fully lit
    m, k = 64, 4
    build = spark.range(0, 40).select(F.col("id").cast("string").alias("k"))
    words_df = bloom_build(build, "k", num_bits=m, num_hashes=k)
    words = words_df.collect()[0]["words"]
    lit_map = F.map_from_arrays(
        F.array(*[F.lit(int(i)) for i in words]),
        F.array(*[F.lit(int(w)).cast("bigint") for w in words.values()]),
    )
    probe = spark.createDataFrame(
        [("0",), (None,), ("7",)], "k string")
    got = probe.select(
        "k",
        bloom_might_contain(lit_map, F.col("k"),
                            num_bits=m, num_hashes=k).alias("hit"),
    ).collect()
    by_key = {r.k: r.hit for r in got}
    assert by_key["0"] is True and by_key["7"] is True
    assert by_key[None] is False


def test_bloom_tolerates_user_columns_named_words(spark):
    """ADVICE r7: the filter row travels under a reserved name, so a
    probe that legitimately carries a `words` column must work."""
    probe = spark.createDataFrame(
        [("1", ["a", "b"]), ("99", ["c"])], "k string, words array<string>"
    )
    build = spark.range(50).select(F.col("id").cast("string").alias("bk"))
    got = bloom_semi_join(probe, build, "k", "bk", expected_items=50)
    rows = got.collect()
    assert [r.k for r in rows] == ["1"]
    assert rows[0].words == ["a", "b"]  # user column untouched


def test_bloom_rejects_reserved_probe_columns(spark):
    """...and a probe colliding with the reserved internal names fails
    fast with a clear error instead of an analysis-time ambiguity."""
    import pytest

    probe = spark.createDataFrame([("1", 0)], "k string, __bloom_bk int")
    build = spark.range(5).select(F.col("id").cast("string").alias("bk"))
    with pytest.raises(ValueError, match="reserved|collide"):
        bloom_semi_join(probe, build, "k", "bk", expected_items=5)
