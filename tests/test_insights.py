"""Plan-shape and precondition tests for the round-5 insights queries
(x78-x87, q57-q62). Correctness-vs-oracle runs in
test_queries_vs_oracle.py; these pin the physical plans and the data
preconditions the oracles rely on."""

from __future__ import annotations

import pytest

from airflow_project_flight_price_analysis_spark.plans import all_queries
from airflow_project_flight_price_analysis_spark.sources import load_table
from tests.conftest import SF_ORACLE, SF_SMALL

_Q = all_queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_ORACLE])
def test_pagerank_precondition_no_dangling_nodes(spark, sf_dir):
    """x78's oracle recursion preserves the node set only if every event
    type occurs as BOTH transition source and target (no dangling mass,
    no inbound-less node). If a testdata regeneration breaks this, fail
    HERE with the name of the assumption, not in a hash mismatch."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
    )
    n_types = ev.select("event_type").distinct().count()
    n_from = pairs.select("event_type").distinct().count()
    n_to = pairs.select("to_type").distinct().count()
    assert n_from == n_types and n_to == n_types, (
        f"event transition graph at {sf_dir} has dangling/inbound-less "
        f"types (types={n_types}, as-source={n_from}, as-target={n_to}); "
        "x78_event_pagerank and its oracle assume neither exists — add "
        "dangling-mass redistribution to BOTH before trusting the hash."
    )


def test_pagerank_mass_conserved(spark):
    """Damped power iteration preserves total mass: ranks sum to 1."""
    total = sum(
        r.rank for r in _Q["x78_event_pagerank"](spark, SF_SMALL).collect()
    )
    assert abs(total - 1.0) < 1e-4, total


def test_pagerank_iterations_stay_node_scale(spark):
    """Every one of the K iterations must consume the PERSISTED |types|²
    transition table (InMemoryTableScan), never re-run the event-scale
    window+aggregate — iteration cost independent of event count. (The
    executedPlan string still prints the raw scan inside each
    InMemoryRelation's cached-plan dump, so count cache READS, not
    parquet mentions.)"""
    from airflow_project_flight_price_analysis_spark.plans.insights import (
        PAGERANK_ITERS,
    )

    plan = _plan(_Q["x78_event_pagerank"](spark, SF_SMALL))
    n_cache_reads = plan.count("InMemoryTableScan")
    assert n_cache_reads >= PAGERANK_ITERS, (
        f"iterations are not consuming the persisted transition table: "
        f"{n_cache_reads} cache reads for {PAGERANK_ITERS} iterations"
    )
    assert "CartesianProduct" not in plan


def test_mad_medians_are_exact_and_broadcast_joined(spark):
    """x79 uses EXACT grouped medians (the operator's contract vs x12's
    approx path) and re-joins the |sources|-row stats broadcast-side —
    the documents side must never shuffle for the join."""
    plan = _plan(_Q["x79_mad_outliers"](spark, SF_SMALL))
    # F.median compiles to exact percentile(col, 0.5, ...) in the
    # physical plan; the approx sketch would print approx_percentile
    assert "percentile(" in plan, plan
    assert "approx_percentile" not in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_zipf_head_is_take_ordered(spark):
    """The top-K term head must execute as TakeOrdered, never a global
    sort of the vocab table."""
    plan = _plan(_Q["x80_zipf_slope"](spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan, plan


def test_lang_confusion_is_single_pass_expression_only(spark):
    """x81 scores languages map-side with zero Python and aggregates
    once — no joins at all in the plan."""
    plan = _plan(_Q["x81_lang_confusion"](spark, SF_SMALL))
    assert "EvalPython" not in plan
    assert "Join" not in plan, plan


def test_bigram_surprisal_no_python_and_bounded_broadcasts(spark):
    """x82's scoring join is pair-keyed (shuffle-shuffle is fine); the
    context and vocab tables ride as broadcasts; Python never runs."""
    plan = _plan(_Q["x82_bigram_surprisal"](spark, SF_SMALL))
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_locf_window_and_rollup_share_one_exchange(spark):
    """q58's window partition key (user_id) is also the rollup grouping
    key, so the plan needs exactly one event-scale hash exchange."""
    plan = _plan(_Q["q58_locf_ignore_nulls"](spark, SF_ORACLE))
    n = plan.count("hashpartitioning(user_id")
    assert n == 1, f"expected one user_id exchange, found {n}:\n{plan}"


def test_recursive_spine_month_coverage(spark):
    """q57's recursion must emit every month between the order-date
    bounds exactly once — including empty months as zero rows."""
    from pyspark.sql import functions as F

    rows = _Q["q57_recursive_month_spine"](spark, SF_SMALL).collect()
    months = [r.month for r in rows]
    assert months == sorted(set(months)), "duplicate or unsorted months"
    orders = load_table(spark, SF_SMALL, "orders")
    lo, hi = orders.agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM"),
    ).first()
    assert months[0] == lo and months[-1] == hi
    lo_y, lo_m = map(int, lo.split("-"))
    hi_y, hi_m = map(int, hi.split("-"))
    assert len(months) == (hi_y - lo_y) * 12 + (hi_m - lo_m) + 1


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_ORACLE])
def test_triangle_graph_is_nondegenerate(spark, sf_dir):
    """x83's mean+0.5σ threshold must leave a graph that actually has
    triangles at every test SF (the raw co-supply graph is complete at
    small SF — an untested threshold could silently prune to empty and
    make the oracle comparison vacuous)."""
    row = _Q["x83_triangle_count"](spark, sf_dir).collect()[0]
    assert row.n_edges > 0 and row.n_triangles > 0, row
    assert 0.0 <= row.transitivity <= 1.0, row


def test_triangle_orientation_matches_naive_count(spark):
    """The degree-oriented wedge join must count exactly the triangles
    the naive s1<s2<s3 ordered join counts (the oracle does the naive
    form; this pins the equivalence INSIDE Spark so an orientation bug
    can't hide behind a coincidentally-equal oracle)."""
    from pyspark.sql import functions as F

    from airflow_project_flight_price_analysis_spark.plans.insights import (
        x83_triangle_count,
    )

    got = x83_triangle_count(spark, SF_SMALL).collect()[0].n_triangles

    ps = (
        load_table(spark, SF_SMALL, "lineitem")
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    a, b = ps.alias("a"), ps.alias("b")
    pairs = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("s1"), F.col("b.s").alias("s2"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    thr = pairs.agg(
        (F.avg("shared") + 0.5 * F.stddev_pop("shared")).alias("t")
    ).collect()[0].t
    e = pairs.filter(F.col("shared") >= thr).select("s1", "s2")
    x, y, z = e.alias("x"), e.alias("y"), e.alias("z")
    naive = (
        x.join(y, F.col("x.s2") == F.col("y.s1"))
        .join(z, (F.col("z.s1") == F.col("x.s1")) & (F.col("z.s2") == F.col("y.s2")))
        .count()
    )
    assert got == naive, (got, naive)


def test_quantile_binning_is_broadcast_only(spark):
    """x84 assigns bins via a one-row broadcast of the bounds — the
    document side must never shuffle before the final ≤|bins|² agg
    (no SortMergeJoin; the cross join is a broadcast nested loop)."""
    plan = _plan(_Q["x84_quantile_binning"](spark, SF_SMALL))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_quantile_binning_depth_bins_are_balanced(spark):
    """Equi-depth deciles must be population-balanced: every bin within
    ±20% of n/10 at driver scale (ties can skew small bins — the point
    of the check is no empty and no runaway bin)."""
    from pyspark.sql import functions as F

    rows = (
        _Q["x84_quantile_binning"](spark, SF_ORACLE)
        .groupBy("bin_depth").agg(F.sum("n_docs").alias("n")).collect()
    )
    per = {r.bin_depth: r.n for r in rows}
    total = sum(per.values())
    assert set(per) == set(range(1, 11)), per
    for b, n in per.items():
        assert abs(n - total / 10) <= total * 0.02, (b, n, total)


def test_target_encoding_shrinks_toward_global_mean(spark):
    """Smoothing must land every encoding strictly between the raw
    segment mean and the global mean (the empirical-Bayes contract),
    and the LOO envelope must bracket the raw mean."""
    rows = _Q["x85_target_encoding"](spark, SF_ORACLE).collect()
    g = sum(r.raw_mean * r.n_orders for r in rows) / sum(r.n_orders for r in rows)
    for r in rows:
        lo, hi = sorted((r.raw_mean, g))
        assert lo - 1e-6 <= r.smoothed <= hi + 1e-6, (r, g)
        assert r.loo_min <= r.raw_mean <= r.loo_max, r


def test_ks_grid_is_value_scale_not_row_scale(spark):
    """x86's ECDF grid must be |distinct lengths| × |sources| rows —
    the KS evaluation never fans out to row scale."""
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_ORACLE, "documents")
    n_vals = docs.select("n_chars").distinct().count()
    n_src = docs.select("source").distinct().count()
    out = _Q["x86_ks_drift"](spark, SF_ORACLE)
    rows = out.collect()
    assert len(rows) == n_src
    for r in rows:
        assert 0.0 <= r.ks <= 1.0, r
    assert sum(r.n_docs for r in rows) == docs.count()
    # The scale claim is structural, not numeric-at-this-SF: the grid
    # is |distinct lengths| × |sources| cells — bounded by the VALUE
    # DOMAIN, so it stays fixed while rows grow 1000×. At sf0.001 the
    # distinct count (~313) is near the row count (500), so a numeric
    # grid<rows assertion is meaningless here (an earlier form
    # multiplied both sides by n_src and was vacuous). The structural
    # guarantee lives in the plan: no pairwise doc×doc join — the only
    # joins carry the per-source totals (broadcast) onto the grid.
    plan = _Q["x86_ks_drift"](spark, SF_ORACLE) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_hill_estimator_sane_and_take_ordered(spark):
    """α̂ must be positive and finite, the head a TakeOrdered (x80's
    rule), and the implied Zipf slope negative."""
    df = _Q["x87_hill_tail_index"](spark, SF_SMALL)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    row = df.collect()[0]
    assert row.alpha > 0, row
    assert row.implied_zipf_slope < 0, row
    assert row.k > 0 and row.x_k >= 1, row


def test_try_arithmetic_exercises_both_null_paths(spark):
    """q61 is only meaningful if BOTH error paths fire at test scale:
    some divisions hit the zero denominator and some casts fail."""
    from pyspark.sql import functions as F

    rows = _Q["q61_try_arithmetic"](spark, SF_SMALL).collect()
    assert sum(r.n_div_zero for r in rows) > 0, rows
    li = load_table(spark, SF_SMALL, "lineitem")
    n = li.count()
    assert sum(r.n_numeric for r in rows) < n  # some casts DID fail
    assert sum(r.n_numeric for r in rows) > 0  # and some succeeded


def test_map_algebra_roundtrip_and_filter(spark):
    """q62's exploded rows must carry only n_orders ≥ 2 (map_filter
    contract) while n_priorities still counts the UNfiltered map."""
    from pyspark.sql import functions as F

    df = _Q["q62_map_algebra"](spark, SF_SMALL)
    bad = df.filter(F.col("n_orders") < 2).count()
    assert bad == 0
    r = df.filter(
        F.size(F.split("all_pri", ",")) < F.col("n_priorities")
    ).count()
    assert r == 0  # all_pri renders every key of the unfiltered map


def test_width_bucket_matches_oracle_floor_formula(spark):
    """The x84 oracle mirrors Spark's width_bucket with explicit
    CASE + floor((x-lo)/((hi-lo)/n))+1 arithmetic (DuckDB has no
    width_bucket). Pin the equivalence inside Spark over a dense value
    sweep and several (lo, hi) configurations — if Spark ever changes
    its bucket arithmetic, fail HERE with the exact values, not in a
    driver hash mismatch."""
    from pyspark.sql import functions as F

    df = spark.range(0, 2000).select(
        (F.col("id") - 500).cast("double").alias("x")
    )
    for lo, hi, n in [(48, 553, 10), (0, 1000, 7), (-250, 750, 13)]:
        got = df.select(
            "x",
            F.expr(f"width_bucket(x, {lo}, {hi}, {n})").alias("wb"),
            F.when(F.col("x") >= hi, F.lit(n + 1))
            .when(F.col("x") < lo, F.lit(0))
            .otherwise(
                F.floor((F.col("x") - lo) / ((hi - lo) / float(n))) + 1
            ).cast("long").alias("mirror"),
        )
        bad = got.filter(F.col("wb") != F.col("mirror")).collect()
        assert not bad, (lo, hi, n, bad[:5])
