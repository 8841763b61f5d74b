"""Plan-shape and precondition tests for the round-5 insights queries
(x78-x82, q57-q60). Correctness-vs-oracle runs in
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
