"""Property-based tests (hypothesis): invariants of the expression library
over arbitrary inputs — the dirty-input spec of FIXTURES.md §1 generalized
from examples to properties. Each example batches many generated values
into ONE Spark job (a createDataFrame + collect), keeping runtime sane.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from airflow_project_flight_price_analysis_spark.functions.cleaning import (
    parse_stopovers_expr,
    row_hash_expr,
)
from airflow_project_flight_price_analysis_spark.functions.text import (
    quality_metrics,
    shingles_expr,
    tokens_expr,
)

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
)
SLOW = settings(max_examples=8, deadline=None)


@SLOW
@given(st.lists(TEXT, min_size=1, max_size=40))
def test_parse_stopovers_total_and_nonnegative(spark, values):
    """The parser never errors and always yields a non-negative int —
    the 'garbage → 0' contract (FIXTURES.md §1 stopovers row)."""
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    out = df.select(parse_stopovers_expr("s").alias("n")).collect()
    assert all(r.n is not None and r.n >= 0 for r in out)


@SLOW
@given(st.lists(st.tuples(TEXT, TEXT), min_size=2, max_size=30, unique=True))
def test_row_hash_injective_on_sample(spark, rows):
    """Distinct value tuples get distinct hashes; equal tuples equal
    hashes (determinism) — the dedup-correctness property the reference
    assumes but never tests (ingestion.py:69)."""
    df = spark.createDataFrame(rows, ["a", "b"])
    out = df.select("a", "b", row_hash_expr(["a", "b"]).alias("h"))
    got = out.collect()
    by_tuple = {}
    for r in got:
        by_tuple.setdefault((r.a, r.b), set()).add(r.h)
    # determinism: one hash per tuple
    assert all(len(hs) == 1 for hs in by_tuple.values())
    # injectivity on the sample: distinct tuples → distinct hashes
    all_hashes = [next(iter(hs)) for hs in by_tuple.values()]
    assert len(set(all_hashes)) == len(by_tuple)


@SLOW
@given(st.lists(TEXT, min_size=1, max_size=30))
def test_quality_ratios_bounded(spark, values):
    df = spark.createDataFrame([(v,) for v in values], ["text"])
    m = quality_metrics(F.col("text"))
    out = df.select(
        m["punct_ratio"].alias("p"), m["stopword_ratio"].alias("s")
    ).collect()
    for r in out:
        assert 0.0 <= r.p <= 1.0
        assert 0.0 <= r.s <= 1.0


@SLOW
@given(st.lists(TEXT, min_size=1, max_size=30), st.integers(2, 4))
def test_shingle_count_formula(spark, values, n):
    """len(shingles) == max(0, len(tokens) - n + 1) for every input."""
    df = spark.createDataFrame([(v,) for v in values], ["text"])
    out = (
        df.select(tokens_expr(F.col("text")).alias("toks"))
        .select(
            F.size("toks").alias("nt"),
            F.size(shingles_expr(F.col("toks"), n)).alias("ns"),
        )
        .collect()
    )
    for r in out:
        assert r.ns == max(0, r.nt - n + 1)
