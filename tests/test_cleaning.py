"""Dirty-data matrix (FIXTURES.md §5) — each case pins one defensive
behavior whose spec is the reference's code."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from airflow_project_flight_price_analysis_spark.functions.cleaning import (
    coerce_money_expr,
    is_weekend_expr,
    parse_stopovers_expr,
    row_hash_expr,
    surrogate_key_expr,
    weekday_expr,
)


def test_stopovers_variants(spark):
    # transformation.py:14-24
    cases = ["Direct", "non-stop", "NON-STOP ", "1 Stop", "3 stops",
             "lots of stops", "", None]
    expected = [0, 0, 0, 1, 3, 0, 0, 0]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = [r[0] for r in df.select(parse_stopovers_expr("s")).collect()]
    assert got == expected


def test_numeric_coercion(spark):
    # transformation.py:65-69 — coerce→0, round half-up (engine-pinned)
    cases = ["abc", "", None, "-5", "12.345"]
    expected = [0.0, 0.0, 0.0, -5.0, 12.35]  # Spark round = half-up
    df = spark.createDataFrame([(c,) for c in cases], "m string")
    got = [r[0] for r in df.select(coerce_money_expr("m")).collect()]
    assert got == expected


def test_weekday_monday_zero(spark):
    # transformation.py:97-98 — pandas dt.dayofweek semantics (Mon=0)
    df = spark.createDataFrame(
        [("2026-08-10",), ("2026-08-14",), ("2026-08-15",), ("2026-08-16",)],
        "d string",
    ).select(F.to_date("d").alias("d"))
    rows = df.select(weekday_expr("d").alias("w"),
                     is_weekend_expr("d").alias("we")).collect()
    assert [(r.w, r.we) for r in rows] == [
        (0, False), (4, False), (5, True), (6, True)
    ]


def test_row_hash_null_vs_empty(spark):
    # NULL and '' must hash differently (sentinel), and hashing is
    # deterministic across rows with equal content
    df = spark.createDataFrame(
        [Row(a=None, b="x"), Row(a="", b="x"), Row(a="", b="x")]
    )
    h = df.select(row_hash_expr(["a", "b"]).alias("h")).collect()
    assert h[0].h != h[1].h
    assert h[1].h == h[2].h


def test_surrogate_key_stable_and_distinct(spark):
    df = spark.createDataFrame(
        [("AirAlpha",), ("AirBeta",), ("AirAlpha",)], "name string"
    )
    keys = df.select(surrogate_key_expr("name").alias("k")).collect()
    assert keys[0].k == keys[2].k
    assert keys[0].k != keys[1].k


def test_title_parity_matches_python_str_title(spark):
    """title_parity_expr must equal pandas/Python ``str.title()`` exactly
    (SURVEY P5 divergence, closed): any non-letter is a boundary."""
    from airflow_project_flight_price_analysis_spark.functions.cleaning import (
        title_parity_expr,
    )

    samples = [
        "cox's bazar",          # the documented divergence case
        "o'hare int'l",
        "ABC-DEF ghi",
        "  new york-jfk  ",
        "abc1def 2gh",
        "émirats arabes-unis",
        "a",
        "",
        "123 456",
        "don't stop-believin'",
        "x" * 300,
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    out = {r.s: r.t for r in
           df.select("s", title_parity_expr("s").alias("t")).collect()}
    for s in samples:
        assert out[s] == s.title(), (s, out[s], s.title())


def test_title_parity_null_propagates(spark):
    from airflow_project_flight_price_analysis_spark.functions.cleaning import (
        title_parity_expr,
    )

    df = spark.createDataFrame([(None,)], "s string")
    assert df.select(title_parity_expr("s").alias("t")).collect()[0].t is None


def test_title_parity_stays_jvm_side(spark):
    """No BatchEvalPython — the parity path must not cost a Python hop."""
    from airflow_project_flight_price_analysis_spark.functions.cleaning import (
        title_parity_expr,
    )

    df = spark.createDataFrame([("x y",)], "s string") \
        .select(title_parity_expr("s").alias("t"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stopovers_int_overflow_is_zero_not_null(spark):
    """Documented contract: garbage → 0. A digit run that overflows int
    used to come back NULL through try_cast."""
    from pyspark.sql import functions as F

    from airflow_project_flight_price_analysis_spark.functions.cleaning import (
        parse_stopovers_expr,
    )

    df = spark.createDataFrame(
        [("99999999999 stops",), ("2 stops",), ("Direct",)], "s string")
    got = [r[0] for r in
           df.select(parse_stopovers_expr(F.col("s"))).collect()]
    assert got == [0, 2, 0]


def test_pii_email_redaction_is_case_insensitive(spark):
    from pyspark.sql import functions as F

    from airflow_project_flight_price_analysis_spark.functions.text import (
        pii_redact_expr,
    )

    df = spark.createDataFrame(
        [("Contact John.Doe@Corp.COM today",)], "text string")
    out = df.select(pii_redact_expr("text").alias("t")).collect()[0].t
    assert "Corp.COM" not in out and "<EMAIL>" in out


def test_row_hash_null_vs_sentinel_literal(spark):
    """v3 (r7 review): a genuine value equal to the old NULL sentinel
    must NOT hash like NULL — the n/v tag lives outside the value
    alphabet, so no value can imitate NULL."""
    from airflow_project_flight_price_analysis_spark.functions.cleaning import (
        NULL_SENTINEL,
        ROW_HASH_VERSION,
    )

    assert ROW_HASH_VERSION == 3
    df = spark.createDataFrame(
        [(NULL_SENTINEL, "x"), (None, "x")], "a string, b string"
    )
    hashes = [r.h for r in
              df.select(row_hash_expr(["a", "b"]).alias("h")).collect()]
    assert hashes[0] != hashes[1]
