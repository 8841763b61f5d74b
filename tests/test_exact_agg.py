"""functions/exact_agg.py — the split-two-long exact money aggregates.

Pins the three properties the KPI queries ride on: partition-layout
independence (the whole point vs double AVG/SUM), sign handling
(DIV/% truncate toward zero in BOTH engines), and the bit-exact DuckDB
mirror the driver gate hashes.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from airflow_project_flight_price_analysis_spark.functions.exact_agg import (
    exact_mean,
    exact_mean_oracle,
    exact_sum,
    exact_sum_oracle,
)


def _values():
    # deterministic pseudo-random money values, both signs, plus exact
    # .xx5 halves (the r7 double-rounding bug class) and magnitudes up
    # to the fare range
    vals = []
    for i in range(1, 2001):
        v = ((i * 2654435761) % 10_000_000) / 100.0 - 30_000.0
        vals.append(round(v, 4))
    vals += [0.005, -0.005, 123.455, -123.455, 0.0]
    return vals


def test_partition_layout_independence(spark):
    vals = _values()
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    results = set()
    for parts in (1, 7, 32):
        row = (
            df.repartition(parts)
            .agg(exact_sum("v").alias("s"), exact_mean("v").alias("m"))
            .first()
        )
        results.add((row.s, row.m))
    assert len(results) == 1, results


def test_duckdb_mirror_is_bit_exact(spark):
    vals = _values()
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    srow = df.agg(exact_sum("v").alias("s"), exact_mean("v").alias("m")).first()
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": vals}))
    orow = con.execute(
        f"SELECT {exact_sum_oracle('v')} AS s, {exact_mean_oracle('v')} AS m"
        " FROM t"
    ).fetchone()
    assert (srow.s, srow.m) == (orow[0], orow[1])


def test_grouped_mirror_with_negative_groups(spark):
    # per-group sums with one all-negative group: the DIV/% sign
    # conventions must agree between engines on negative totals
    rows = [("neg", -v) for v in (1.115, 2.005, 3.335)] + [
        ("pos", v) for v in (1.115, 2.005, 3.335)
    ] + [("mix", v) for v in (-10.005, 10.0, 0.005)]
    df = spark.createDataFrame(rows, "g string, v double")
    sdf = (
        df.groupBy("g").agg(exact_sum("v").alias("s"),
                            exact_mean("v").alias("m"))
        .orderBy("g").toPandas()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["g", "v"]))
    odf = con.execute(
        f"SELECT g, {exact_sum_oracle('v')} AS s, {exact_mean_oracle('v')} AS m"
        " FROM t GROUP BY g ORDER BY g"
    ).fetchdf()
    assert list(sdf["g"]) == list(odf["g"])
    assert list(sdf["s"]) == list(odf["s"])
    assert list(sdf["m"]) == list(odf["m"])


def test_null_values_follow_avg_semantics(spark):
    # r8 ADVICE: the mean must divide by the NON-NULL count (AVG
    # semantics), not COUNT(*) — a NULL row deflated the old form. The
    # sum skips NULLs; an all-NULL group yields NULL for both; and the
    # DuckDB mirror agrees bit-for-bit throughout.
    rows = [("a", 10.0), ("a", None), ("a", 20.0),
            ("b", None), ("b", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    sdf = (
        df.groupBy("g").agg(
            exact_sum("v").alias("s"), exact_mean("v").alias("m"),
            F.round(F.avg("v"), 2).alias("plain_avg"),
        ).orderBy("g").toPandas()
    )
    assert sdf.loc[0, "m"] == 15.0 == sdf.loc[0, "plain_avg"]
    assert pd.isna(sdf.loc[1, "m"]) and pd.isna(sdf.loc[1, "s"])
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["g", "v"]))
    odf = con.execute(
        f"SELECT g, {exact_sum_oracle('v')} AS s, {exact_mean_oracle('v')} AS m"
        " FROM t GROUP BY g ORDER BY g"
    ).fetchdf()
    assert list(sdf["s"].fillna(-1)) == list(odf["s"].fillna(-1))
    assert list(sdf["m"].fillna(-1)) == list(odf["m"].fillna(-1))


def test_exact_half_sums_round_identically(spark):
    # the q83 r9 driver red row: a group summing to 307843.595 —
    # Spark's ROUND(double, 2) rounds the shortest decimal repr
    # (→ .60) while DuckDB rounds the binary value (→ .59). The cents
    # law resolves the half in integer space, so both engines must
    # emit the SAME value, and it must be the half-away answer.
    halves = [("a", 307843.595), ("b", 100000.0), ("b", 207843.595),
              ("c", 0.005), ("d", -0.005), ("e", -307843.595)]
    df = spark.createDataFrame(halves, "g string, v double")
    sdf = (df.groupBy("g").agg(exact_sum("v").alias("s"))
           .orderBy("g").toPandas())
    con = duckdb.connect()
    con.register("t", pd.DataFrame(halves, columns=["g", "v"]))
    odf = con.execute(
        f"SELECT g, {exact_sum_oracle('v')} AS s FROM t GROUP BY g ORDER BY g"
    ).fetchdf()
    assert list(sdf["s"]) == list(odf["s"])
    assert list(sdf["s"]) == [307843.6, 307843.6, 0.01, -0.01, -307843.6]


def test_values_match_plain_aggregates_away_from_boundaries(spark):
    # sanity: on values without sub-cent precision the exact forms equal
    # the plain double aggregates rounded to 2 dp
    vals = [round(((i * 37) % 1000) / 4.0, 2) for i in range(1, 500)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    row = (
        df.agg(
            exact_sum("v").alias("s"),
            exact_mean("v").alias("m"),
            F.round(F.sum("v"), 2).alias("ps"),
            F.round(F.avg("v"), 2).alias("pm"),
        ).first()
    )
    assert row.s == row.ps and row.m == row.pm
