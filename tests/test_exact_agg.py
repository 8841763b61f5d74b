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
    exact_parts,
    exact_parts_oracle,
    exact_sum,
    exact_sum_oracle,
    micros_from_parts_sql,
    ratio_from_parts_sql,
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


def test_ratio_law_rounds_exact_rational_halves_identically(spark):
    # r10: the integer-RATIO law (q66/q76). Groups engineered so the
    # exact rational num/den lands on a .xxxxx5 half at 6 digits —
    # ROUND(double quotient) could legitimately disagree between
    # engines there; the wide-integer half-away division must agree
    # AND produce the half-away answer. Also: zero denominator → NULL,
    # sign combinations, and the scale=100 percentage knob.
    rows = [
        # num/den = 1/8 = 0.125 → at 2 digits an exact .5 half → 0.13
        ("half", 1.0, 8.0),
        ("neg_num", -1.0, 8.0),      # -0.125 → -0.13 (away from zero)
        ("neg_den", 1.0, -8.0),      # -0.125 → -0.13
        ("both_neg", -1.0, -8.0),    # +0.125 → 0.13
        ("zero_den", 5.0, 0.0),      # NULL
        ("zero_num", 0.0, 7.0),      # 0.0
        ("plain", 355.0, 113.0),     # pi-ish, no half: 3.14 at 2 dp
    ]
    df = spark.createDataFrame(rows, "g string, a double, b double")
    ahi, alo = exact_parts("a")
    bhi, blo = exact_parts("b")
    agg = df.groupBy("g").agg(ahi.alias("ahi"), alo.alias("alo"),
                              bhi.alias("bhi"), blo.alias("blo"))
    sdf = agg.select(
        "g",
        F.expr(ratio_from_parts_sql("ahi", "alo", "bhi", "blo",
                                    "DIV", 2)).alias("r"),
        F.expr(ratio_from_parts_sql("ahi", "alo", "bhi", "blo",
                                    "DIV", 2, scale=100)).alias("pct"),
    ).orderBy("g").toPandas()
    oahi, oalo = exact_parts_oracle("a")
    obhi, oblo = exact_parts_oracle("b")
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["g", "a", "b"]))
    odf = con.execute(f"""
        WITH parts AS (
            SELECT g, {oahi} AS ahi, {oalo} AS alo,
                      {obhi} AS bhi, {oblo} AS blo
            FROM t GROUP BY g
        )
        SELECT g,
               {ratio_from_parts_sql('ahi', 'alo', 'bhi', 'blo',
                                     '//', 2)} AS r,
               {ratio_from_parts_sql('ahi', 'alo', 'bhi', 'blo',
                                     '//', 2, scale=100)} AS pct
        FROM parts ORDER BY g
    """).fetchdf()
    assert list(sdf["g"]) == list(odf["g"])
    assert list(sdf["r"].fillna(-999)) == list(odf["r"].fillna(-999))
    assert list(sdf["pct"].fillna(-999)) == list(odf["pct"].fillna(-999))
    got = dict(zip(sdf["g"], sdf["r"]))
    assert got["half"] == 0.13
    assert got["neg_num"] == -0.13 and got["neg_den"] == -0.13
    assert got["both_neg"] == 0.13
    assert pd.isna(got["zero_den"])
    assert got["zero_num"] == 0.0
    assert got["plain"] == 3.14
    assert dict(zip(sdf["g"], sdf["pct"]))["half"] == 12.5


def test_micros_rank_bound_holds_for_rank_on_micros_sites(spark):
    # r9 verdict item 6: q38/q83 RANK on micros_from_parts_sql, whose
    # cross-engine identity is only guaranteed below 2^53 micros per
    # group on mixed-sign input. Pin (a) the recombined double IS the
    # exact integer below the bound, and (b) the static bound itself:
    # a per-order/per-customer total would need to exceed ~$9.007e9 to
    # cross it — assert the documented constant so a future reuse of
    # the pattern on bigger groups trips this test's comment trail.
    bound_micros = 2 ** 53
    assert bound_micros / 1e6 > 9.0e9  # dollars per group before risk
    vals = [(1, 9_006_999_999.99), (1, 0.01),  # just under the bound
            (2, 123.455), (2, -123.455)]       # mixed signs, small
    df = spark.createDataFrame(vals, "g long, v double")
    hi, lo = exact_parts("v")
    sdf = (df.groupBy("g")
           .agg(hi.alias("hi"), lo.alias("lo"))
           .select("g", F.expr(micros_from_parts_sql("hi", "lo"))
                   .alias("mu"))
           .orderBy("g").toPandas())
    # group 1: total 9.007e9 dollars = 9.007e15 micros < 2^53 — the
    # double equals the exact integer
    assert sdf.loc[0, "mu"] == 9_007_000_000_000_000.0
    assert float(sdf.loc[0, "mu"]).is_integer()
    assert abs(sdf.loc[0, "mu"]) < bound_micros
    # group 2: cancellation on mixed signs recombines to exactly zero
    assert sdf.loc[1, "mu"] == 0.0


def test_ratio_law_matches_exact_fraction_arithmetic(spark):
    # property check against an INDEPENDENT exact implementation:
    # Python Fraction half-away rounding of the true rational
    # micros(a)/micros(b) must equal what BOTH engines emit, over a
    # deterministic sweep of money-grain numerators/denominators
    # (including negatives and magnitudes that exercise the wide
    # recombination). One batched job per engine.
    import math
    from fractions import Fraction

    nd, scale = 4, 100
    rows = []
    for i in range(1, 120):
        a = round((((i * 48271) % 20011) - 10000) / 100.0, 2)
        b = round((((i * 16807) % 9973) + 1) / 7.0, 4)
        if i % 7 == 0:
            b = -b
        rows.append((i, a, b))

    def micros(v: float) -> int:
        return int(math.floor(v * 1e6 + 0.5))  # the law's own per-row op

    def expected(a: float, b: float) -> float:
        num, den = micros(a) * scale, micros(b)
        if den == 0:
            return None
        q = Fraction(num, den) * 10**nd
        # half-away from zero on the exact rational
        whole = int(q)
        frac = abs(q - whole)
        r = whole + (1 if q >= 0 else -1) * (1 if frac >= Fraction(1, 2) else 0)
        return r / 10**nd

    want = {g: expected(a, b) for g, a, b in rows}

    # one row per group → the per-group parts ARE the per-row micros
    df = spark.createDataFrame(rows, "g long, a double, b double")
    ahi, alo = exact_parts("a")
    bhi, blo = exact_parts("b")
    sdf = (df.groupBy("g")
           .agg(ahi.alias("ahi"), alo.alias("alo"),
                bhi.alias("bhi"), blo.alias("blo"))
           .select("g", F.expr(ratio_from_parts_sql(
               "ahi", "alo", "bhi", "blo", "DIV", nd, scale=scale))
               .alias("r"))
           .collect())
    got_spark = {r.g: r.r for r in sdf}
    oahi, oalo = exact_parts_oracle("a")
    obhi, oblo = exact_parts_oracle("b")
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["g", "a", "b"]))
    got_duck = dict(con.execute(f"""
        WITH parts AS (
            SELECT g, {oahi} AS ahi, {oalo} AS alo,
                      {obhi} AS bhi, {oblo} AS blo
            FROM t GROUP BY g
        )
        SELECT g, {ratio_from_parts_sql('ahi', 'alo', 'bhi', 'blo',
                                        '//', nd, scale=scale)}
        FROM parts
    """).fetchall())
    assert got_spark == want
    assert got_duck == want


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
