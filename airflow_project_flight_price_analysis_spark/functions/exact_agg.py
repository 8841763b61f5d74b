"""Order-independent exact aggregation on the cheap long-sum codepath.

The problem (the q66/q83 bug class): AVG/SUM over raw doubles folds in
partition order, so Spark's partial aggregates and DuckDB's sequential
fold can differ by an ulp and flip a ROUND at a .xx5 boundary — the
driver's cross-engine hash gate then reads a correct plan as red. Round
7 fixed this with a DECIMAL accumulator, which is exact and
order-independent but leaves Tungsten's long-sum fast path: the
per-row double→BigDecimal conversion cost 1.8–2.3× on the flagship KPI
means (r7 VERDICT A/B, reproduced this round: decimal 1.15–1.9× vs
AVG; this scheme 0.95–1.09× — at the double-AVG floor).

The fix: accumulate in INTEGER micro-units, split across two longs.

    v  = FLOOR(value * 1e6 + 0.5)        -- micro-units, exact long
    hi = v DIV 1e6  (whole units)        -- SUM(hi) ≤ 1.2e5 · rows
    lo = v  %  1e6  (fractional part)    -- SUM(lo) <  1e6 · rows
    mean = (SUM(hi)·1e6 + SUM(lo)) / 1e6 / COUNT(*)

Every per-row op is a codegen'd long/double primitive (no BigDecimal),
integer sums are order-independent and exact, and the recombination is
the same IEEE double-op sequence in both engines. The SPLIT is what
makes it 100 TB-safe: a single micro-unit accumulator overflows int64
at ~8e7 rows per group (a 3-group seasonality query crosses that around
sf 20 — silently, since non-ANSI long sums wrap), while the split bounds
are ~7.7e13 rows/group on the hi word and ~9.2e12 on the lo word —
15×+ headroom over a 100 TB lineitem landing in ONE group.

Precision: the mean of per-row-half-up-rounded micro-units differs from
the true mean by < 5e-7, far inside the ROUND(·, 2) grain — and both
engines evaluate the IDENTICAL expression, which is what the gate pins.

Engine mirroring notes (why the template has one knob):
- integer division spells ``DIV`` in Spark SQL, ``//`` in DuckDB;
- Spark's FLOOR(double) already returns BIGINT and DuckDB's returns
  DOUBLE — the explicit CAST is a no-op in Spark and required in
  DuckDB (exact: |v| ≤ 1.2e11 ≪ 2^53);
- ``value * 1e6 + 0.5``: double ops in both engines (0.5 is dyadic, the
  decimal→double promotion is exact); FLOOR(x + 0.5) is half-up — both
  engines agree by construction instead of by library rounding law.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _micros_total_sql(value_sql: str, int_div: str) -> str:
    """Exact micro-unit total recombined in double: ``SUM(hi)·1e6 +
    SUM(lo)`` — per-row ``v = FLOOR(value·1e6 + 0.5)`` (half-up; for
    negative values FLOOR(x+0.5) rounds toward +inf — a DEFINED law,
    mirrored bit-for-bit, which is the actual contract), split with
    truncate-toward-zero DIV/% so ``v = hi·1e6 + lo`` holds exactly for
    either sign. The double recombination is the same IEEE op sequence
    in both engines; above 2^53 it rounds, identically."""
    v = f"CAST(FLOOR(({value_sql}) * 1e6 + 0.5) AS BIGINT)"
    return (
        f"(CAST(SUM({v} {int_div} 1000000) AS DOUBLE) * 1e6"
        f" + CAST(SUM({v} % 1000000) AS DOUBLE))"
    )


def _mean_micros_sql(value_sql: str, int_div: str) -> str:
    # denominator = COUNT of the per-row micro value, whose nullness
    # equals value_sql's (FLOOR/CAST propagate NULL) — AVG semantics:
    # NULL rows are skipped by numerator AND denominator. Dividing by
    # COUNT(*) instead would deflate the mean on nullable inputs while
    # both engines agree (the r8 ADVICE trap: gate-green but not the
    # mean the name promises). All-NULL groups: SUM is NULL, so the
    # expression is NULL — same as AVG.
    v = f"CAST(FLOOR(({value_sql}) * 1e6 + 0.5) AS BIGINT)"
    return (
        f"ROUND({_micros_total_sql(value_sql, int_div)}"
        f" / 1e6 / COUNT({v}), 2)"
    )


def _sum_micros_sql(value_sql: str, int_div: str) -> str:
    return f"ROUND({_micros_total_sql(value_sql, int_div)} / 1e6, 2)"


def exact_mean(value_sql: str) -> Column:
    """Spark aggregate Column: order-independent mean of ``value_sql``
    (a SQL expression over the input columns), rounded to 2 decimals.
    NULL values are skipped like AVG's (numerator and denominator both
    count only non-NULL rows; an all-NULL group yields NULL)."""
    return F.expr(_mean_micros_sql(value_sql, "DIV"))


def exact_mean_oracle(value_sql: str) -> str:
    """The DuckDB mirror of :func:`exact_mean` — the IDENTICAL
    arithmetic, so the driver's value hash pins the whole path."""
    return _mean_micros_sql(value_sql, "//")


def exact_sum(value_sql: str) -> Column:
    """Spark aggregate Column: order-independent SUM of ``value_sql``
    rounded to 2 decimals — the long-fast-path replacement for the
    DECIMAL(38,6) money sums (r7's q66-class hardening). Measured on
    the q63/q67 revenue shapes at sf0.1: DECIMAL(38,6) costs
    1.39-2.61× over a plain double sum; this form measures 0.78-0.88×
    (long sums beat double sums) with bit-identical rounded output.
    Unlike the decimal path there is no decimal→double double-rounding
    hazard: both engines round the SAME recombined double. Negative
    values are safe (see _micros_total_sql; DuckDB's ``//``/``%``
    truncate toward zero exactly like Spark's ``DIV``/``%`` — verified
    on negatives). Wired into queries in r9 (each conversion takes a
    tier-1 recertification slot; this round's budget is reserved for
    the stale-cohort rotation)."""
    return F.expr(_sum_micros_sql(value_sql, "DIV"))


def exact_sum_oracle(value_sql: str) -> str:
    """The DuckDB mirror of :func:`exact_sum`."""
    return _sum_micros_sql(value_sql, "//")


# --- composable pieces (r9): ratios, argmax, and two-level re-folds ---------
#
# exact_sum/exact_mean cover the plain "one aggregate, rounded output"
# shape. Three relational shapes need the raw accumulator instead:
#
# - RATIOS (q66/q76): ROUND(total_a / total_b, n) needs both totals
#   UNROUNDED — take the recombined micro totals; the 1e6 scale cancels
#   and both engines divide the identical pair of doubles.
# - ARGMAX/THRESHOLD on the accumulator (q67/q72): equality and
#   comparison on the recombined micro totals is deterministic because
#   both engines compute bit-identical doubles (below 2^53 micros the
#   double is the exact integer; above, both round identically).
# - TWO-LEVEL RE-FOLDS (q63/q72): when per-group sums are re-aggregated
#   (pivot cells re-fold per-customer partials; a global total re-folds
#   per-part sums), keep the (hi, lo) LONG pair through the first
#   level and SUM the parts at the second — long sums are associative
#   and exact under ANY fold order, which is precisely what the double
#   re-fold of per-group partials is not.


def micros_val_sql(value_sql: str) -> str:
    """Per-row micro-unit value — engine-neutral (FLOOR/CAST spell the
    same in Spark SQL and DuckDB; only the integer-division split
    differs, which is why the hi/lo helpers take the knob)."""
    return f"CAST(FLOOR(({value_sql}) * 1e6 + 0.5) AS BIGINT)"


def _hi_lo_sqls(value_sql: str, int_div: str) -> tuple[str, str]:
    v = micros_val_sql(value_sql)
    return (f"SUM({v} {int_div} 1000000)", f"SUM({v} % 1000000)")


def exact_parts(value_sql: str) -> tuple[Column, Column]:
    """Spark aggregate Columns ``(hi, lo)`` — the split long pair.
    Alias and carry both when a second aggregation level re-folds the
    group sums; recombine at the END with the *_from_parts helpers."""
    hi, lo = _hi_lo_sqls(value_sql, "DIV")
    return F.expr(hi), F.expr(lo)


def exact_parts_oracle(value_sql: str) -> tuple[str, str]:
    """The DuckDB mirror of :func:`exact_parts` (CAST to BIGINT: DuckDB
    SUM(BIGINT) returns HUGEINT, which would leak into schema compares
    if the parts themselves were ever output)."""
    hi, lo = _hi_lo_sqls(value_sql, "//")
    return f"CAST({hi} AS BIGINT)", f"CAST({lo} AS BIGINT)"


def micros_from_parts_sql(hi_sql: str, lo_sql: str) -> str:
    """Recombined micro total (a double) from hi/lo part sums —
    engine-neutral, the same IEEE op sequence everywhere. Use for
    ratios, argmax equality, and threshold comparisons."""
    return (f"(CAST(({hi_sql}) AS DOUBLE) * 1e6"
            f" + CAST(({lo_sql}) AS DOUBLE))")


def rounded_from_parts_sql(hi_sql: str, lo_sql: str,
                           ndigits: int = 2) -> str:
    """Money output from hi/lo part sums: recombine, descale, ROUND —
    engine-neutral (both engines round the identical double). NULL
    parts (empty/all-NULL group) propagate to a NULL result, matching
    SUM's empty-group convention."""
    return (f"ROUND({micros_from_parts_sql(hi_sql, lo_sql)}"
            f" / 1e6, {int(ndigits)})")


def exact_micros(value_sql: str) -> Column:
    """Spark aggregate Column: the recombined micro total as a double —
    the UNROUNDED accumulator for ratio/argmax shapes."""
    return F.expr(_micros_total_sql(value_sql, "DIV"))


def exact_micros_oracle(value_sql: str) -> str:
    """The DuckDB mirror of :func:`exact_micros`."""
    return _micros_total_sql(value_sql, "//")
