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

Rounding to cents happens in INTEGER space (r9 — the q83 lesson): the
r8 form did ``ROUND(recombined_double / 1e6, 2)``, and ``ROUND(double,
n)`` is the ONE op the engines disagree on — Spark rounds the shortest
decimal representation HALF_UP (307843.595 → .60) while DuckDB rounds
the binary value (307843.59499999997 → .59). Sums of 2-4-decimal money
hit exact .xx5 halves at ~1% of groups, so q83's driver gate caught it
at sf0.01. The law here never rounds a double: the group total
recombines into one WIDE integer (DECIMAL(38,0) in Spark — one decimal
op per GROUP, not per row, so the r8 perf win stands; native HUGEINT in
DuckDB — its DECIMAL ``//`` detours through doubles), and half-away-
from-zero division happens on integers: cents = sign(t) · (|t| + 5000)
intdiv 10⁴. The divided operand is always non-negative, where every
integer-division semantics (floor, truncate) coincides — so the law
holds even if either engine's ``//``/``DIV``/``%`` rounding convention
changes across versions (current DuckDB ``//`` and ``%`` truncate like
Spark's, but only the non-negative-operand invariant is relied on). The
final
``CAST(cents AS DOUBLE)/100`` maps equal integers to equal doubles at
any magnitude. Exactness bound: cents fit int64 to ±$9.2e16 per group
(a 100 TB lineitem summed into ONE group is ~$2.3e16 — 4× headroom;
the r8 double recombination was already cent-lossy past $9e9).

Engine mirroring notes (why the template has two knobs):
- integer division spells ``DIV`` in Spark SQL, ``//`` in DuckDB; the
  wide type spells ``DECIMAL(38,0)`` in Spark, ``HUGEINT`` in DuckDB;
- per-row hi/lo splits on NEGATIVE values depend on each engine's
  div/mod rounding convention, which may differ across versions (treat
  the parts as engine-local) — the divmod identity v = hi·1e6 + lo
  holds under ANY matched div/mod pair, so recombined totals are
  identical regardless;
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


def micros_val_sql(value_sql: str) -> str:
    """Per-row micro-unit value — engine-neutral (FLOOR/CAST spell the
    same in Spark SQL and DuckDB; only the integer-division split and
    the wide recombination type differ, which is why the aggregate
    helpers take the ``int_div`` knob)."""
    return f"CAST(FLOOR(({value_sql}) * 1e6 + 0.5) AS BIGINT)"


def _hi_lo_sqls(value_sql: str, int_div: str) -> tuple[str, str]:
    v = micros_val_sql(value_sql)
    return (f"SUM({v} {int_div} 1000000)", f"SUM({v} % 1000000)")


def _wide(int_div: str) -> str:
    """The engine's exact wide-integer type for the once-per-group
    recombination: Spark DECIMAL(38,0) (its DIV is exact on decimals);
    DuckDB native HUGEINT (its DECIMAL ``//`` detours through doubles,
    verified — HUGEINT ``//`` is exact)."""
    return "DECIMAL(38,0)" if int_div == "DIV" else "HUGEINT"


def _wide_total_sql(hi_sql: str, lo_sql: str, int_div: str) -> str:
    """EXACT group total in micro-units as one wide integer:
    hi·1e6 + lo. One wide op per GROUP — the per-row path stays on
    Tungsten's long fast path. NULL parts (empty/all-NULL group)
    propagate to a NULL total, matching SUM's convention."""
    w = _wide(int_div)
    return (f"(CAST(({hi_sql}) AS {w}) * 1000000"
            f" + CAST(({lo_sql}) AS {w}))")


def _cents_sql(t_sql: str, int_div: str, cnt_sql: str | None = None) -> str:
    """Half-away-from-zero cents from an exact wide micro total (and
    optionally a count, for means): sign(t) · (|t| + 5000·n) intdiv
    (10000·n). Pure integer arithmetic — the .xx5 half resolves BEFORE
    any double exists (the q83 r9 lesson: ROUND(double, 2) is the one
    op Spark and DuckDB disagree on). The divided operand is
    non-negative, where every integer-division convention (floor,
    truncate) coincides — the only cross-engine property relied on.
    NULL t (empty/all-NULL group) → NULL. Zero divisor (n = 0 on the
    mean path): t is NULL exactly when n = 0 (both mean "no non-NULL
    values in the group"), and a NULL dividend short-circuits the
    division to NULL BEFORE the zero divisor matters — verified under
    ANSI mode (Spark 4's default, where a non-NULL dividend over a
    zero divisor would RAISE; that combination is unreachable here).
    DuckDB returns NULL for integer division by zero regardless."""
    adj = "5000" if cnt_sql is None else f"(5000 * {cnt_sql})"
    den = "10000" if cnt_sql is None else f"(10000 * {cnt_sql})"
    return (f"((CASE WHEN {t_sql} < 0 THEN -1 ELSE 1 END)"
            f" * CAST((ABS({t_sql}) + {adj}) {int_div} {den} AS BIGINT))")


def _sum_micros_sql(value_sql: str, int_div: str) -> str:
    hi, lo = _hi_lo_sqls(value_sql, int_div)
    t = _wide_total_sql(hi, lo, int_div)
    return f"(CAST({_cents_sql(t, int_div)} AS DOUBLE) / 100)"


def _mean_micros_sql(value_sql: str, int_div: str) -> str:
    # denominator = COUNT of the per-row micro value, whose nullness
    # equals value_sql's (FLOOR/CAST propagate NULL) — AVG semantics:
    # NULL rows are skipped by numerator AND denominator. Dividing by
    # COUNT(*) instead would deflate the mean on nullable inputs while
    # both engines agree (the r8 ADVICE trap: gate-green but not the
    # mean the name promises). All-NULL groups: the wide total is NULL
    # and the count-scaled division hits zero — NULL in both engines,
    # same as AVG.
    cnt = f"COUNT({micros_val_sql(value_sql)})"
    hi, lo = _hi_lo_sqls(value_sql, int_div)
    t = _wide_total_sql(hi, lo, int_div)
    return f"(CAST({_cents_sql(t, int_div, cnt)} AS DOUBLE) / 100)"


def exact_mean(value_sql: str) -> Column:
    """Spark aggregate Column: order-independent mean of ``value_sql``
    (a SQL expression over the input columns), half-away-rounded to
    cents in exact integer space (the true rational mean of the
    micro-unit values — no intermediate double ever rounds). NULL
    values are skipped like AVG's (numerator and denominator both
    count only non-NULL rows; an all-NULL group yields NULL)."""
    return F.expr(_mean_micros_sql(value_sql, "DIV"))


def exact_mean_oracle(value_sql: str) -> str:
    """The DuckDB mirror of :func:`exact_mean` — the IDENTICAL
    arithmetic, so the driver's value hash pins the whole path."""
    return _mean_micros_sql(value_sql, "//")


def exact_sum(value_sql: str) -> Column:
    """Spark aggregate Column: order-independent SUM of ``value_sql``
    rounded to 2 decimals — the long-fast-path replacement for the
    DECIMAL(38,6) money sums (r7's q66-class hardening; measured on
    the q63/q67 revenue shapes at sf0.1: DECIMAL(38,6) costs
    1.39-2.61× over a plain double sum, this form 0.78-0.88×). The
    cents are computed by integer half-away division of the exact wide
    micro total (see module docstring: ROUND(double, 2) diverges
    between engines on exact .xx5 halves — q83's r9 driver red row);
    negatives are safe (the divided operand is non-negative by
    construction). Exact to ±$9.2e16 per group.

    FEW-GROUP outputs only (r9 A/B): the wide recombination runs once
    per GROUP, so when |groups| ~ |rows| (per-order, per-customer
    aggregates) it is effectively per-row — q38 measured 2.0× over a
    plain double sum that way. For many-group shapes carry
    :func:`exact_parts` through the aggregate and round late with
    ``rounded_from_parts_sql`` on the (few) surviving rows — the q38
    top-k / q63 pivot / q67 argmax discipline."""
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
#   UNROUNDED. r9 accepted ROUND on the double quotient (a ~2e-16/row
#   risk class); r10 retires even that with ratio_from_parts_sql —
#   half-away rounding of the exact RATIONAL a/b in wide-integer
#   space, so no double ever rounds anywhere in a money output path.
# - ARGMAX/THRESHOLD on the accumulator (q67/q72): equality and
#   comparison on the recombined micro totals is deterministic because
#   both engines compute bit-identical doubles (below 2^53 micros the
#   double is the exact integer; above, both round identically — but
#   see the negative-values caveat on micros_from_parts_sql).
# - TWO-LEVEL RE-FOLDS (q63/q72): when per-group sums are re-aggregated
#   (pivot cells re-fold per-customer partials; a global total re-folds
#   per-part sums), keep the (hi, lo) LONG pair through the first
#   level and SUM the parts at the second — long sums are associative
#   and exact under ANY fold order, which is precisely what the double
#   re-fold of per-group partials is not.


def exact_parts(value_sql: str) -> tuple[Column, Column]:
    """Spark aggregate Columns ``(hi, lo)`` — the split long pair.
    Alias and carry both when a second aggregation level re-folds the
    group sums; recombine at the END with the *_from_parts helpers."""
    hi, lo = _hi_lo_sqls(value_sql, "DIV")
    return F.expr(hi), F.expr(lo)


def exact_parts_oracle(value_sql: str) -> tuple[str, str]:
    """The DuckDB mirror of :func:`exact_parts` (CAST to BIGINT: DuckDB
    SUM(BIGINT) returns HUGEINT, which would leak into schema compares
    if the parts themselves were ever output). On negative inputs treat
    the raw part values as engine-local (div/mod rounding conventions
    may differ across engine versions) — identical after recombination,
    per the divmod identity under any matched div/mod pair."""
    hi, lo = _hi_lo_sqls(value_sql, "//")
    return f"CAST({hi} AS BIGINT)", f"CAST({lo} AS BIGINT)"


def micros_from_parts_sql(hi_sql: str, lo_sql: str) -> str:
    """Recombined micro total (a double) from hi/lo part sums —
    engine-neutral, the same IEEE op sequence everywhere. Use for
    ratios, argmax equality, and threshold comparisons. Caveat: on
    NEGATIVE inputs the per-engine hi/lo splits differ (see
    exact_parts_oracle), so the pre-rounding doubles are only
    guaranteed identical when |total| < 2^53 micros (±$9e9/group) OR
    the input is sign-uniform; the money-output path
    (rounded_from_parts_sql) recombines in wide integers and has no
    such bound."""
    return (f"(CAST(({hi_sql}) AS DOUBLE) * 1e6"
            f" + CAST(({lo_sql}) AS DOUBLE))")


def rounded_from_parts_sql(hi_sql: str, lo_sql: str, int_div: str) -> str:
    """Money output from hi/lo part sums: exact wide-integer
    recombination, integer half-away cents, then the cents→double map
    (equal integers → equal doubles; no double ever rounds — the q83
    law). ``int_div`` picks the engine: ``"DIV"`` Spark,
    ``"//"`` DuckDB. NULL parts (empty/all-NULL group) propagate to a
    NULL result, matching SUM's empty-group convention."""
    t = _wide_total_sql(hi_sql, lo_sql, int_div)
    return f"(CAST({_cents_sql(t, int_div)} AS DOUBLE) / 100)"


def ratio_from_parts_sql(num_hi: str, num_lo: str, den_hi: str,
                         den_lo: str, int_div: str, ndigits: int,
                         scale: int = 1) -> str:
    """ROUND(scale · num / den, ndigits) with NO double ever rounding —
    the r10 closure of the last accepted ROUND(double) risk class (the
    q66/q76 quotient halves; the sum-half class was retired in r9 by
    ``_cents_sql``). Both totals recombine from their (hi, lo) part
    sums into exact wide integers, and the quotient rounds half-away-
    from-zero on the exact RATIONAL:

        q = sign(num·den) · (2·|num|·scale·10^ndigits + |den|)
                            intdiv (2·|den|)

    — for positive A, B, ``(2A + B) intdiv 2B`` = floor((A + B/2)/B),
    i.e. ties away from zero after the sign factor, the same convention
    as the cents law. Every operand of the division is non-negative,
    where all integer-division semantics coincide (the module's one
    cross-engine invariant). ``den = 0`` → NULL via an explicit NULLIF
    on the divisor — Spark 4 runs ANSI by default, where a bare zero
    divisor under a non-NULL dividend RAISES instead of returning NULL
    (DuckDB returns NULL; NULLIF makes both engines NULL by the same
    rule). NULL parts (empty group) propagate to NULL like SUM.

    ``scale`` folds a constant multiplier into the numerator exactly
    (e.g. 100 for a percentage). Bounds: the wide numerator is
    |num_micros|·2·scale·10^ndigits ≤ ~1e23 at 100 TB money scale —
    far inside DECIMAL(38,0)/HUGEINT; the quotient must fit BIGINT,
    i.e. |ratio·10^ndigits| < 9.2e18 (shares/percentages: trivially).
    The final CAST(q AS DOUBLE)/10^ndigits maps equal integers to
    equal doubles (10^ndigits is exact in double; IEEE division is
    correctly rounded identically in both engines)."""
    tn = _wide_total_sql(num_hi, num_lo, int_div)
    td = _wide_total_sql(den_hi, den_lo, int_div)
    mult = 2 * int(scale) * 10**int(ndigits)
    sign = (f"(CASE WHEN ({tn} < 0) != ({td} < 0) THEN -1 ELSE 1 END)")
    q = (f"({sign} * CAST((ABS({tn}) * {mult} + ABS({td}))"
         f" {int_div} (2 * NULLIF(ABS({td}), 0)) AS BIGINT))")
    return f"(CAST({q} AS DOUBLE) / {10 ** int(ndigits)})"


# (exact_micros / exact_micros_oracle — one-shot wrappers fusing
# exact_parts + micros_from_parts_sql — were removed in r10 when their
# last consumer, q66's ratio, moved to ratio_from_parts_sql; compose
# the two named pieces directly, as q38/q67/q72/q83 do.)
