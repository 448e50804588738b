"""Exact (order-independent, cross-engine-stable) numeric aggregation.

Floating-point SUM/AVG are order-dependent, and Spark's partial
aggregation visits rows in a different order than any oracle engine —
so ``sum(double)`` can never be value-hash-compared. The engine's
convention, validated empirically against DuckDB at sf0.1:

1. Cast raw measure columns to ``DECIMAL(12,2)`` *first*. The driver's
   measures are clean 2-decimal values, so the double sits within
   ~1e-11 of the decimal and every engine's double->decimal cast lands
   on the same number (no boundary cases).
2. Do arithmetic in the decimal domain. Decimal +,*,- are exact and
   associative in both Spark and DuckDB (scales add on multiply:
   (12,2)x(13,2) -> scale 4, x(13,2) -> scale 6; precision stays
   under 38 so no engine-specific rounding rule ever fires).
3. Aggregate, then make ONE cast to DOUBLE at the sum's natural scale.
   Spark's decimal->double cast is correctly rounded at any magnitude;
   DuckDB's native cast double-rounds once the scaled integer passes
   2^53, so the oracle fragments convert via VARCHAR (exact decimal
   text -> double is correctly rounded there too) — bit-identical
   doubles at ANY volume, verified at the 100x blowup scale where the
   naive oracle cast diverges by 1 ulp (see ``o_dsum``).

Never rescale decimals downward (e.g. DECIMAL(38,6) -> (38,2)): Spark
rounds ties HALF_UP while DuckDB truncates them, so exact .xx50 ties
diverge.

Associativity also means results are identical across any partitioning:
local[32] and a 1000-executor cluster hash the same.

Averages: ``CAST(SUM(dec) AS DOUBLE) / COUNT(*)`` — one IEEE division
of identical operands.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC2 = "decimal(12,2)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dec2(col: Column | str) -> Column:
    """A clean 2-decimal measure column, lifted into the decimal domain."""
    return _c(col).cast(DEC2)


def dsum(expr: Column | str) -> Column:
    """Order-independent sum of a decimal-domain expression, as DOUBLE.

    Pass raw column names/Columns for plain measures (lifted via
    ``dec2``) or an already-decimal arithmetic expression (e.g.
    ``dec2("l_extendedprice") * (1 - dec2("l_discount"))``).
    """
    e = _c(expr)
    if isinstance(expr, str):
        e = dec2(e)
    return F.sum(e).cast("double")


def davg(expr: Column | str) -> Column:
    """Order-independent average: exact decimal sum / count, in double."""
    e = dec2(expr) if isinstance(expr, str) else _c(expr)
    return F.sum(e).cast("double") / F.count(F.lit(1))


# ------------------------------------------------ DuckDB oracle fragments

def o_dec2(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(12,2))"


def o_dsum(expr: str) -> str:
    """Oracle twin of ``dsum``; pass a decimal-domain SQL expression
    (wrap raw columns with ``o_dec2``).

    The double conversion goes THROUGH VARCHAR: DuckDB's native
    ``CAST(decimal AS DOUBLE)`` converts the int128 unscaled value to
    double and then divides by 10^scale — two roundings — while
    Spark's ``Decimal.toDouble`` is correctly rounded. Exact decimal
    text -> double is correctly rounded in DuckDB too, so the string
    hop makes both engines emit THE SAME double even when the sum's
    scaled integer exceeds 2^53 (first observed at the 100x blowup
    probe: sum_charge = 282529058707.179600 exactly in both engines'
    decimal domain, but 1 ulp apart after DuckDB's native cast).
    Below 2^53 both paths are exact, so driver-scale values are
    unchanged. STRING, not VARCHAR: several queries execute their
    oracle text on Spark too (subqueries.py), and Spark only accepts
    the bare type name as STRING — an alias both engines parse, with
    correctly-rounded text->double in both."""
    return f"CAST(CAST(SUM({expr}) AS STRING) AS DOUBLE)"


def o_davg(expr: str) -> str:
    return f"{o_dsum(expr)} / COUNT(*)"


def o_sorted_list(expr: str) -> str:
    """Sorted, NULL-free DuckDB list aggregate feeding ``o_pct``."""
    return f"list({expr} ORDER BY {expr}) FILTER (WHERE {expr} IS NOT NULL)"


def o_pct(lst: str, p: float) -> str:
    """Oracle twin of Spark's exact ``percentile(col, p)`` over a
    sorted list column (build it with ``o_sorted_list``).

    DuckDB's ``quantile_cont`` ALWAYS forms the two-product
    interpolation (ceil(pos)-pos)*lo + (pos-floor(pos))*hi, even when
    the two bracketing order statistics are the same value — and with
    coefficients like 0.29/0.71 those two roundings can land 1 ulp off
    the value itself. Spark's ``percentile`` walks (value, count)
    pairs, so equal bracketing order stats hit one count bucket and
    return the VALUE with no arithmetic. First observed at the 10x
    blowup corpus (events_winsorize p99: 198,630 click rows, both
    order stats 230.53, quantile_cont = 230.53000000000003); sf0.01 /
    sf0.1 never tripped it because divergence needs lo == hi AND an
    unluckily-rounding coefficient pair at that exact group size.
    This fragment replicates Spark bit-for-bit at any volume: the
    equality branch returns the element, the interpolation branch is
    the identical two-product form (position p*(n-1), coefficient
    subtractions exact by Sterbenz, same IEEE products and sum in
    both engines — verified on synthesized lo != hi ulp-edge cases).
    Median-only sites (p = 0.5) are provably safe without this: 0.5*x
    is an exponent shift, so both branches are exact.
    """
    # CAST the fraction: DuckDB types a bare 0.99 literal as
    # DECIMAL(3,2), which would make pos/coefficients exact-decimal
    # instead of Spark's IEEE-double 0.99*(n-1) (caught by agg_quantiles
    # p99 at sf0.01: decimal coefficients 0.27/0.73 vs Spark's
    # 0.27000000000043656/0.72999999999956344)
    pos = f"CAST({p!r} AS DOUBLE)*(len({lst})-1)"
    lo = f"{lst}[1 + CAST(floor({pos}) AS BIGINT)]"
    hi = f"{lst}[1 + CAST(ceil({pos}) AS BIGINT)]"
    return (
        f"(CASE WHEN {lo} = {hi} THEN {lo} "
        f"ELSE (ceil({pos}) - {pos}) * {lo} + ({pos} - floor({pos})) * {hi} END)"
    )
