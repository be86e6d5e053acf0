"""Exact, order-insensitive aggregation helpers.

Floating-point sums are order-dependent, and Spark and DuckDB will
visit rows in different orders — so a differential-correctness gate
on raw double sums is flaky by construction. The fix used across this
engine: per-row arithmetic stays in DOUBLE (bit-identical in any IEEE
engine given the same expression tree), the per-row result is cast to
DECIMAL (round-to-nearest recovers the exact low-decimal true value),
the SUM runs over exact decimals (order-insensitive), and the output
is the decimal cast back to double, rounded. At 100 TB the same trick
keeps partial (map-side) aggregation exact across any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2, out_scale: int = 2) -> Column:
    """Exact sum: cast each row to decimal(18, scale), sum, round IN
    DECIMAL (half-up, exact in both engines), then emit double.

    Rounding before the double cast is what makes the output
    bit-identical across engines: ROUND(double, n) implementations
    drift by 1 ULP between Spark and DuckDB, but ROUND(decimal, n)
    is exact in both and decimal->double is the same IEEE
    round-to-nearest everywhere.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(f"decimal(18,{scale})")), out_scale).cast("double")


def davg(col: Column | str, scale: int = 2, out_scale: int = 6) -> Column:
    """Exact-numerator average: decimal sum / count (both bit-identical
    across engines), then the portable :func:`dround`."""
    c = F.col(col) if isinstance(col, str) else col
    num = F.sum(c.cast(f"decimal(18,{scale})")).cast("double")
    return dround(num / F.count(c), out_scale)


def sql_dsum(expr: str, scale: int = 2, out_scale: int = 2) -> str:
    """DuckDB twin of :func:`dsum` (same decimal-exact semantics)."""
    return (f"CAST(ROUND(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))),"
            f" {out_scale}) AS DOUBLE)")


def sql_isum(expr: str) -> str:
    """Portable integer SUM for oracle SQL — CONVENTION: every
    integer-typed SUM (plain or windowed) an oracle EMITS must go
    through this (or an equivalent explicit CAST).

    DuckDB's SUM over INTEGER/BIGINT returns HUGEINT (int128), which
    pandas — the driver's canonicalizer — converts to float64, so the
    hashed repr becomes '3.0' while Spark's bigint prints '3'. This
    was the two-round q_event_sessionize hash failure. Sums that stay
    internal to a CTE (compared, never emitted) don't need the cast.
    """
    return f"CAST(SUM({expr}) AS BIGINT)"


def dratio(num: str, den: str, scale: int = 6) -> Column:
    """Round-half-up(num/den, scale) as a double, computed entirely in
    integer arithmetic so the result is bit-identical across engines:
    ppm = (2*10^scale*num + den) div (2*den), emitted as ppm / 10^scale.

    ROUND(num::double/den, scale) is NOT portable — the pre-round
    double is bit-identical, but the two engines' double-ROUND can
    land one ULP apart. Integer div is exact in both.

    Preconditions: num >= 0, den > 0, both integral (counts/sums of
    counts); num/den referenced BY NAME (use after an agg that
    aliased them). Overflow bound: 2*10^scale*num must fit a bigint —
    at scale 6 that is num < 4.6e12, far above any group count.
    """
    m = 10 ** scale
    return F.expr(f"({2 * m} * {num} + {den}) div (2 * {den})") / F.lit(m)


def sql_dratio(num: str, den: str, scale: int = 6) -> str:
    """DuckDB twin of :func:`dratio`. DuckDB's integer // truncates
    toward zero (like Spark's div), not floor — either way the
    num >= 0 / den > 0 precondition makes truncation, floor, and
    Spark's div all agree, which is what the portability rests on."""
    m = 10 ** scale
    return (f"CAST(({2 * m} * ({num}) + ({den})) // (2 * ({den})) AS BIGINT)"
            f" / {m}")


def dround(col: Column, scale: int = 6) -> Column:
    """Portable round-to-scale for DOUBLE expressions:
    floor(x * 10^scale + 0.5) / 10^scale — every step is a plain IEEE
    operation plus exact floor, so the result is bit-identical in any
    engine given the same input double.

    Engine-native ROUND(double, n) is NOT portable: Spark rounds the
    shortest decimal repr (BigDecimal HALF_UP) while DuckDB rounds
    x*10^n arithmetically, and they disagree whenever the repr ties at
    digit n+1 — the exact class behind round-1's hash mismatches.
    Overflow bound: |x|*10^scale must stay under 2^53 (x < 9e9 at
    scale 6) — all rounded outputs here are ratios/norms/roots far
    below that.
    """
    m = float(10 ** scale)
    return F.floor(col * F.lit(m) + F.lit(0.5)) / F.lit(10 ** scale)


def sql_dround(expr: str, scale: int = 6) -> str:
    """DuckDB twin of :func:`dround`."""
    m = 10 ** scale
    return (f"CAST(FLOOR(({expr}) * {m}.0 + 0.5) AS BIGINT) / {m}")


def sql_davg(expr: str, scale: int = 2, out_scale: int = 6) -> str:
    """DuckDB twin of :func:`davg`."""
    ratio = (f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"
             f" / COUNT({expr})")
    return sql_dround(ratio, out_scale)
