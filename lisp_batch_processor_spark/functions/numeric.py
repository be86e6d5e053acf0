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
    """Exact sum: cast each row to decimal(18, scale), sum, emit double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(f"decimal(18,{scale})")).cast("double"), out_scale)


def davg(col: Column | str, scale: int = 2, out_scale: int = 6) -> Column:
    """Exact-numerator average: decimal sum / count, emitted as double."""
    c = F.col(col) if isinstance(col, str) else col
    num = F.sum(c.cast(f"decimal(18,{scale})")).cast("double")
    return F.round(num / F.count(c), out_scale)


def sql_dsum(expr: str, scale: int = 2, out_scale: int = 2) -> str:
    """DuckDB twin of :func:`dsum` (same decimal-exact semantics)."""
    return f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE), {out_scale})"


def sql_davg(expr: str, scale: int = 2, out_scale: int = 6) -> str:
    """DuckDB twin of :func:`davg`."""
    return (f"ROUND(CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"
            f" / COUNT({expr}), {out_scale})")
