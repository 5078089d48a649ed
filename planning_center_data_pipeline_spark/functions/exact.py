"""Order-independent, engine-portable numeric aggregation helpers.

Floating-point sums depend on summation order, which differs between
Spark partial/final aggregation and a single-threaded oracle.  To make
results bit-exact and reproducible at ANY parallelism (32 local threads
or 1000 executors), money aggregates go through fixed-point decimal:

    double -> cast decimal(p,s)   (deterministic per-value rounding)
    -> exact decimal sum          (associative, order-independent)
    -> cast double                (deterministic)

This is also the right call at 100 TB: the result of a query must not
change when AQE picks a different partition count.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(c: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Fixed-point view of a money column."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({precision},{scale})")


def sum_money(c: Column, scale: int = 2) -> Column:
    """Exact decimal sum of a (possibly computed) decimal column,
    presented as double."""
    return F.sum(c).cast("double")


def avg_money(c: Column, scale: int = 2) -> Column:
    """Order-independent average: exact decimal sum -> double, divided by
    exact count. Matches `CAST(SUM(dec) AS DOUBLE)/COUNT(c)` in any
    ANSI engine."""
    return F.sum(c).cast("double") / F.count(c)
