"""Numeric helpers for oracle-exact aggregation.

Floating-point sums depend on addition order, which is nondeterministic
under parallel aggregation — a sum computed by Spark and by the DuckDB
oracle can differ in the last ulps and fail a value-hash compare.
These helpers sum in DECIMAL (exact, order-independent) and cast the
final value to DOUBLE, so both engines produce bit-identical results.
Inputs are dyadic doubles, which never sit exactly on a decimal
rounding midpoint at these scales, so the double→decimal cast is also
engine-independent.

The same pattern must be mirrored verbatim in the oracle SQL
(``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def dec_sum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM: decimal-exact internally, DOUBLE out."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double")
    return out.alias(alias) if alias else out


def dec_sum_expr(sql_expr: str, alias: str) -> Column:
    """Same, for a SQL expression string (pre-cast each operand inside
    the expression when it multiplies two doubles)."""
    return F.expr(f"CAST(SUM(CAST(({sql_expr}) AS {DEC})) AS DOUBLE)").alias(alias)


def safe_div(num: Column, den: Column) -> Column:
    """Deterministic average building block: one double division of two
    already-deterministic doubles (never engine-native AVG, whose
    accumulation order varies)."""
    return num / den
