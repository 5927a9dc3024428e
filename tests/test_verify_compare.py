"""The in-package differential harness's compare() — the same contract
the driver's hash gate applies — pinned on its edge cases, pandas-only
(no Spark session needed)."""

from __future__ import annotations

import math

import pandas as pd

from distributed_computing_projects_spark.verify import compare


def test_equal_frames_pass_regardless_of_order():
    a = pd.DataFrame({"k": [2, 1], "v": [20, 10]})
    b = pd.DataFrame({"v": [10, 20], "k": [1, 2]})
    assert compare("q", a, b) == []


def test_row_count_mismatch_flagged():
    a = pd.DataFrame({"k": [1, 2]})
    b = pd.DataFrame({"k": [1]})
    assert any("row count" in p for p in compare("q", a, b))


def test_column_set_mismatch_short_circuits():
    a = pd.DataFrame({"k": [1]})
    b = pd.DataFrame({"j": [1]})
    probs = compare("q", a, b)
    assert len(probs) == 1 and "columns differ" in probs[0]


def test_int_vs_float_dtype_kind_flagged():
    """DuckDB sum(int) comes back HUGEINT->float64; silently coercing
    both sides to float would hide the driver hash-gate failure."""
    a = pd.DataFrame({"s": pd.Series([1, 2], dtype="int64")})
    b = pd.DataFrame({"s": pd.Series([1.0, 2.0], dtype="float64")})
    assert any("dtype kind differs" in p for p in compare("q", a, b))


def test_value_difference_reports_examples():
    a = pd.DataFrame({"v": [1, 2, 3]})
    b = pd.DataFrame({"v": [1, 2, 4]})
    probs = compare("q", a, b)
    assert any("values differ" in p for p in probs)


def test_nan_equals_nan():
    a = pd.DataFrame({"v": [1.0, math.nan]})
    b = pd.DataFrame({"v": [math.nan, 1.0]})
    assert compare("q", a, b) == []
