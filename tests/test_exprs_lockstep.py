"""Lockstep guard for exprs.py: every paired (Column, *_SQL) helper must
produce IDENTICAL values in Spark and DuckDB over a grid of adversarial
inputs — half-ties, negatives, denormal-ish magnitudes, rates at the
2^-21 lpad-truncation boundary. This is the contract the module
docstring states; this test makes drift between the two forms fail CI
instead of failing a driver hash three rounds later."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from data_integration_tool_spark.exprs import (
    CENTS_SQL,
    HASH_CUTOFF_SQL,
    MICRO_SQL,
    cents,
    hash_cutoff,
    micro,
)

# Adversarial grid: exact half-ties in both units (where floor(x+0.5)
# and round() disagree), negative ties, values whose *1e6 product sits
# on a representability edge, and plain magnitudes.
_VALUES = [
    0.0, 1.0, -1.0, 0.5, -0.5,
    0.0000005, -0.0000005,          # micro half-tie
    0.0000015, -0.0000015,
    0.005, -0.005,                  # cents half-tie
    0.015, -0.025,
    123.456789, -123.456789,
    1e-9, -1e-9, 1e6, -1e6,
    3.141592653589793, -2.718281828459045,
    999999.9999995, 0.1 + 0.2,      # classic float artifacts
]

_RATES = [
    0.0, 0.1, 0.25, 0.5, 0.9, 0.999, 0.9999999,
    1.0 - 2.0 ** -21,               # the lpad-truncation boundary
    1.0 - 2.0 ** -22,
    1.0 - 2.0 ** -20,
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def _spark_eval(spark, col, values, colname="x"):
    df = spark.createDataFrame([(v,) for v in values], f"{colname} double")
    return [r.out for r in df.select(col.alias("out")).collect()]


def test_micro_lockstep(spark, duck):
    got_spark = _spark_eval(spark, micro(F.col("x")), _VALUES)
    got_duck = [
        duck.execute(
            f"SELECT {MICRO_SQL.format(x='CAST(? AS DOUBLE)')}", [v]
        ).fetchone()[0]
        for v in _VALUES
    ]
    assert got_spark == got_duck


def test_cents_lockstep(spark, duck):
    got_spark = _spark_eval(spark, cents(F.col("x")), _VALUES)
    got_duck = [
        duck.execute(
            f"SELECT {CENTS_SQL.format(x='CAST(? AS DOUBLE)')}", [v]
        ).fetchone()[0]
        for v in _VALUES
    ]
    assert got_spark == got_duck


def test_hash_cutoff_lockstep(spark, duck):
    got_spark = _spark_eval(spark, hash_cutoff(F.col("x")), _RATES)
    got_duck = [
        duck.execute(
            f"SELECT {HASH_CUTOFF_SQL.format(rate='CAST(? AS DOUBLE)')}", [v]
        ).fetchone()[0]
        for v in _RATES
    ]
    assert got_spark == got_duck
    # every cutoff is exactly 8 hex chars (the truncation bug class)
    assert all(len(c) == 8 for c in got_spark)
