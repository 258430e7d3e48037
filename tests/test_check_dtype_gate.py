"""The dtype-parity gate in scripts/check.py must catch the oracle
class behind every driver red since r4: DuckDB HUGEINT aggregates
surfacing as float64 in fetchdf() while Spark emits int64 — values
identical, hashes different."""

import importlib.util
import os

import duckdb
import pytest


@pytest.fixture(scope="module")
def checkmod():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "check.py",
    )
    spec = importlib.util.spec_from_file_location("checkmod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_uncast_hugeint_sum_is_flagged(spark, checkmod):
    con = duckdb.connect()
    # DuckDB promotes sum(BIGINT) to HUGEINT; fetchdf() -> float64
    duck = con.execute(
        "SELECT sum(x) AS n FROM (SELECT unnest([1, 2, 3]::BIGINT[]) AS x)"
    ).fetchdf()
    assert duck["n"].dtype.kind == "f"  # the failure precondition
    sdf = spark.createDataFrame([(6,)], "n long")
    bad = checkmod.dtype_mismatches(sdf, duck)
    assert bad and bad[0].startswith("n:")


def test_cast_bigint_sum_passes(spark, checkmod):
    con = duckdb.connect()
    duck = con.execute(
        "SELECT sum(x)::BIGINT AS n FROM (SELECT unnest([1, 2, 3]::BIGINT[]) AS x)"
    ).fetchdf()
    sdf = spark.createDataFrame([(6,)], "n long")
    assert checkmod.dtype_mismatches(sdf, duck) == []


def test_null_promoted_int_column_is_exempt(spark, checkmod):
    # pandas represents a nullable int column as float64 with NaN —
    # the driver sees the same promotion on the Spark side, so this
    # is NOT a parity failure
    con = duckdb.connect()
    duck = con.execute(
        "SELECT unnest([1, NULL]::BIGINT[]) AS n"
    ).fetchdf()
    assert duck["n"].dtype.kind == "f" and duck["n"].isna().any()
    sdf = spark.createDataFrame([(1,), (None,)], "n long")
    assert checkmod.dtype_mismatches(sdf, duck) == []


def test_spark_float_vs_duck_int_is_flagged(spark, checkmod):
    con = duckdb.connect()
    duck = con.execute("SELECT 1::BIGINT AS v").fetchdf()
    sdf = spark.createDataFrame([(1.0,)], "v double")
    bad = checkmod.dtype_mismatches(sdf, duck)
    assert bad and "float vs duck int" in bad[0]
