"""Validation rules + schema evolution (reference spec:
tests/test_phase4_features.py:136-274, pystore/validation.py,
pystore/schema_evolution.py)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

import pystore_spark.schema_evolution as se
from pystore_spark.exceptions import SchemaError, ValidationError
from pystore_spark.validation import (
    ColumnExistsRule,
    DataValidator,
    ExpressionRule,
    MonotonicIndexRule,
    NoNullRule,
    RangeRule,
    UniqueRule,
    create_financial_validator,
    create_timeseries_validator,
    with_validation,
)


@pytest.fixture()
def ohlcv():
    idx = pd.date_range("2024-01-01", periods=10, freq="D")
    base = pd.Series(range(10), index=idx, dtype="float64") + 100
    return pd.DataFrame(
        {
            "open": base,
            "high": base + 2,
            "low": base - 2,
            "close": base + 1,
            "volume": pd.Series([1000] * 10, index=idx, dtype="int64"),
        }
    )


def test_validator_single_agg_job_spark(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 500.0)], ["id", "v"]
    )
    v = DataValidator()
    v.add_rule(NoNullRule(["v"]))
    v.add_rule(RangeRule("v", 0, 100))
    v.add_rule(UniqueRule(["id"]))
    assert not v.validate(df, raise_on_error=False)
    with pytest.raises(ValidationError, match="null"):
        v.validate(df)


def test_validator_pandas_path(ohlcv):
    v = create_financial_validator()
    assert v.validate(ohlcv)
    bad = ohlcv.copy()
    bad.loc[bad.index[0], "high"] = 0.0  # violates OHLC invariant
    assert not v.validate(bad, raise_on_error=False)


def test_timeseries_validator(ohlcv):
    v = create_timeseries_validator(["open", "close"])
    assert v.validate(ohlcv)
    shuffled = ohlcv.sample(frac=1.0, random_state=1)
    assert not v.validate(shuffled, raise_on_error=False)


def test_expression_rule_spark(spark):
    df = spark.createDataFrame([(1.0, 2.0), (5.0, 3.0)], ["lo", "hi"])
    v = DataValidator().add_rule(
        ExpressionRule(F.col("hi") >= F.col("lo"), name="hi_ge_lo")
    )
    assert not v.validate(df, raise_on_error=False)


def test_with_validation_decorator(ohlcv):
    v = create_financial_validator()
    calls = []

    @with_validation(v)
    def write(df):
        calls.append(len(df))

    write(ohlcv)
    assert calls == [10]
    bad = ohlcv.copy()
    bad.loc[bad.index[0], "volume"] = -5
    with pytest.raises(ValidationError):
        write(bad)


def test_column_exists_rule(spark):
    df = spark.createDataFrame([(1,)], ["a"])
    v = DataValidator().add_rule(ColumnExistsRule(["a", "b"]))
    assert not v.validate(df, raise_on_error=False)


def test_write_with_validator(test_collection, ohlcv):
    v = create_financial_validator()
    test_collection.write("ok", ohlcv, validator=v)
    bad = ohlcv.copy()
    bad.loc[bad.index[0], "low"] = 1e9
    with pytest.raises(ValidationError):
        test_collection.write("bad", bad, validator=v)
    assert not test_collection.item_exists("bad")


# ---------------------------------------------------------------------------
# schema evolution
# ---------------------------------------------------------------------------
def test_schema_diff(spark):
    old = se.Schema.from_spark(spark.createDataFrame([(1, 1.0)], ["a", "b"]))
    new = se.Schema.from_spark(
        spark.createDataFrame([(1, "x", True)], ["a", "b", "c"])
    )
    kinds = {c.change_type for c in old.detect_changes(new)}
    assert kinds == {"column_added", "type_changed"}


def test_validate_evolution_policies(spark):
    old = se.Schema.from_spark(spark.createDataFrame([(1,)], ["a"]))
    added = se.Schema.from_spark(spark.createDataFrame([(1, 2.0)], ["a", "b"]))
    widened = se.Schema(["a"], {"a": "bigint"})
    narrowed = se.Schema(["a"], {"a": "int"})
    old_int = se.Schema(["a"], {"a": "int"})

    se.validate_evolution(old, added, se.EvolutionStrategy.ADD_ONLY)
    with pytest.raises(SchemaError):
        se.validate_evolution(old, added, se.EvolutionStrategy.STRICT)
    se.validate_evolution(old_int, widened, se.EvolutionStrategy.COMPATIBLE)
    with pytest.raises(SchemaError):
        se.validate_evolution(widened, narrowed, se.EvolutionStrategy.COMPATIBLE)
    se.validate_evolution(widened, narrowed, se.EvolutionStrategy.FLEXIBLE)


def test_evolve_dataframe_defaults(spark):
    df = spark.createDataFrame([(1,)], ["a"])
    target = se.Schema(
        ["a", "b", "c", "d"],
        {"a": "bigint", "b": "double", "c": "boolean", "d": "string"},
    )
    row = se.evolve_dataframe(df, target).first()
    assert row["b"] == 0.0 and row["c"] is False and row["d"] is None


def test_evolution_aware_append(test_collection):
    idx = pd.date_range("2024-01-01", periods=3, freq="D")
    test_collection.write("it", pd.DataFrame({"value": [1, 2, 3]}, index=idx))
    test_collection.enable_schema_evolution("it", "add_only")
    idx2 = pd.date_range("2024-01-04", periods=3, freq="D")
    test_collection.append(
        "it",
        pd.DataFrame({"value": [4, 5, 6], "extra": ["x", "y", "z"]}, index=idx2),
    )
    out = test_collection.item("it").to_pandas()
    assert len(out) == 6
    assert "extra" in out.columns
    assert out["extra"].isna().sum() == 3  # old rows null-filled


def test_migration_spark_native(test_collection):
    idx = pd.date_range("2024-01-01", periods=3, freq="D")
    test_collection.write("it", pd.DataFrame({"old_name": [1.0, 2.0, 3.0]}, index=idx))
    test_collection.enable_schema_evolution("it")
    test_collection.migrate_item_to_version(
        "it", 2, migrations={(1, 2): se.rename_columns({"old_name": "new_name"})}
    )
    out = test_collection.item("it").to_pandas()
    assert list(out.columns) == ["new_name"]


def test_migration_pandas_fn(test_collection):
    idx = pd.date_range("2024-01-01", periods=3, freq="D")
    test_collection.write("it", pd.DataFrame({"v": [1.0, 2.0, 3.0]}, index=idx))
    test_collection.enable_schema_evolution("it")

    def double_v(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["v"] = pdf["v"] * 2
        return pdf

    test_collection.migrate_item_to_version("it", 2, migrations={(1, 2): double_v})
    out = test_collection.item("it").to_pandas()
    assert out["v"].tolist() == [2.0, 4.0, 6.0]
