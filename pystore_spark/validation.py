"""Validation rules compiled to a single Spark aggregate job.

Reference: pystore/validation.py:35-371. Each rule contributes one or
more aggregate expressions; ``DataValidator.validate`` runs ONE
``df.agg(...)`` over all enabled rules — a single scan regardless of
rule count (the reference iterates pandas ops per rule).

Rules also accept pandas DataFrames (the ingest boundary) by
converting through the active SparkSession only when needed — for
small driver-side frames the pandas fast path is used directly.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pystore_spark.exceptions import ValidationError


class ValidationRule:
    """Base rule (reference: pystore/validation.py:35-51)."""

    def __init__(self, name: str, error_message: str | None = None):
        self.name = name
        self.error_message = error_message or f"validation rule {name!r} failed"

    # --- structural check against the schema only (no scan) ---
    def check_schema(self, columns: Sequence[str], dtypes: dict) -> str | None:
        return None

    # --- aggregate expressions: dict alias -> Column ---
    def agg_exprs(self, df: DataFrame) -> dict[str, Any]:
        return {}

    # --- verdict from the aggregated row ---
    def verdict(self, row: dict[str, Any]) -> str | None:
        return None


class ColumnExistsRule(ValidationRule):
    def __init__(self, columns: Sequence[str], name: str = "column_exists"):
        super().__init__(name)
        self.columns = list(columns)

    def check_schema(self, columns, dtypes):
        missing = [c for c in self.columns if c not in columns]
        if missing:
            return f"missing required columns: {missing}"
        return None


class DataTypeRule(ValidationRule):
    """Column → expected Spark type-name(s) (reference maps to python
    types; here Spark simpleString names, e.g. 'double', 'bigint')."""

    _ALIASES = {
        float: {"double", "float"},
        int: {"bigint", "int", "smallint", "tinyint"},
        str: {"string"},
        bool: {"boolean"},
    }

    def __init__(self, type_map: dict[str, Any], name: str = "data_type"):
        super().__init__(name)
        self.type_map = type_map

    def check_schema(self, columns, dtypes):
        bad = []
        for col, want in self.type_map.items():
            if col not in columns:
                bad.append(f"{col}: missing")
                continue
            have = dtypes.get(col)
            allowed = (
                self._ALIASES.get(want, {str(want)})
                if not isinstance(want, str)
                else {want}
            )
            if have not in allowed:
                bad.append(f"{col}: {have} not in {sorted(allowed)}")
        return f"type mismatches: {bad}" if bad else None


class RangeRule(ValidationRule):
    """min/max bounds per column (reference: pystore/validation.py:107-148)."""

    def __init__(
        self,
        column: str,
        min_val: float | None = None,
        max_val: float | None = None,
        name: str | None = None,
    ):
        super().__init__(name or f"range_{column}")
        self.column = column
        self.min_val = min_val
        self.max_val = max_val

    def agg_exprs(self, df):
        if self.column not in df.columns:
            return {}
        out = {}
        if self.min_val is not None:
            out[f"{self.name}__below"] = F.sum(
                F.when(F.col(self.column) < self.min_val, 1).otherwise(0)
            )
        if self.max_val is not None:
            out[f"{self.name}__above"] = F.sum(
                F.when(F.col(self.column) > self.max_val, 1).otherwise(0)
            )
        return out

    def verdict(self, row):
        below = row.get(f"{self.name}__below") or 0
        above = row.get(f"{self.name}__above") or 0
        if below or above:
            return (
                f"column {self.column!r} out of range "
                f"[{self.min_val}, {self.max_val}]: {below} below, {above} above"
            )
        return None


class NoNullRule(ValidationRule):
    def __init__(self, columns: Sequence[str], name: str = "no_null"):
        super().__init__(name)
        self.columns = list(columns)

    def agg_exprs(self, df):
        return {
            f"{self.name}__nulls_{c}": F.sum(
                F.when(F.col(c).isNull(), 1).otherwise(0)
            )
            for c in self.columns
            if c in df.columns
        }

    def verdict(self, row):
        bad = {
            k.split("__nulls_", 1)[1]: v
            for k, v in row.items()
            if k.startswith(f"{self.name}__nulls_") and (v or 0) > 0
        }
        return f"null values found: {bad}" if bad else None


class UniqueRule(ValidationRule):
    def __init__(self, columns: Sequence[str], name: str = "unique"):
        super().__init__(name)
        self.columns = list(columns)

    def agg_exprs(self, df):
        out = {}
        for c in self.columns:
            if c in df.columns:
                out[f"{self.name}__n_{c}"] = F.count(F.col(c))
                out[f"{self.name}__nd_{c}"] = F.count_distinct(F.col(c))
        return out

    def verdict(self, row):
        bad = []
        for c in self.columns:
            n = row.get(f"{self.name}__n_{c}")
            nd = row.get(f"{self.name}__nd_{c}")
            if n is not None and nd is not None and n != nd:
                bad.append(f"{c}: {n - nd} duplicates")
        return f"duplicate values: {bad}" if bad else None


class ExpressionRule(ValidationRule):
    """Boolean Column predicate that must hold for every row — the
    Spark-native generalization of the reference's CustomRule; counts
    violations inside the shared aggregate."""

    def __init__(self, condition, name: str = "expression",
                 error_message: str | None = None):
        super().__init__(name, error_message)
        self.condition = condition

    def agg_exprs(self, df):
        cond = (
            F.expr(self.condition)
            if isinstance(self.condition, str)
            else self.condition
        )
        return {
            f"{self.name}__violations": F.sum(F.when(~cond, 1).otherwise(0))
        }

    def verdict(self, row):
        v = row.get(f"{self.name}__violations") or 0
        return f"{self.error_message} ({v} rows)" if v else None


def count_order_inversions(
    df: DataFrame, column: str, order_col: str | None = None
) -> int:
    """Inversions of ``column``, computed scale-safe: one
    Arrow-batched pass per partition (constant memory), then a
    boundary comparison over the tiny one-row-per-partition result.
    Replaces the former global ``Window.orderBy`` formulation, which
    funnelled the whole table through a single task.

    With ``order_col`` the check is logical — ``column`` is tested
    against the order defined by ``order_col`` (one range shuffle;
    deterministic at any parallelism). Without it, the check runs in
    the frame's PHYSICAL row order, which is only meaningful for
    driver-originated frames or sorted storage reads (the reference's
    pandas ``is_monotonic`` semantics); after a join/groupBy/
    repartition the physical order is arbitrary — pass ``order_col``.
    """
    if order_col is not None:
        n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 2)
        df = df.select(column, order_col).repartitionByRange(
            n_parts, order_col
        ).sortWithinPartitions(order_col)
    col_type = df.schema[column].dataType.simpleString()

    def _per_partition(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        first = None
        prev = None
        intra = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            s = pdf[column]
            if first is None:
                first = s.iloc[0]
            if (
                prev is not None
                and pd.notna(prev)
                and pd.notna(s.iloc[0])
            ):
                intra += int(s.iloc[0] < prev)
            v = s.to_numpy()
            if len(v) > 1:
                intra += int((v[1:] < v[:-1]).sum())
            prev = s.iloc[-1]
        if first is not None:
            yield pd.DataFrame(
                {"pid": [pid], "first": [first], "last": [prev],
                 "intra": [intra]}
            )

    per = df.select(column).mapInPandas(
        _per_partition,
        schema=f"pid int, first {col_type}, last {col_type}, intra long",
    ).collect()
    per.sort(key=lambda r: r["pid"])
    total = sum(r["intra"] for r in per)
    for a, b in zip(per, per[1:]):
        if a["last"] is not None and b["first"] is not None:
            total += int(b["first"] < a["last"])
    return total


class MonotonicIndexRule(ValidationRule):
    """Sorted-index check (reference: pystore/validation.py:317-325).
    Runs as its own linear job via :func:`count_order_inversions` — a
    sortedness check is inherently order-sensitive, so it can't fold
    into the shared commutative aggregate without a single-task global
    window.

    By default the check runs in physical row order, matching the
    reference's pandas ``is_monotonic`` on driver-originated frames
    and sorted storage reads. For frames that have been shuffled
    (join/groupBy/repartition) physical order is arbitrary — pass
    ``order_col`` (e.g. a sequence id) to check the logical order
    instead."""

    def __init__(
        self,
        column: str = "index",
        name: str = "sorted_index",
        order_col: str | None = None,
    ):
        super().__init__(name)
        self.column = column
        self.order_col = order_col

    def run_spark(self, df: DataFrame) -> str | None:
        if self.column not in df.columns:
            return None
        if self.order_col is not None and self.order_col not in df.columns:
            return None
        v = count_order_inversions(df, self.column, self.order_col)
        if v:
            return (
                f"index column {self.column!r} is not sorted "
                f"({v} inversions)"
            )
        return None


class CustomRule(ValidationRule):
    """Arbitrary callable on a pandas frame (reference:
    pystore/validation.py:202-215). Escape hatch — runs driver-side on
    a collected sample or full frame for pandas input."""

    def __init__(
        self,
        validate_func: Callable[[pd.DataFrame], bool],
        name: str = "custom",
        error_message: str | None = None,
    ):
        super().__init__(name, error_message)
        self.validate_func = validate_func

    def run_pandas(self, pdf: pd.DataFrame) -> str | None:
        try:
            ok = bool(self.validate_func(pdf))
        except Exception as exc:  # noqa: BLE001
            return f"{self.error_message}: {exc}"
        return None if ok else self.error_message


class DataValidator:
    """Rule list compiled to one aggregate job (reference:
    pystore/validation.py:218-261)."""

    def __init__(self) -> None:
        self.rules: list[ValidationRule] = []
        self.enabled = True

    def add_rule(self, rule: ValidationRule) -> "DataValidator":
        self.rules.append(rule)
        return self

    def remove_rule(self, name: str) -> None:
        self.rules = [r for r in self.rules if r.name != name]

    def disable(self) -> None:
        self.enabled = False

    def enable(self) -> None:
        self.enabled = True

    def validate(self, data, raise_on_error: bool = True) -> bool:
        if not self.enabled:
            return True
        errors: list[str] = []
        is_pandas = isinstance(data, pd.DataFrame)
        if is_pandas:
            columns = list(map(str, data.columns))
            if data.index.name or isinstance(data.index, pd.DatetimeIndex):
                columns = [data.index.name or "index"] + columns
            dtypes = {}
        else:
            columns = data.columns
            dtypes = dict(data.dtypes)

        for r in self.rules:
            err = r.check_schema(columns, dtypes)
            if err:
                errors.append(f"{r.name}: {err}")

        if is_pandas:
            pdf = data.reset_index() if data.index.name or isinstance(
                data.index, pd.DatetimeIndex
            ) else data
            errors.extend(self._validate_pandas(pdf))
        else:
            agg_map: dict[str, Any] = {}
            for r in self.rules:
                agg_map.update(r.agg_exprs(data))
            if agg_map:
                row = (
                    data.agg(*[e.alias(k) for k, e in agg_map.items()])
                    .first()
                    .asDict()
                )
                for r in self.rules:
                    err = r.verdict(row)
                    if err:
                        errors.append(f"{r.name}: {err}")
            for r in self.rules:
                run_spark = getattr(r, "run_spark", None)
                if run_spark is not None:
                    err = run_spark(data)
                    if err:
                        errors.append(f"{r.name}: {err}")
            for r in self.rules:
                if isinstance(r, CustomRule):
                    errors.append("custom rules require pandas input or "
                                  "use ExpressionRule for Spark frames")

        if errors:
            if raise_on_error:
                raise ValidationError("; ".join(errors))
            return False
        return True

    def _validate_pandas(self, pdf: pd.DataFrame) -> list[str]:
        """Driver-side pandas fast path for ingest-boundary frames."""
        errors: list[str] = []
        for r in self.rules:
            if isinstance(r, RangeRule) and r.column in pdf.columns:
                s = pdf[r.column]
                below = int((s < r.min_val).sum()) if r.min_val is not None else 0
                above = int((s > r.max_val).sum()) if r.max_val is not None else 0
                if below or above:
                    errors.append(
                        f"{r.name}: column {r.column!r} out of range "
                        f"[{r.min_val}, {r.max_val}]: {below} below, {above} above"
                    )
            elif isinstance(r, NoNullRule):
                bad = {
                    c: int(pdf[c].isna().sum())
                    for c in r.columns
                    if c in pdf.columns and pdf[c].isna().any()
                }
                if bad:
                    errors.append(f"{r.name}: null values found: {bad}")
            elif isinstance(r, UniqueRule):
                bad = [
                    f"{c}: {int(pdf[c].duplicated().sum())} duplicates"
                    for c in r.columns
                    if c in pdf.columns and pdf[c].duplicated().any()
                ]
                if bad:
                    errors.append(f"{r.name}: duplicate values: {bad}")
            elif isinstance(r, MonotonicIndexRule) and r.column in pdf.columns:
                if not pdf[r.column].is_monotonic_increasing:
                    errors.append(
                        f"{r.name}: index column {r.column!r} is not sorted"
                    )
            elif isinstance(r, ExpressionRule):
                # expression rules are Spark-only; skip on pandas path
                continue
            elif isinstance(r, CustomRule):
                err = r.run_pandas(pdf)
                if err:
                    errors.append(f"{r.name}: {err}")
        return errors


def create_validator() -> DataValidator:
    return DataValidator()


def with_validation(validator: DataValidator):
    """Decorator validating the first DataFrame argument (reference:
    pystore/validation.py:269-296)."""

    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            for a in args:
                if isinstance(a, (pd.DataFrame, DataFrame)):
                    validator.validate(a, raise_on_error=True)
                    break
            return func(*args, **kwargs)

        return wrapper

    return decorator


def create_timeseries_validator(
    value_columns: Sequence[str], index_column: str = "index"
) -> DataValidator:
    """Prebuilt: columns exist, no nulls, sorted index (reference:
    pystore/validation.py:301-328)."""
    v = DataValidator()
    v.add_rule(ColumnExistsRule(list(value_columns)))
    v.add_rule(NoNullRule(list(value_columns)))
    v.add_rule(MonotonicIndexRule(index_column))
    return v


def create_financial_validator(
    price_columns: Sequence[str] | None = None,
    volume_column: str = "volume",
) -> DataValidator:
    """Prebuilt OHLCV validator (reference: pystore/validation.py:330-371):
    required columns, no nulls, non-negative prices/volume, OHLC
    invariant high ≥ {open, close, low} and low ≤ {open, close}."""
    price_columns = list(price_columns or ["open", "high", "low", "close"])
    v = DataValidator()
    v.add_rule(ColumnExistsRule(price_columns + [volume_column]))
    v.add_rule(NoNullRule(price_columns + [volume_column]))
    for c in price_columns + [volume_column]:
        v.add_rule(RangeRule(c, min_val=0, name=f"nonneg_{c}"))
    if set(["open", "high", "low", "close"]).issubset(price_columns):
        v.add_rule(
            ExpressionRule(
                (F.col("high") >= F.col("low"))
                & (F.col("high") >= F.col("open"))
                & (F.col("high") >= F.col("close"))
                & (F.col("low") <= F.col("open"))
                & (F.col("low") <= F.col("close")),
                name="ohlc_invariant",
                error_message="OHLC relationship violated",
            )
        )
        v.add_rule(
            CustomRule(
                lambda df: bool(
                    ((df["high"] >= df["low"])
                     & (df["high"] >= df["open"])
                     & (df["high"] >= df["close"])
                     & (df["low"] <= df["open"])
                     & (df["low"] <= df["close"])).all()
                ),
                name="ohlc_invariant_pd",
                error_message="OHLC relationship violated",
            )
        )
    return v
