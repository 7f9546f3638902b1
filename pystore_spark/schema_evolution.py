"""Schema capture/diff/evolution for Spark DataFrames.

Reference: pystore/schema_evolution.py (strategies :38-43, diff
:113-158, widening matrix :212-227, evolve :252-298, migrations
:300-360). The Spark version operates on ``StructType`` and evolves a
frame with a single ``select`` of ``lit(default).cast(...)`` /
``col.cast(...)`` expressions — one projection, no shuffle.
"""

from __future__ import annotations

from enum import Enum
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pystore_spark.exceptions import SchemaError


class EvolutionStrategy(Enum):
    STRICT = "strict"          # no changes allowed
    ADD_ONLY = "add_only"      # new columns only
    COMPATIBLE = "compatible"  # adds + widening type changes
    FLEXIBLE = "flexible"      # anything goes


# type-widening matrix (reference: pystore/schema_evolution.py:212-227)
_WIDENING: dict[str, set[str]] = {
    "tinyint": {"smallint", "int", "bigint", "float", "double", "string"},
    "smallint": {"int", "bigint", "float", "double", "string"},
    "int": {"bigint", "float", "double", "string"},
    "bigint": {"double", "string"},
    "float": {"double", "string"},
    "double": {"string"},
    "boolean": {"string"},
}


def is_widening(old: str, new: str) -> bool:
    return new in _WIDENING.get(old, set())


class SchemaChange:
    def __init__(self, change_type: str, column: str, details: dict[str, Any]):
        self.change_type = change_type
        self.column = column
        self.details = details

    def __repr__(self) -> str:  # pragma: no cover
        return f"SchemaChange({self.change_type}, {self.column}, {self.details})"

    def to_dict(self) -> dict:
        return {
            "change_type": self.change_type,
            "column": self.column,
            "details": self.details,
        }


class Schema:
    """Captured schema: ordered columns + Spark type names."""

    def __init__(self, columns: list[str], dtypes: dict[str, str], version: int = 1):
        self.columns = list(columns)
        self.dtypes = dict(dtypes)
        self.version = version

    @classmethod
    def from_spark(cls, df: DataFrame, version: int = 1,
                   exclude: list[str] | None = None) -> "Schema":
        exclude = set(exclude or [])
        cols = [f.name for f in df.schema.fields if f.name not in exclude]
        dtypes = {
            f.name: f.dataType.simpleString()
            for f in df.schema.fields
            if f.name not in exclude
        }
        return cls(cols, dtypes, version)

    def to_dict(self) -> dict:
        return {"columns": self.columns, "dtypes": self.dtypes,
                "version": self.version}

    @classmethod
    def from_dict(cls, d: dict) -> "Schema":
        return cls(d["columns"], d["dtypes"], d.get("version", 1))

    def detect_changes(self, new: "Schema") -> list[SchemaChange]:
        """Diff self → new (reference: pystore/schema_evolution.py:113-158)."""
        changes: list[SchemaChange] = []
        old_set, new_set = set(self.columns), set(new.columns)
        for c in new.columns:
            if c not in old_set:
                changes.append(
                    SchemaChange("column_added", c, {"dtype": new.dtypes[c]})
                )
        for c in self.columns:
            if c not in new_set:
                changes.append(
                    SchemaChange("column_removed", c, {"dtype": self.dtypes[c]})
                )
        for c in self.columns:
            if c in new_set and self.dtypes[c] != new.dtypes[c]:
                changes.append(
                    SchemaChange(
                        "type_changed", c,
                        {"old": self.dtypes[c], "new": new.dtypes[c]},
                    )
                )
        common_old = [c for c in self.columns if c in new_set]
        common_new = [c for c in new.columns if c in old_set]
        if common_old != common_new:
            changes.append(
                SchemaChange("columns_reordered", "", {"old": common_old,
                                                       "new": common_new})
            )
        return changes


def validate_evolution(
    old: Schema, new: Schema, strategy: EvolutionStrategy
) -> bool:
    """Policy gate before an evolving append (reference:
    pystore/schema_evolution.py:178-210). Raises SchemaError when the
    change set violates the strategy."""
    changes = old.detect_changes(new)
    if strategy is EvolutionStrategy.FLEXIBLE:
        return True
    if strategy is EvolutionStrategy.STRICT:
        real = [c for c in changes if c.change_type != "columns_reordered"]
        if real:
            raise SchemaError(
                f"STRICT evolution forbids changes: {[c.to_dict() for c in real]}"
            )
        return True
    for c in changes:
        if c.change_type == "column_added":
            continue
        if c.change_type == "columns_reordered":
            continue
        if c.change_type == "column_removed":
            raise SchemaError(
                f"strategy {strategy.value} forbids removing column "
                f"{c.column!r}"
            )
        if c.change_type == "type_changed":
            if strategy is EvolutionStrategy.COMPATIBLE and is_widening(
                c.details["old"], c.details["new"]
            ):
                continue
            raise SchemaError(
                f"strategy {strategy.value} forbids type change on "
                f"{c.column!r}: {c.details['old']} → {c.details['new']}"
            )
    return True


def _default_literal(dtype: str):
    """Default fill for added columns (reference:
    pystore/schema_evolution.py:256-272): int→0, float→0.0,
    bool→False, datetime→null, else null."""
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        return F.lit(0)
    if dtype in ("float", "double"):
        return F.lit(0.0)
    if dtype == "boolean":
        return F.lit(False)
    return F.lit(None)


def merged_target_schema(
    old_df: DataFrame, new_df: DataFrame, exclude: list[str] | None = None
) -> Schema:
    """Union of columns; conflicting types resolved to the wider one
    (reference: pystore/schema_evolution.py:235-250)."""
    old = Schema.from_spark(old_df, exclude=exclude)
    new = Schema.from_spark(new_df, exclude=exclude)
    cols = list(old.columns) + [c for c in new.columns if c not in old.columns]
    dtypes: dict[str, str] = {}
    for c in cols:
        o, n = old.dtypes.get(c), new.dtypes.get(c)
        if o is None:
            dtypes[c] = n  # type: ignore[assignment]
        elif n is None or o == n:
            dtypes[c] = o
        elif is_widening(o, n):
            dtypes[c] = n
        elif is_widening(n, o):
            dtypes[c] = o
        else:
            dtypes[c] = "string"
    return Schema(cols, dtypes)


def evolve_dataframe(df: DataFrame, target: Schema) -> DataFrame:
    """One projection: add missing columns with defaults, drop extras,
    reorder, cast (reference: pystore/schema_evolution.py:252-298).
    Spark casts yield null on failure — same semantics as the
    reference's errors='coerce' converters (:283-297)."""
    have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    exprs = []
    for c in target.columns:
        want = target.dtypes[c]
        if c not in have:
            exprs.append(_default_literal(want).cast(want).alias(c))
        elif have[c] != want:
            exprs.append(F.col(c).cast(want).alias(c))
        else:
            exprs.append(F.col(c))
    return df.select(*exprs)


def run_migrations(
    df: DataFrame,
    from_version: int,
    to_version: int,
    migrations: dict[tuple[int, int], Callable],
) -> DataFrame:
    """Apply a direct or step-wise migration chain (reference:
    pystore/schema_evolution.py:306-360).

    A migration fn may be Spark-native (DataFrame → DataFrame) or
    pandas (pd.DataFrame → pd.DataFrame); pandas fns run distributed
    via ``mapInPandas`` with the output schema inferred from a sample.
    """
    if from_version == to_version:
        return df
    if (from_version, to_version) in migrations:
        chain = [(from_version, to_version)]
    else:
        chain = []
        v = from_version
        while v != to_version:
            step = (v, v + 1) if to_version > v else (v, v - 1)
            if step not in migrations:
                raise SchemaError(
                    f"no migration path from v{from_version} to v{to_version}"
                    f" (missing step {step})"
                )
            chain.append(step)
            v = step[1]
    for step in chain:
        df = apply_migration(df, migrations[step])
    return df


def apply_migration(df: DataFrame, fn: Callable) -> DataFrame:
    import pandas as pd

    # Spark-native migration first; fall back to a pandas fn run
    # distributed via mapInPandas (schema inferred from a small probe).
    try:
        out = fn(df)
        if isinstance(out, DataFrame):
            return out
    except Exception:
        pass
    probe = fn(df.limit(100).toPandas())
    if not isinstance(probe, pd.DataFrame):
        raise SchemaError("migration function must return a DataFrame")
    schema = _schema_from_pandas(probe)

    def runner(batches):
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(runner, schema=schema)


def _schema_from_pandas(pdf) -> T.StructType:
    import pandas as pd

    fields = []
    for c in pdf.columns:
        dt = pdf[c].dtype
        if pd.api.types.is_datetime64_any_dtype(dt):
            t: T.DataType = T.TimestampType()
        elif pd.api.types.is_integer_dtype(dt):
            t = T.LongType()
        elif pd.api.types.is_float_dtype(dt):
            t = T.DoubleType()
        elif pd.api.types.is_bool_dtype(dt):
            t = T.BooleanType()
        else:
            t = T.StringType()
        fields.append(T.StructField(str(c), t, True))
    return T.StructType(fields)


# example migrations (reference: pystore/schema_evolution.py:428-443)
def add_calculated_column(column_name: str, expr: str) -> Callable[[DataFrame], DataFrame]:
    def _fn(df: DataFrame) -> DataFrame:
        return df.withColumn(column_name, F.expr(expr))
    return _fn


def rename_columns(rename_map: dict[str, str]) -> Callable[[DataFrame], DataFrame]:
    def _fn(df: DataFrame) -> DataFrame:
        for old, new in rename_map.items():
            df = df.withColumnRenamed(old, new)
        return df
    return _fn
