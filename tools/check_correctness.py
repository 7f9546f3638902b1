"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` at a given
SF dir; compares row count, column names, and order-insensitive values
(columns sorted by name, rows sorted, values canonicalized). Usage:

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Byte-matches the DRIVER's canonicalizer: columns sorted by
    name, rows sorted over the RAW values (no object coercion before
    the sort — a list/dict/array cell must crash here exactly like it
    crashes the driver; round-6 verdict #2), then value normalization
    for the comparison."""
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif s.dtype == object:
            df[c] = s.astype(str)
    return df


def complex_cols(df: pd.DataFrame) -> list[str]:
    """Columns whose first non-null cell is a container (list / dict /
    ndarray) — unsortable by the driver's canonicalizer, so any
    registry query emitting one is an automatic driver `err`."""
    bad = []
    for c in df.columns:
        s = df[c].dropna()
        if len(s) == 0:
            continue
        v = s.iloc[0]
        if isinstance(v, (list, dict, set, tuple)) or type(v).__name__ == "ndarray":
            bad.append(c)
    return bad


def dtype_class(s: pd.Series) -> str:
    """Coarse dtype family. The driver's value hash is dtype-sensitive
    (e.g. DuckDB HUGEINT -> float64 vs Spark BIGINT hashed differently
    even when values match), so the local gate must fail on family
    mismatches instead of normalizing them away."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "other"


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    bad = complex_cols(spark_pdf) + complex_cols(duck_pdf)
    if bad:
        # report BEFORE canon() would crash on the unsortable cells —
        # the driver dies with `unhashable type` here (round-6 #1)
        return [
            f"complex (array/map/struct) output columns {sorted(set(bad))}: "
            "the driver's canonicalizer cannot sort container cells — "
            "reshape to scalars (posexplode or md5(array_join))"
        ]
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    for c in sc:
        scls, dcls = dtype_class(spark_pdf[c]), dtype_class(duck_pdf[c])
        if scls != dcls:
            problems.append(
                f"dtype class col {c!r}: spark={spark_pdf[c].dtype}({scls}) "
                f"duck={duck_pdf[c].dtype}({dcls}) — driver hash would differ"
            )
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
                av = pd.to_numeric(a[c]).to_numpy()
                bv = pd.to_numeric(b[c]).to_numpy()
                bad = [
                    i
                    for i in range(len(av))
                    if not (
                        (math.isnan(av[i]) and math.isnan(bv[i]))
                        if (isinstance(av[i], float) and isinstance(bv[i], float)
                            and (math.isnan(av[i]) or math.isnan(bv[i])))
                        else av[i] == bv[i]
                    )
                ]
                if bad:
                    i = bad[0]
                    problems.append(
                        f"col {c!r}: {len(bad)} mismatches, first at {i}: "
                        f"{av[i]!r} != {bv[i]!r}"
                    )
            else:
                neq = (a[c].astype(str) != b[c].astype(str))
                if neq.any():
                    i = int(neq.idxmax())
                    problems.append(
                        f"col {c!r}: {int(neq.sum())} mismatches, first at {i}: "
                        f"{a[c].iloc[i]!r} != {b[c].iloc[i]!r}"
                    )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from pystore_spark.session import get_spark

    spark = get_spark(app_name="correctness_check")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(spark_pdf)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"OK   {name} ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
