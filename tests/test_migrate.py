"""Import from the reference pystore's on-disk layout (migrate.py).

Fixtures fabricate the reference's storage format exactly as its
write path produces it (dask/pyarrow parquet parts with the index
reset to columns + pystore_metadata.json carrying the transform
keys — pystore/dataframe.py:40-160,201-345), then import and verify
the restored frames and metadata round-trip into this engine.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pytest

from pystore_spark import migrate


def _write_ref_item(root, name, df_flat, meta, parts=2):
    """Write a reference-layout item dir: parquet part files (index
    already reset to columns, like dask to_parquet) + sidecar."""
    d = root / name
    d.mkdir(parents=True)
    step = max(1, len(df_flat) // parts)
    for i in range(parts):
        chunk = df_flat.iloc[i * step :] if i == parts - 1 else (
            df_flat.iloc[i * step : (i + 1) * step]
        )
        chunk.to_parquet(d / f"part.{i}.parquet", index=False)
    (d / "pystore_metadata.json").write_text(json.dumps(meta))
    return d


def test_import_plain_item(test_collection, tmp_path):
    idx = pd.date_range("2024-01-01", periods=200, freq="h")
    df = pd.DataFrame(
        {"px": np.arange(200.0), "sym": ["A", "B"] * 100}, index=idx
    )
    flat = df.reset_index()
    src = _write_ref_item(
        tmp_path, "trades", flat,
        {
            "source": "exchange-x",
            "_updated": "2025-01-01 00:00:00.000000",
            "_transform_metadata": {
                "has_multiindex": False,
                "index_names": ["index"],
                "index_dtypes": ["datetime64[ns]"],
                "original_columns": ["px", "sym"],
                "complex_columns": {},
            },
            "_type_info": {},
            "_timezone_info": {},
        },
    )
    migrate.import_item(test_collection, src)
    it = test_collection.item("trades")
    out = it.to_pandas()
    pd.testing.assert_frame_equal(
        out, df.rename_axis("index"), check_freq=False
    )
    assert it.metadata.get("source") == "exchange-x"
    # the reference's internal transform keys must NOT leak through
    assert "_transform_metadata" not in it.metadata
    # and the import is now a first-class engine item
    assert test_collection.item_versions("trades")[0]["version"] >= 1


def test_import_typed_and_tz_item(test_collection, tmp_path):
    n = 50
    idx = pd.date_range(
        "2024-03-01", periods=n, freq="D", tz="America/New_York"
    )
    cats = pd.Categorical(
        ["x", "y", "z", "y", "x"] * 10, ordered=True
    )
    df = pd.DataFrame(
        {
            "dur": pd.to_timedelta(np.arange(n), unit="m"),
            "cat": cats,
            "props": [{"a": int(i)} for i in range(n)],
        },
        index=idx,
    )
    # fabricate the stored (flattened) form the reference writes:
    flat = pd.DataFrame(
        {
            "index": idx.tz_convert("UTC").tz_localize(None),
            "dur": df["dur"].astype("int64").to_numpy(),
            "cat": cats.codes,
            "props": [json.dumps(p) for p in df["props"]],
        }
    )
    src = _write_ref_item(
        tmp_path, "typed", flat,
        {
            "owner": "quant",
            "_transform_metadata": {
                "has_multiindex": False,
                "index_names": ["index"],
                "index_dtypes": ["datetime64[ns, America/New_York]"],
                "original_columns": ["dur", "cat", "props"],
                "complex_columns": {"props": "json"},
            },
            "_type_info": {
                "dur": {"type": "timedelta", "unit": "ns"},
                "cat": {
                    "type": "category",
                    "categories": ["x", "y", "z"],
                    "ordered": True,
                },
            },
            "_timezone_info": {"index_tz": "America/New_York"},
        },
        parts=1,
    )
    df_restored, meta = migrate.read_reference_item(src)
    assert meta == {"owner": "quant"}
    assert str(df_restored.index.tz) == "America/New_York"
    assert pd.api.types.is_timedelta64_dtype(df_restored["dur"])
    assert isinstance(df_restored["cat"].dtype, pd.CategoricalDtype)
    assert df_restored["cat"].dtype.ordered
    assert df_restored["props"].iloc[3] == {"a": 3}

    # full import → engine round-trip preserves the restored values
    migrate.import_item(test_collection, src)
    out = test_collection.item("typed").to_pandas()
    assert str(out.index.tz) == "America/New_York"
    assert out["dur"].iloc[5] == pd.Timedelta(minutes=5)
    assert out["props"].iloc[3] == {"a": 3}


def test_import_collection_walks_and_reports(test_collection, tmp_path):
    idx = pd.date_range("2024-01-01", periods=10, freq="D")
    flat = pd.DataFrame({"index": idx, "v": np.arange(10.0)})
    meta = {
        "_transform_metadata": {
            "has_multiindex": False,
            "index_names": ["index"],
            "index_dtypes": ["datetime64[ns]"],
            "original_columns": ["v"],
            "complex_columns": {},
        }
    }
    _write_ref_item(tmp_path, "a", flat, meta, parts=1)
    _write_ref_item(tmp_path, "b", flat, meta, parts=1)
    # a broken item: unreadable parquet
    bad = tmp_path / "c"
    bad.mkdir()
    (bad / "part.0.parquet").write_bytes(b"not parquet")

    res = migrate.import_collection(
        test_collection, tmp_path, on_error="continue"
    )
    assert res["a"] == "ok" and res["b"] == "ok"
    assert res["c"].startswith("error:")
    assert len(test_collection.item("a").to_pandas()) == 10

    with pytest.raises(Exception):
        migrate.import_collection(test_collection, tmp_path)  # raises on c
