"""Import data written by the reference pystore into this engine.

The reference's on-disk item format (layout documented at
pystore/utils.py:89-107, pystore/dataframe.py:40-160,201-345):

* dask/pyarrow parquet part files in
  ``<store>/<collection>/<item>/`` with the index materialized as
  columns;
* a ``pystore_metadata.json`` sidecar whose internal keys record the
  storage-time transforms: ``_transform_metadata`` (MultiIndex →
  columns, complex object columns → JSON strings),
  ``_type_info`` (timedelta→int64ns, period→str, interval→left/right
  columns, categorical→codes), ``_timezone_info`` (tz-aware
  index/columns converted to UTC).

``import_item`` inverts those transforms driver-side (the reference's
own read path does the same inversions), then writes the restored
frame through :meth:`Collection.write` — after which every engine
feature (manifest commits, pruning, time travel, pipelines) applies.
User metadata keys carry over; the reference's internal keys do not
(this engine records its own).

This is the switch-over path for an existing reference deployment:
``import_collection(src_root, dst_collection)`` walks the tree once,
item by item — each import is independent, restartable, and
parallelizable across items.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import pandas as pd

_INTERNAL_KEYS = {
    "_updated",
    "_transform_metadata",
    "_type_info",
    "_timezone_info",
    "_partition_info",
    "_schema_version",
}

_SIDE_CAR = "pystore_metadata.json"


def read_reference_item(item_dir: str | Path) -> tuple[pd.DataFrame, dict]:
    """(restored pandas frame, user metadata) from a reference-layout
    item directory — no Spark, no engine state touched."""
    import pyarrow.dataset as pa_ds

    item_dir = Path(item_dir)
    meta: dict[str, Any] = {}
    try:
        meta = json.loads((item_dir / _SIDE_CAR).read_text())
    except (OSError, ValueError):
        pass

    parts = sorted(
        str(p) for p in item_dir.rglob("*.parquet") if p.is_file()
    )
    if not parts:
        raise FileNotFoundError(
            f"no parquet part files under {item_dir}"
        )
    df = pa_ds.dataset(parts, format="parquet").to_table().to_pandas()

    tm = meta.get("_transform_metadata") or {}
    # complex object columns were JSON-encoded at write time
    for col, kind in (tm.get("complex_columns") or {}).items():
        if col not in df.columns:
            continue
        if kind == "json":
            df[col] = df[col].map(
                lambda x: json.loads(x) if pd.notna(x) else None
            )
        elif kind == "dataframe":
            import io

            df[col] = df[col].map(
                lambda x: pd.read_json(io.StringIO(x))
                if pd.notna(x)
                else None
            )

    # typed columns (timedelta / period / interval / categorical)
    for col, info in (meta.get("_type_info") or {}).items():
        kind = info.get("type")
        if kind == "timedelta" and col in df.columns:
            df[col] = pd.to_timedelta(df[col], unit=info.get("unit", "ns"))
        elif kind == "period" and col in df.columns:
            freq = info.get("freq")
            df[col] = pd.PeriodIndex(
                df[col], freq="M" if freq == "ME" else freq
            )
        elif kind == "interval":
            lc, rc = f"{col}_left", f"{col}_right"
            if lc in df.columns and rc in df.columns:
                df[col] = pd.IntervalIndex.from_arrays(
                    df[lc], df[rc], closed=info.get("closed", "right")
                )
                df = df.drop(columns=[lc, rc])
        elif kind == "category" and col in df.columns:
            df[col] = pd.Categorical.from_codes(
                df[col],
                categories=info.get("categories") or [],
                ordered=bool(info.get("ordered")),
            )

    # index: MultiIndex levels (or the single index) were reset to
    # columns at write time
    names = tm.get("index_names") or []
    if tm.get("has_multiindex") and all(n in df.columns for n in names):
        df = df.set_index(names)
    elif names and names[0] in df.columns:
        df = df.set_index(names[0])
    elif "index" in df.columns:
        df = df.set_index("index")

    # tz-aware data was normalized to UTC; restore declared zones
    tz = meta.get("_timezone_info") or {}
    if tz.get("index_tz") and isinstance(df.index, pd.DatetimeIndex):
        if df.index.tz is None:
            df.index = df.index.tz_localize("UTC")
        df.index = df.index.tz_convert(tz["index_tz"])
    for key, zone in tz.items():
        if not key.startswith("column_") or not key.endswith("_tz"):
            continue
        col = key[len("column_") : -len("_tz")]
        if col in df.columns and pd.api.types.is_datetime64_any_dtype(
            df[col]
        ):
            s = df[col]
            if getattr(s.dtype, "tz", None) is None:
                s = s.dt.tz_localize("UTC")
            df[col] = s.dt.tz_convert(zone)

    user_meta = {
        k: v for k, v in meta.items() if k not in _INTERNAL_KEYS
    }
    return df, user_meta


def import_item(
    collection,
    item_dir: str | Path,
    item: str | None = None,
    overwrite: bool = False,
    **write_kwargs,
) -> str:
    """Import one reference-layout item directory into
    ``collection`` under its directory name (or ``item``)."""
    item_dir = Path(item_dir)
    name = item or item_dir.name
    df, meta = read_reference_item(item_dir)
    collection.write(
        name, df, metadata=meta, overwrite=overwrite, **write_kwargs
    )
    return name


def import_collection(
    collection,
    src_collection_dir: str | Path,
    overwrite: bool = False,
    on_error: str = "raise",
) -> dict[str, str]:
    """Import every item of a reference-layout collection directory.
    Returns {item: 'ok' | 'error: ...'}; ``on_error='continue'``
    records failures and proceeds (each item import is independent —
    rerunning with ``overwrite=True`` is idempotent)."""
    src = Path(src_collection_dir)
    results: dict[str, str] = {}
    for d in sorted(p for p in src.iterdir() if p.is_dir()):
        if d.name.startswith((".", "_")):
            continue
        try:
            import_item(collection, d, overwrite=overwrite)
            results[d.name] = "ok"
        except Exception as exc:
            if on_error == "raise":
                raise
            results[d.name] = f"error: {exc}"
    return results
