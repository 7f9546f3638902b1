"""Driver-side utilities: metadata sidecars, path layout, dir ops.

The sidecar is a plain JSON file per item/store — metadata I/O is
driver-side file I/O, never a Spark job (reference:
pystore/utils.py:89-107; timestamp format asserted by
tests/test_edge_cases.py:41-58).

Sidecar file name starts with ``_`` so Spark's file-source listing
ignores it when scanning the item directory for Parquet parts.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from datetime import datetime, timezone
from pathlib import Path
from typing import Any

METADATA_FILE = "_pystore_metadata.json"
MANIFEST_FILE = "_manifest.json"
SNAPSHOT_DIR = "_snapshots"

_VALID_NAME = re.compile(r"[^A-Za-z0-9._\- ]")


def utc_stamp() -> str:
    # same human-readable format the reference stamps (_updated):
    # "%Y-%m-%d %H:%M:%S.%f" (pystore/utils.py:99-101)
    return datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S.%f")


def sanitize_snapshot_name(name: str) -> str:
    """Strip characters outside [A-Za-z0-9._] — reference:
    pystore/collection.py:531-532."""
    return re.sub(r"[^A-Za-z0-9._]", "", str(name))


def read_manifest(path: str | Path) -> dict[str, Any] | None:
    """The item's manifest — the single commit pointer naming its live
    data files (see manifest.py for the protocol). None = no manifest
    (a legacy directory-listing item, or not an item at all)."""
    p = Path(path) / MANIFEST_FILE
    try:
        with open(p) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def write_manifest(
    path: str | Path,
    files: list[str],
    metadata: dict[str, Any] | None,
    stale: dict[str, float] | None = None,
    base: str | None = None,
    version: int | None = None,
    stamp: bool = True,
    stats: dict[str, dict] | None = None,
) -> dict[str, Any]:
    """Atomically install a manifest — THE commit point of every data
    mutation: a single ``os.replace`` of one JSON file (atomic on
    POSIX; a single-object put on object stores), so readers see the
    old complete file set or the new one, never a partial swap.

    ``stats`` is the per-file column min/max zonemap (see
    manifest.gather_file_stats); it is pruned to the live file list
    automatically so stale entries never accumulate."""
    metadata = dict(metadata or {})
    if stamp:
        metadata["_updated"] = utc_stamp()
    man: dict[str, Any] = {
        "version": int(version if version is not None else 1),
        "files": sorted(files),
        "stale": dict(stale or {}),
        "metadata": metadata,
    }
    if stats:
        live_stats = {f: stats[f] for f in man["files"] if f in stats}
        if live_stats:
            man["stats"] = live_stats
    if base is not None:
        man["base"] = base
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    tmp = p / (MANIFEST_FILE + f".tmp{os.getpid()}")
    with open(tmp, "w") as fh:
        json.dump(tmp_json_safe(man), fh, default=str)
    os.replace(tmp, p / MANIFEST_FILE)
    return man


def read_metadata(path: str | Path) -> dict[str, Any]:
    man = read_manifest(path)
    if man is not None:
        return man.get("metadata") or {}
    p = Path(path) / METADATA_FILE
    if not p.exists():
        return {}
    with open(p) as fh:
        return json.load(fh)


def write_metadata(path: str | Path, metadata: dict[str, Any] | None = None) -> dict[str, Any]:
    man = read_manifest(path)
    if man is not None:
        # metadata-only update of a manifest item: preserve the file
        # pointers, bump the version, keep the commit atomic
        return write_manifest(
            path,
            man.get("files") or [],
            metadata,
            stale=man.get("stale"),
            base=man.get("base"),
            version=int(man.get("version", 0)) + 1,
            stats=man.get("stats"),
        )["metadata"]
    metadata = dict(metadata or {})
    metadata["_updated"] = utc_stamp()
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    tmp = p / (METADATA_FILE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(tmp_json_safe(metadata), fh, default=str)
    os.replace(tmp, p / METADATA_FILE)  # atomic on POSIX
    return metadata


def tmp_json_safe(obj: Any) -> Any:
    """Best-effort conversion of numpy/pandas scalars for json.dump."""
    if isinstance(obj, dict):
        return {str(k): tmp_json_safe(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [tmp_json_safe(v) for v in obj]
    if hasattr(obj, "item") and callable(obj.item):
        try:
            return obj.item()
        except Exception:
            return str(obj)
    return obj


def subdirs(path: str | Path) -> list[str]:
    """Immediate subdirectory names, skipping internal ``_``/``.`` dirs."""
    p = Path(path)
    if not p.exists():
        return []
    return sorted(
        d.name
        for d in p.iterdir()
        if d.is_dir() and not d.name.startswith((".", "_"))
    )


def rm_tree(path: str | Path) -> None:
    shutil.rmtree(path, ignore_errors=True)


def link_tree(src: str | Path, dst: str | Path) -> None:
    """Copy a directory tree using hard links for regular files.

    Used for snapshots and transaction backups: Parquet part files are
    immutable once written (rewrites swap whole directories), so a
    hard-linked tree is a correct point-in-time copy at O(metadata)
    cost — unlike the reference's full ``copytree``
    (pystore/collection.py:529-543) which is O(data). Falls back to a
    real copy when the filesystem lacks hard links.
    """
    src, dst = Path(src), Path(dst)
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        target_root = dst / rel if rel != "." else dst
        target_root.mkdir(parents=True, exist_ok=True)
        for f in files:
            s = os.path.join(root, f)
            d = str(target_root / f)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)


def validate_path_local(path: str) -> str:
    """Expand ~ and reject non-local URIs for the local warehouse
    (reference behavior: tests/test_store.py:89-92, tilde handling
    issue #68 tests/test_edge_cases.py:60-76)."""
    path = str(path)
    if re.match(r"^[a-z0-9]+://", path) and not path.startswith("file://"):
        raise ValueError(
            "pystore_spark warehouse paths must be local/file paths; "
            f"got {path!r}"
        )
    return os.path.expanduser(path.removeprefix("file://"))
