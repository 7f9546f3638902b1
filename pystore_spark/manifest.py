"""Manifest-pointer commit protocol.

Every item carries a ``_manifest.json`` naming its live Parquet files
(relative paths). Writers stage new files into the item directory
under commit-token-unique names — invisible to readers, who resolve
strictly through the manifest — then atomically replace the manifest
(one ``os.replace``). Replaced files are not deleted at commit: they
move to the manifest's ``stale`` map with a timestamp and are
garbage-collected only after ``config.STALE_RETENTION_SECONDS``, so a
reader holding the previous manifest never observes a missing file
mid-append (the race the old rename-swap protocol admitted,
reference-analog ``pystore/collection.py:477-527``'s read-modify-write
has the same window). Because the commit is one file replace — never a
directory rename — the protocol also works on object stores where
rename is copy+delete.

Snapshots become O(manifest): a snapshot is a copy of the manifest
whose ``base`` field points back at the live item directory; the data
files are shared. GC retains any file referenced by a snapshot
manifest, and ``Collection.delete_item`` materializes (hard-links)
snapshot-referenced files before removing the live directory.

Scale note: at 100 TB an item's manifest lists O(files) strings on the
driver — the same order as the file listing Spark's InMemoryFileIndex
would do anyway, but without a recursive directory walk (one JSON read
vs an object-store LIST storm), and bucket pruning happens on the
driver before any I/O is scheduled.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Sequence

from pystore_spark import config, utils
from pystore_spark.exceptions import ConcurrentCommitError
from pystore_spark.fs import fs_for
from pystore_spark.partition import PARTITION_COL


def base_dir(item_path: str | Path, man: dict[str, Any]) -> Path:
    """Directory the manifest's relative file paths resolve against —
    the item dir itself, or (snapshot manifests) the live item dir the
    ``base`` field points at."""
    p = Path(item_path)
    base = man.get("base")
    return (p / base).resolve() if base else p


def live_files(item_path: str | Path, man: dict[str, Any]) -> list[Path]:
    b = base_dir(item_path, man)
    return [b / f for f in (man.get("files") or [])]


def bucket_file_map(man: dict[str, Any] | None) -> dict[str, tuple[str, ...]]:
    """Live files grouped by their bucket directory (the relpath's
    first component — ``_pb=...`` for time layouts, ``.`` for flat
    items), the unit ``_commit_staged``'s scope='buckets' swap
    replaces. Writers capture this at read time and pass it back as
    ``expect_files`` so the commit can detect a concurrent commit that
    changed a touched bucket after the rewrite was computed (the
    compact-vs-append lost-update window)."""
    from pathlib import PurePosixPath

    grouped: dict[str, list[str]] = {}
    for f in (man or {}).get("files") or []:
        grouped.setdefault(
            PurePosixPath(f).parent.as_posix(), []
        ).append(f)
    return {k: tuple(sorted(v)) for k, v in grouped.items()}


def _bucket_of(relpath: str) -> str | None:
    head = relpath.split("/", 1)[0]
    if head.startswith(f"{PARTITION_COL}="):
        return head[len(PARTITION_COL) + 1 :]
    return None


def _bucket_matches(bucket: str, op: str, value: Any) -> bool:
    if op in ("==", "="):
        return bucket == value
    if op == ">=":
        return bucket >= value
    if op == "<=":
        return bucket <= value
    if op == ">":
        return bucket > value
    if op == "<":
        return bucket < value
    if op == "in":
        return bucket in value
    return True  # unknown op → cannot prune


def _range_matches(rng: Sequence, op: str, value: Any) -> bool:
    """Can a file whose column spans [lo, hi] contain a row matching
    ``col <op> value``? Conservative: unknown ops/types → True."""
    if not rng or len(rng) != 2 or rng[0] is None or rng[1] is None:
        return True
    lo, hi = rng
    try:
        if op in ("==", "="):
            return lo <= value <= hi
        if op == "!=":
            return not (lo == hi == value)
        if op == ">":
            return hi > value
        if op == ">=":
            return hi >= value
        if op == "<":
            return lo < value
        if op == "<=":
            return lo <= value
        if op == "in":
            if isinstance(value, _SortedVals):
                # bisect: O(log n) per file instead of O(n) — the
                # dedup-index probe pushes thousands of band keys
                # against thousands of files
                import bisect

                i = bisect.bisect_left(value.vals, lo)
                return i < len(value.vals) and value.vals[i] <= hi
            return any(lo <= v <= hi for v in value)
    except TypeError:
        return True  # incomparable types (string filter on numeric stats)
    return True


class _SortedVals:
    """Marker wrapper: a pre-sorted in-list, prepared once per filter
    term by prune_files so _range_matches can bisect per file."""

    __slots__ = ("vals",)

    def __init__(self, vals):
        self.vals = vals

    def __iter__(self):  # row-level filter compilation still iterates
        return iter(self.vals)

    def __len__(self):
        return len(self.vals)

    def __contains__(self, x):  # _pb bucket membership, bisected
        import bisect

        i = bisect.bisect_left(self.vals, x)
        return i < len(self.vals) and self.vals[i] == x


def prune_files(
    files: Sequence[str],
    filters: Sequence | None,
    stats: dict[str, dict[str, Sequence]] | None = None,
) -> list[str]:
    """Driver-side file pruning over the manifest's file list, before
    any I/O is scheduled — the replacement for a directory listing +
    Catalyst partition-pruning pass:

    * ``_pb`` terms prune on the hive bucket encoded in the path;
    * with ``stats`` (the manifest's per-file column min/max zonemap,
      recorded for ``_zonemap_columns`` at commit), numeric terms on
      those columns prune files whose range cannot match — the driver
      half of z-order clustering (partition.zorder_value): tight
      per-file ranges make this skip most files for selective
      multi-dimensional predicates.

    A file survives if at least one DNF group could match it on ALL
    its prunable terms. Returns the full list when pruning would
    remove everything — the row-level filter then yields the (empty)
    result with a valid schema, which an empty scan set cannot
    provide.
    """
    files = list(files)
    if not filters:
        return files
    flist = list(filters)
    if all(isinstance(f, tuple) and len(f) == 3 for f in flist):
        groups = [flist]
    else:
        groups = [list(g) for g in flist]
    stats = stats or {}
    # pre-sort long in-lists ONCE so the per-file range check bisects
    def _prep(term):
        col, op, v = term
        if (
            op == "in"
            and isinstance(v, (list, tuple, set))
            and len(v) > 32
        ):
            try:
                return (col, op, _SortedVals(sorted(v)))
            except TypeError:  # heterogeneous values — leave as-is
                pass
        return term

    groups = [[_prep(t) for t in g] for g in groups]

    def keep(rel: str) -> bool:
        bucket = _bucket_of(rel)
        fstats = stats.get(rel) or {}
        for g in groups:
            ok = True
            for col, op, v in g:
                if col == PARTITION_COL:
                    if bucket is not None and not _bucket_matches(
                        bucket, op, v
                    ):
                        ok = False
                        break
                elif col in fstats:
                    if not _range_matches(fstats[col], op, v):
                        ok = False
                        break
            if ok:
                return True
        return False

    pruned = [f for f in files if keep(f)]
    return pruned if pruned else files


def gather_file_stats(
    item_path: str | Path, rels: Sequence[str], columns: Sequence[str]
) -> dict[str, dict[str, list]]:
    """Per-file [min, max] of the given columns from the parquet
    footers — the zonemap recorded in the manifest at commit. Driver-
    side, O(files just written) footer reads (the same files the
    commit just staged, so the metadata is page-cache-hot); numeric
    columns only (strings/bytes are skipped — their footer stats are
    truncated and not reliably comparable)."""
    import pyarrow.parquet as pq

    base = Path(item_path)
    fs = fs_for(base)
    out: dict[str, dict[str, list]] = {}
    for rel in rels:
        try:
            meta = pq.read_metadata(fs.open_read(base / rel))
        except Exception:
            continue
        names = meta.schema.names
        st: dict[str, list] = {}
        for c in columns:
            if c not in names:
                continue
            i = names.index(c)
            lo = hi = None
            for g in range(meta.num_row_groups):
                s = meta.row_group(g).column(i).statistics
                if (
                    s is None
                    or s.min is None
                    or s.max is None
                    or not isinstance(s.min, (int, float))
                    or isinstance(s.min, bool)
                ):
                    lo = hi = None
                    break
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
            if lo is not None:
                st[c] = [lo, hi]
        if st:
            out[rel] = st
    return out


def live_buckets(item_path: str | Path) -> set[str] | None:
    """Distinct ``_pb`` bucket values with live files, or None for a
    legacy (manifest-less) item."""
    man = utils.read_manifest(item_path)
    if man is None:
        return None
    out = set()
    for rel in man.get("files") or []:
        b = _bucket_of(rel)
        if b is not None:
            out.add(b)
    return out


def item_bytes(
    item_path: str | Path, buckets: set[str] | None = None
) -> int:
    """On-disk bytes of the item's LIVE files (optionally restricted
    to the given ``_pb`` buckets). Manifest-resolved, so staged and
    stale-retained files never inflate size gates; falls back to a
    directory walk for legacy items.

    Sizes recorded in the manifest at commit answer without any
    filesystem I/O — the append-path size gate stays O(1) even on a
    100k-file item; only files missing from the map (pre-round-4
    manifests) are stat'ed."""
    item_path = Path(item_path)
    fs = fs_for(item_path)
    man = utils.read_manifest(item_path)
    if man is None:
        if buckets is None:
            files = fs.list_files(item_path, ".parquet")
        else:
            files = [
                f
                for b in buckets
                for f in fs.list_files(
                    item_path / f"{PARTITION_COL}={b}", ".parquet"
                )
            ]
        return sum(_safe_size(fs, f) for f in files)
    b = base_dir(item_path, man)
    sizes = man.get("sizes") or {}
    return sum(
        int(sizes[rel]) if rel in sizes else _safe_size(fs, b / rel)
        for rel in (man.get("files") or [])
        if buckets is None or _bucket_of(rel) in buckets
    )


def _safe_size(fs, f: str | Path) -> int:
    try:
        return fs.size(f)
    except OSError:
        return 0


def snapshot_refs(
    collection_path: str | Path, item: str
) -> tuple[set[str], set[str]]:
    """``(file rels, dv-dir rels)`` (into the live item dir)
    referenced by any snapshot manifest of ``item`` — both must
    survive GC: a snapshot's read is its pinned manifest's files
    MINUS its pinned deletion-vector masks (dv.py), so losing either
    corrupts it."""
    refs: set[str] = set()
    dv: set[str] = set()
    snap_root = Path(collection_path) / utils.SNAPSHOT_DIR
    for snap in fs_for(snap_root).list_subdirs(snap_root):
        man = utils.read_manifest(snap_root / snap / item)
        if man is not None and man.get("base"):
            refs.update(man.get("files") or [])
            dv.update(_dv_refs(man))
    return refs, dv


def _dv_refs(man: dict | None) -> set[str]:
    return {
        e["ref"]
        for e in ((man or {}).get("dv") or {}).values()
        if e.get("ref")
    }


def gc_item(
    collection_path: str | Path,
    item: str,
    retention: float | None = None,
    orphan_grace: float | None = None,
    dry_run: bool = False,
) -> int:
    """Garbage-collect an item's dead files. Two classes:

    * **stale** — replaced by a commit, tracked in the manifest with
      the time they went stale; deleted once older than ``retention``
      (readers of the superseded manifest have long finished) unless a
      snapshot manifest still references them.
    * **orphans** — on-disk parquet the manifest has never named
      (a crash before the commit rename); never visible to anyone, so
      deleted once their mtime exceeds ``orphan_grace`` (the grace
      covers a concurrent writer's staged-but-uncommitted files).

    Returns the number of files removed. No Spark jobs, no locks —
    safe to call from any single-writer context (it runs at the top of
    every append via ``Collection.recover_item``).

    ``dry_run=True`` counts what WOULD be reclaimed without touching
    anything — no deletes, no manifest rewrite, no supersession
    tombstones (a dv dir not yet marked counts as 0 this pass, since
    its clock has not started).
    """
    retention = (
        config.STALE_RETENTION_SECONDS if retention is None else retention
    )
    orphan_grace = (
        config.ORPHAN_GRACE_SECONDS if orphan_grace is None else orphan_grace
    )
    item_path = Path(collection_path) / item
    fs = fs_for(item_path)
    man, etag = utils.read_manifest_versioned(item_path)
    if man is None or man.get("base"):
        return 0  # legacy item or snapshot pointer — nothing to GC
    refs, snap_dv = snapshot_refs(collection_path, item)
    now = time.time()
    removed = 0

    stale = dict(man.get("stale") or {})
    expired = [
        rel
        for rel, t in stale.items()
        if rel not in refs and now - float(t) >= retention
    ]
    if dry_run:
        expired_n = len(expired)
        expired, removed = [], removed + expired_n
    for rel in expired:
        try:
            fs.delete(item_path / rel, missing_ok=True)
        except OSError:
            continue
        del stale[rel]
        removed += 1
    if expired:
        try:
            utils.write_manifest(
                item_path,
                man.get("files") or [],
                man.get("metadata"),
                stale=stale,
                version=int(man.get("version", 0)) + 1,
                stamp=False,  # GC is not a data change; keep _updated
                stats=man.get("stats"),
                sizes=man.get("sizes"),
                dv=man.get("dv"),
                if_match=etag,
            )
        except ConcurrentCommitError:
            # a writer committed since our read: their manifest still
            # carries the (now partially deleted) stale map; the next
            # GC pass re-deletes idempotently. Never clobber a newer
            # manifest with our stale view.
            return removed

    known = set(man.get("files") or []) | set(stale) | refs
    for f in fs.list_files(item_path, ".parquet"):
        rel = Path(f).relative_to(item_path).as_posix()
        if rel in known:
            continue
        if rel.startswith("_blooms/"):
            # bloom sidecars (bloom.py) are not data files and are
            # never named by a manifest; maintain() folds dead rows
            continue
        if rel.startswith("_bucketview/"):
            # hard-linked per-version catalog views of a BUCKETED item
            # (bucketed.py) — live readers scan these; superseded
            # version dirs are dropped below, not by the orphan sweep
            continue
        if rel.startswith("_dv/"):
            # deletion-vector masks (dv.py) are named by the
            # manifest's dv MAP, not its file list — the sweep below
            # owns their lifetime; treating them as orphans would
            # delete a LIVE mask and resurrect its deleted rows
            continue
        try:
            if now - fs.mtime(f) >= orphan_grace:
                if not dry_run:
                    fs.delete(f, missing_ok=True)
                removed += 1
        except OSError:
            continue
    # deletion-vector dirs: a mask referenced by the live manifest or
    # a snapshot is immortal; a superseded mask (a re-masked file
    # points at a NEW union dir, dv.py "masks only grow") gets the
    # same grace stale data files get — ``retention`` seconds FROM
    # SUPERSESSION, not from creation. The manifest records no
    # supersession time, so GC tombstones it: the first pass that
    # finds a dir unreferenced drops a ``.superseded`` marker (dot
    # prefix — Spark and pyarrow scanners ignore it) and only a pass
    # ``retention`` after the marker deletes — an old mask re-masked
    # today still serves every reader pinned on the just-superseded
    # manifest for the full window. Version objects that referenced a
    # reclaimed mask die in the version sweep below, exactly like
    # versions whose data files expired.
    dv_live = _dv_refs(man) | snap_dv
    dv_gone: set[str] = set()
    dv_root = item_path / "_dv"
    # the whole sweep goes through the fs abstraction (like
    # snapshot_refs) — Path ops here would silently skip the dv sweep
    # on any future non-local Spark-readable backend
    for name in fs.list_subdirs(dv_root):
        child = dv_root / name
        rel = f"_dv/{name}"
        marker = child / ".superseded"
        if rel in dv_live:
            if fs.exists(marker):  # re-referenced (restore): clear
                try:
                    fs.delete(marker, missing_ok=True)
                except OSError:
                    pass
            continue
        try:
            if not fs.exists(marker):
                if dry_run:
                    continue  # don't start the clock on a dry run
                # supersession first observed NOW
                fs.put_atomic(marker, b"")
            if now - fs.mtime(marker) >= retention:
                if dry_run:
                    removed += 1
                    continue
                fs.remove_prefix(child)
                dv_gone.add(rel)
                removed += 1
        except OSError:
            continue
    # time-travel history lives exactly as long as the data it
    # references: a version object is deleted once ANY of its files
    # has left the (live ∪ stale-retained) set — the same
    # availability rule Item._resolve_version reads by, so the
    # readable-version list shrinks only when the data actually
    # disappears, never on the object's own age (a v1 whose files all
    # survive an append stays readable indefinitely, at one
    # manifest-sized JSON per commit). Never the live version's
    # object.
    cur = int(man.get("version", 0))
    avail = set(man.get("files") or []) | set(stale) | refs
    for f in fs.list_files(item_path / utils.VERSIONS_DIR, ".json"):
        stem = Path(f).stem
        if not stem.isdigit() or int(stem) == cur:
            continue
        vman = utils.read_version_manifest(item_path, int(stem))
        dead = vman is None or any(
            rel not in avail for rel in (vman.get("files") or [])
        ) or any(
            # a version is unreadable once any of its dv masks is
            # reclaimed — same availability rule as its data files
            r in dv_gone or not fs.exists(item_path / r)
            for r in _dv_refs(vman)
        )
        if dead:
            try:
                if not dry_run:
                    fs.delete(f, missing_ok=True)
            except OSError:
                continue
    # bucketed catalog views: a version dir older than the live
    # version is only read by manifests that old — drop it on the same
    # clock as stale data files (readers of the current version keep
    # theirs; a historical read re-materializes its view on demand as
    # long as the version's files survive above)
    bview = item_path / "_bucketview"
    if fs.exists(bview):
        for child in sorted(Path(bview).iterdir()):
            name = child.name
            if name == f"v{cur}":
                continue
            is_tmp = name.startswith(".tmp-")
            try:
                age = now - fs.mtime(child)
            except OSError:
                continue
            if age >= (orphan_grace if is_tmp else retention):
                if not dry_run:
                    utils.rm_tree(child)
                removed += 1
    if removed and not dry_run:
        fs.prune_empty_dirs(item_path)
    return removed
