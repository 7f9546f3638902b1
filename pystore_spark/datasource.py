"""Native Spark data source for the store — ``format("pystore")``.

Spark 4's Python Data Source API lets the engine expose itself as a
first-class source, closing the loop the sinks opened: downstream
pipelines no longer poll ``Collection.changes`` by hand — they
``readStream`` the store and Structured Streaming drives watermarks,
checkpoints, and exactly-once for them.

* **Batch**: ``spark.read.format("pystore").options(path=, store=,
  collection=, item=).load()`` — one input partition per LIVE file of
  the item's current manifest (MVCC-consistent: the file list is
  pinned at load, staged/stale files invisible), streamed back as
  Arrow record batches.
* **Streaming**: ``spark.readStream.format("pystore")...`` — the
  manifest VERSION is the offset. Each micro-batch reads exactly the
  files ADDED between two committed versions (the change-feed fast
  path, O(new data)); version manifests give replayable offsets, so a
  restarted query resumes from its checkpoint. Appends are the
  streamable mutation; a REWRITE inside an uncommitted window
  (compaction, delete, upsert) raises a clear error — the same
  append-only contract every file-based Spark stream has, but
  enforced from the manifest instead of silently missed.
* **Streaming CDC**: ``.option("mode", "cdc")`` — the Delta-CDF-style
  change feed: every row carries ``_change_type``; rewrites stream as
  ``delete`` rows from removed files + ``insert`` rows from added
  ones instead of killing the query, so a keyed downstream merge
  reconverges through compactions and upserts.

Workers need only this package + pyarrow (readers re-resolve
manifests from the shared filesystem; no driver state beyond the
pickled options travels).

Register once per session::

    from pystore_spark.datasource import register
    register(spark)

Writes deliberately stay on the ``foreachBatch`` sinks
(streaming.py): a sink runs REAL engine appends — duplicate-handling
strategies, CHECK-constraint vetting, persistent-index updates,
rollup/matview refresh — against whole micro-batch DataFrames. A
row-level ``DataSourceStreamWriter`` sees only partition iterators
and could express none of that; offering both would fork the write
path's semantics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.types import StructType

FORMAT_NAME = "pystore"

#: change-type column emitted by the streaming source's cdc mode —
#: same name/values as Collection.changes' batch feed
CDC_COL = "_change_type"


@dataclass
class FilePartition(InputPartition):
    path: str
    change_type: str = "insert"
    #: manifest rel path of the data file (deletion-vector lookups)
    rel: str = ""
    #: dv dir rel whose positions for ``rel`` are EXCLUDED from the
    #: emitted rows (the version's mask), or None
    mask_ref: str | None = None
    #: cdc dv-delta partitions: emit ONLY rows at positions in
    #: (mask_ref − base_mask_ref) — the newly-masked rows — as deletes
    base_mask_ref: str | None = None
    kind: str = "file"  # "file" | "dv_delta"
    #: manifest base dir the dv refs resolve against ("" = item dir)
    dv_base: str = ""
    #: positions resolved ON THE DRIVER at planning time and shipped
    #: in the partition (exclusions for masked files, inclusions for
    #: dv_delta) — saves every executor task a full scan of the
    #: shared dv dir; None = resolve executor-side (mask bigger than
    #: the shipping threshold)
    positions: "tuple[int, ...] | None" = None


#: per-file mask size above which positions are NOT pickled into the
#: partition and the executor resolves them itself (~8 bytes each:
#: 200k ≈ 1.6 MB of task payload)
DV_SHIP_MAX_POSITIONS = 200_000


def _dv_positions(
    item_dir: str, ref: str | None, rel: str, base: str | None = None
) -> "set[int]":
    """Masked positions of ``rel`` recorded in dv dir ``ref``.
    ``base`` is the manifest's base dir when it differs from the item
    dir (snapshot manifests)."""
    if not ref:
        return set()
    import pyarrow.dataset as pds

    dset = pds.dataset(
        f"{base or item_dir}/{ref}", filesystem=_pa_fs(item_dir),
        format="parquet",
    )
    tbl = dset.to_table(
        columns=["pos"], filter=pds.field("file") == rel
    )
    return set(tbl.column("pos").to_pylist())


def _dv_positions_by_file(
    item_dir: str, ref: str, rels: "list[str]", base: str | None = None
) -> "dict[str, set[int]]":
    """One scan of dv dir ``ref`` serving MANY files' positions — the
    driver-side batch lookup behind position shipping (each executor
    task would otherwise rescan the shared dir)."""
    import pyarrow.dataset as pds

    dset = pds.dataset(
        f"{base or item_dir}/{ref}", filesystem=_pa_fs(item_dir),
        format="parquet",
    )
    tbl = dset.to_table(
        columns=["file", "pos"],
        filter=pds.field("file").isin(rels),
    )
    out: dict[str, set[int]] = {r: set() for r in rels}
    for f_, p_ in zip(
        tbl.column("file").to_pylist(), tbl.column("pos").to_pylist()
    ):
        out[f_].add(int(p_))
    return out


def _ship_positions(
    item_dir: str,
    entries: "list[tuple[str, str | None, int]]",
    base: str | None = None,
) -> "dict[str, tuple[int, ...]]":
    """``{rel: positions}`` for every (rel, ref, n) whose mask is
    small enough to pickle into its partition; big masks are left for
    executor-side resolution. Groups by ref so each dv dir is read
    ONCE regardless of how many files it masks."""
    by_ref: dict[str, list[str]] = {}
    for rel, ref, n in entries:
        if ref and 0 < n <= DV_SHIP_MAX_POSITIONS:
            by_ref.setdefault(ref, []).append(rel)
    out: dict[str, tuple[int, ...]] = {}
    for ref, rels in by_ref.items():
        for rel, pos in _dv_positions_by_file(
            item_dir, ref, rels, base=base
        ).items():
            out[rel] = tuple(sorted(pos))
    return out


def _item_dir(options: dict) -> str:
    import os

    for k in ("path", "store", "collection", "item"):
        if not options.get(k):
            raise ValueError(
                "pystore source needs options path= (store root), "
                f"store=, collection=, item= — missing {k!r}"
            )
    return os.path.join(
        options["path"], options["store"], options["collection"],
        options["item"],
    )


def _version_opt(options: dict) -> int | None:
    """Parse ``option("version", N)`` — batch time travel."""
    v = options.get("version")
    if v is None or str(v).strip() == "":
        return None
    try:
        n = int(str(v))
    except ValueError:
        raise ValueError(
            f"option version= must be an integer, got {v!r}"
        ) from None
    if n < 1:
        raise ValueError(f"option version= must be >= 1, got {n}")
    return n


def _manifest(item_dir: str, version: int | None = None) -> dict:
    from pystore_spark import utils

    if version is None:
        man = utils.read_manifest(item_dir)
    elif version == 0:
        return {"files": [], "version": 0}
    else:
        man = utils.read_version_manifest(item_dir, version)
    if man is None:
        raise ValueError(
            f"no readable manifest for {item_dir!r}"
            + (f" at version {version}" if version is not None else "")
            + " — the item does not exist, predates the manifest "
            "protocol, or the version was garbage-collected"
        )
    return man


def _abs_files(item_dir: str, man: dict) -> list[str]:
    from pystore_spark import manifest as mf

    return sorted(str(p) for p in mf.live_files(item_dir, man))


def _pa_fs(item_dir: str):
    """The engine's filesystem handle for pyarrow reads — the same
    abstraction every other arrow read goes through, so non-local
    backends fail with the engine's standard error, not a raw
    FileNotFoundError."""
    from pystore_spark.fs import fs_for

    return fs_for(item_dir).as_pyarrow_filesystem()


def _read_file_batches(
    path: str, item_dir: str, schema: "StructType", filter_expr=None
):
    """Arrow record batches for one parquet file, projected onto the
    declared schema's column order. ``filter_expr`` (a pyarrow dataset
    expression) prunes row groups on parquet statistics AND drops
    non-matching rows before the batches cross into the JVM — the
    pushed-filter fast path."""
    import pyarrow.dataset as pds

    names = [f.name for f in schema.fields]
    dset = pds.dataset(
        path, filesystem=_pa_fs(item_dir), format="parquet"
    )
    for batch in dset.to_batches(columns=names, filter=filter_expr):
        yield batch.select(names)


def _read_file_batches_positional(
    path: str,
    item_dir: str,
    schema: "StructType",
    exclude: "set[int] | None" = None,
    include: "set[int] | None" = None,
):
    """Batches of one parquet file with POSITION-aware row selection —
    the deletion-vector path (mask exclusion / cdc delta emission).
    Reads sequentially with a running row offset; no filter pushdown
    (positions must stay aligned), which is the honest cost of
    reading a masked file through the source."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    names = [f.name for f in schema.fields]
    pf = pq.ParquetFile(path, filesystem=_pa_fs(item_dir))
    # hoist the set→array conversions out of the batch loop (they are
    # O(mask) each; a big masked file iterates many batches)
    excl_arr = (
        np.fromiter(exclude, dtype=np.int64)
        if exclude
        else None
    )
    incl_arr = (
        np.fromiter(include, dtype=np.int64)
        if include
        else np.empty(0, dtype=np.int64)
    )
    offset = 0
    for batch in pf.iter_batches(columns=names):
        n = batch.num_rows
        idx = np.arange(offset, offset + n)
        keep = np.ones(n, dtype=bool)
        if excl_arr is not None:
            keep &= ~np.isin(idx, excl_arr)
        if include is not None:
            keep &= np.isin(idx, incl_arr)
        offset += n
        if keep.all():
            yield batch.select(names)
        elif keep.any():
            yield batch.select(names).filter(pa.array(keep))


def _arrow_filter_expr(filters: Sequence, schema=None):
    """Translate pushed Spark filters (ANDed) into one pyarrow dataset
    expression, or None. Only filters accepted by
    :func:`_filter_translatable` reach here.

    Datetime literals normalize against the DECLARED column type
    (arrow refuses naive↔aware timestamp comparisons): the session tz
    is pinned UTC engine-wide, so a naive literal against an LTZ
    column gains tzinfo=UTC and an aware literal against an NTZ
    column converts to its UTC wall time — both value-preserving
    under that pin."""
    import pyarrow.dataset as pds
    from pyspark.sql.datasource import (
        EqualTo, GreaterThan, GreaterThanOrEqual, In, IsNotNull,
        IsNull, LessThan, LessThanOrEqual, StringStartsWith,
    )

    def _norm(value, colname):
        import datetime as _dt

        if not isinstance(value, _dt.datetime) or schema is None:
            return value
        try:
            t = schema[colname].dataType.simpleString()
        except Exception:
            return value
        if t == "timestamp" and value.tzinfo is None:
            return value.replace(tzinfo=_dt.timezone.utc)
        if t == "timestamp_ntz" and value.tzinfo is not None:
            return value.astimezone(_dt.timezone.utc).replace(
                tzinfo=None
            )
        return value

    expr = None
    for f in filters:
        col = pds.field(*f.attribute)
        name = f.attribute[0]
        if isinstance(f, EqualTo):
            e = col == _norm(f.value, name)
        elif isinstance(f, GreaterThan):
            e = col > _norm(f.value, name)
        elif isinstance(f, GreaterThanOrEqual):
            e = col >= _norm(f.value, name)
        elif isinstance(f, LessThan):
            e = col < _norm(f.value, name)
        elif isinstance(f, LessThanOrEqual):
            e = col <= _norm(f.value, name)
        elif isinstance(f, In):
            e = col.isin([_norm(v, name) for v in f.value])
        elif isinstance(f, IsNull):
            e = col.is_null()
        elif isinstance(f, IsNotNull):
            e = ~col.is_null()
        elif isinstance(f, StringStartsWith):
            import pyarrow.compute as pc

            e = pc.starts_with(col, f.value)
        else:  # pragma: no cover — _filter_translatable gates this
            continue
        expr = e if expr is None else (expr & e)
    return expr


def _filter_translatable(f, schema=None) -> bool:
    """True when the filter maps 1:1 onto a pyarrow dataset expression
    with identical row-drop semantics. Conservative: anything outside
    the known set (including None-valued comparisons, whose SQL
    three-valued logic arrow matches but is not worth relying on)
    stays Spark-side only.

    NaN divergence: Spark orders NaN GREATER than every value
    (``NaN > x`` is true, ``NaN = NaN`` is true) while arrow's
    comparisons are IEEE (NaN compares false) — an arrow-side drop of
    a NaN row is unrecoverable because Spark only re-FILTERS what the
    scan returned. So ``>``/``>=`` on float/double columns, and any
    comparison against a NaN literal, stay Spark-side; ``<``/``<=``
    and equality with non-NaN literals agree in both engines."""
    from pyspark.sql.datasource import (
        EqualTo, GreaterThan, GreaterThanOrEqual, In, IsNotNull,
        IsNull, LessThan, LessThanOrEqual, StringStartsWith,
    )

    def _is_nan(v) -> bool:
        return isinstance(v, float) and v != v

    def _float_col() -> bool:
        if schema is None:
            return True  # unknown type: assume the unsafe case
        try:
            t = schema[f.attribute[0]].dataType.simpleString()
        except Exception:
            return True
        return t in ("float", "double")

    if isinstance(f, (IsNull, IsNotNull)):
        return len(f.attribute) == 1
    if isinstance(f, In):
        return len(f.attribute) == 1 and all(
            v is not None and not _is_nan(v) for v in f.value
        )
    if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
        # Spark keeps NaN rows for these; arrow would drop them
        return (
            len(f.attribute) == 1
            and f.value is not None
            and not _is_nan(f.value)
            and not _float_col()
        )
    if isinstance(
        f,
        (EqualTo, LessThan, LessThanOrEqual, StringStartsWith),
    ):
        return (
            len(f.attribute) == 1
            and f.value is not None
            and not _is_nan(f.value)
        )
    return False


class PyStoreBatchReader(DataSourceReader):
    """Batch reader with filter pushdown (Spark 4.1 Python Data Source
    API; requires ``spark.sql.python.filterPushdown.enabled``, which
    :func:`register` turns on). Pushed filters prune parquet row
    groups on footer statistics and drop rows arrow-side before any
    bytes cross into the JVM. Spark still re-evaluates every filter
    post-scan (``pushFilters`` returns them all) — the pushdown is a
    data-reduction fast path, never a semantics owner, so subtle
    engine differences (collations, NaN ordering) cannot change
    results. COLUMN pruning has no Python-API hook in this Spark
    version — the reader is handed the full declared schema even when
    the query selects fewer columns; use ``Item.data`` (the parquet
    scan with native pruning) for the batch hot path and this source
    for streaming (README notes the trade)."""

    def __init__(self, options: dict, schema: "StructType") -> None:
        from pystore_spark import dv as dvm
        from pystore_spark import manifest as mf

        if (options.get("mode") or "").lower() == "cdc":
            # the cdc change feed is a STREAMING contract (version
            # windows); a batch scan of one pinned version has no
            # change rows to type — fail at plan time instead of an
            # executor-side missing-column error
            raise ValueError(
                "option mode=cdc is streaming-only — use "
                "spark.readStream.format('pystore'), or batch-read "
                "the change feed via Collection.changes()"
            )
        self._schema = schema
        self._item_dir = _item_dir(options)
        # pin the manifest NOW: every partition of this scan reads one
        # consistent version, however long the job runs.
        # option("version", N) pins a HISTORICAL version instead —
        # time travel through the source, same availability rule as
        # Item(version=): the version's files must survive in the
        # live ∪ stale-retained set, and its dv map (the mask AS OF
        # that version) applies, so pre-delete versions show the rows
        man = _manifest(self._item_dir, _version_opt(options))
        base = mf.base_dir(self._item_dir, man)
        dv = dvm.dv_map(man)
        self._dv_base = str(base)
        self._parts = [
            (
                str(base / rel),
                rel,
                (dv.get(rel) or {}).get("ref"),
            )
            for rel in sorted(man.get("files") or [])
        ]
        # driver-side pruning inputs for partitions(): the per-file
        # zonemap and, for time layouts, the bucket freq + index
        # columns that let index predicates prune whole hive buckets
        self._man_stats = man.get("stats") or {}
        meta = man.get("metadata") or {}
        pplan = meta.get("_partition_plan") or {}
        self._plan_freq = (
            pplan.get("freq")
            if pplan.get("strategy") == "time"
            else None
        )
        from pystore_spark.pandas_compat import (
            META_KEY as _PMETA_KEY,
            index_columns,
        )

        self._index_cols = index_columns(meta.get(_PMETA_KEY))
        # one driver-side read per dv dir: small masks ship with
        # their partitions instead of each executor task rescanning
        # the shared dir
        self._dv_entries = [
            (rel, e.get("ref"), int(e.get("n", 0)))
            for rel, e in dv.items()
        ]
        self._shipped_cache: dict[
            "frozenset[str] | None", dict
        ] = {}
        self._pushed: list = []

    def _shipped_for(self, keep: "set[str] | None") -> dict:
        """Driver-side dv-position shipping, AFTER file pruning:
        masks are fetched only for the masked files the scan will
        actually read (a pruned one-day read of a 10k-file item must
        not pay hundreds of mask-dir GETs at plan time). Cached BY
        keep-set — partitions() may be invoked more than once per
        scan, and a re-plan with a different pruning outcome must not
        reuse a narrower fetch (a stale cache would omit masks for
        files that now survive, resurrecting dv-deleted rows)."""
        key = None if keep is None else frozenset(keep)
        hit = self._shipped_cache.get(key)
        if hit is None:
            hit = self._shipped_cache[key] = _ship_positions(
                self._item_dir,
                [
                    e
                    for e in self._dv_entries
                    if keep is None or e[0] in keep
                ],
                base=self._dv_base,
            )
        return hit

    def pushFilters(self, filters):
        # keep the picklable Filter dataclasses on self (the arrow
        # expression builds per-partition in read()); yield every
        # filter back so Spark re-applies them post-scan
        for f in filters:
            if _filter_translatable(f, self._schema):
                self._pushed.append(f)
            yield f

    def _pruned_rels(self) -> "set[str] | None":
        """Driver-side FILE pruning from the pushed filters — the same
        manifest zonemap + hive-bucket rules Item reads use
        (manifest.prune_files): index predicates derive ``_pb`` bucket
        terms for time layouts, zonemapped columns prune on per-file
        min/max. Returns the surviving rel set, or None (keep all)
        when nothing prunes. Sound because pushed filters are an AND
        conjunction and prune_files only drops files NO term can
        match; Spark re-applies every filter post-scan regardless."""
        if not self._pushed:
            return None
        from pyspark.sql.datasource import (
            EqualTo, GreaterThan, GreaterThanOrEqual, In, LessThan,
            LessThanOrEqual,
        )

        ops = {
            EqualTo: "==", GreaterThan: ">",
            GreaterThanOrEqual: ">=", LessThan: "<",
            LessThanOrEqual: "<=", In: "in",
        }
        conj = []
        for f in self._pushed:
            op = ops.get(type(f))
            if op is None:
                continue
            v = list(f.value) if isinstance(f, In) else f.value
            conj.append((f.attribute[0], op, v))
        if not conj:
            return None
        if self._plan_freq and self._index_cols:
            from pystore_spark.item import _prune_tuples

            conj = (
                _prune_tuples(conj, self._plan_freq, self._index_cols)
                or conj
            )
        from pystore_spark import manifest as mf

        rels = [rel for _, rel, _ in self._parts]
        kept = mf.prune_files(rels, conj, stats=self._man_stats)
        return set(kept) if len(kept) < len(rels) else None

    def partitions(self) -> Sequence[InputPartition]:
        keep = self._pruned_rels()
        shipped = self._shipped_for(keep)
        return [
            FilePartition(
                p, rel=rel, mask_ref=ref,
                positions=shipped.get(rel),
            )
            for p, rel, ref in self._parts
            if keep is None or rel in keep
        ]

    def read(self, partition: FilePartition) -> Iterator:
        if partition.mask_ref:
            # deletion-vector-masked file: positional read (mask
            # exclusion needs row alignment, so no arrow-side filter;
            # Spark re-applies every filter post-scan regardless)
            yield from _read_file_batches_positional(
                partition.path,
                self._item_dir,
                self._schema,
                exclude=set(partition.positions)
                if partition.positions is not None
                else _dv_positions(
                    self._item_dir, partition.mask_ref, partition.rel,
                    base=self._dv_base,
                ),
            )
            return
        expr = (
            _arrow_filter_expr(self._pushed, self._schema)
            if self._pushed
            else None
        )
        yield from _read_file_batches(
            partition.path, self._item_dir, self._schema, expr
        )


class PyStoreStreamReader(DataSourceStreamReader):
    """Manifest versions as offsets.

    * ``mode=append`` (default): micro-batches read exactly the files
      ADDED between two committed versions; a rewrite in the window
      raises (the append-only contract).
    * ``mode=cdc``: a Delta-CDF-style change feed — every row carries
      ``_change_type``. Appends emit ``insert`` rows from added files;
      a rewrite (compaction, delete_where, upsert) emits ``delete``
      rows from the REMOVED files and ``insert`` rows from the added
      ones, so a keyed downstream merge reconverges instead of the
      stream dying. File-level granularity: a rewrite that carries
      rows over unchanged emits them as a delete+insert pair of equal
      values — noisy but exactly convergent under keyed apply (the
      same contract ``Collection.apply_changes`` consumes). Removed
      files stay readable as long as time travel keeps them (stale
      retention) — a checkpoint lagging past GC retention fails
      loudly rather than silently skipping deletes."""

    def __init__(self, options: dict, schema: "StructType") -> None:
        self._schema = schema
        self._item_dir = _item_dir(options)
        self._mode = str(options.get("mode", "append")).lower()
        if self._mode not in ("append", "cdc"):
            raise ValueError(
                f"mode must be 'append' or 'cdc', got {self._mode!r}"
            )
        if options.get("version") not in (None, ""):
            # a pinned historical version is a BATCH contract —
            # streams advance through versions via startingversion
            raise ValueError(
                "option version= is batch-only (time travel); "
                "streams use startingversion="
            )
        raw = str(options.get("startingversion", "0")).lower()
        if raw == "earliest":
            self._start_version = 0
        elif raw == "latest":
            self._start_version = None  # resolved at initialOffset
        else:
            try:
                self._start_version = int(raw)
            except ValueError:
                raise ValueError(
                    "startingVersion must be a version number, "
                    f"'earliest' (=0) or 'latest'; got {raw!r}"
                ) from None

    def initialOffset(self) -> dict:
        if self._start_version is None:  # latest
            return {
                "version": int(
                    _manifest(self._item_dir).get("version", 0)
                )
            }
        return {"version": int(self._start_version)}

    def latestOffset(self) -> dict:
        return {
            "version": int(_manifest(self._item_dir).get("version", 0))
        }

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        from pystore_spark import dv as dvm
        from pystore_spark import manifest as mf

        v0, v1 = int(start["version"]), int(end["version"])
        if v1 < v0:
            raise ValueError(
                f"offset went backwards (v{v0} -> v{v1}) for "
                f"{self._item_dir!r}: the item's version chain was "
                "reset (deleted and recreated?). Delete the "
                "checkpoint to restart the stream from the new chain."
            )
        if v1 == v0:
            return []
        man0 = _manifest(self._item_dir, version=v0)
        man1 = _manifest(self._item_dir, version=v1)
        base0 = mf.base_dir(self._item_dir, man0)
        base1 = mf.base_dir(self._item_dir, man1)
        dv0, dv1 = dvm.dv_map(man0), dvm.dv_map(man1)
        rels0 = list(man0.get("files") or [])
        rels1 = list(man1.get("files") or [])
        set0, set1 = set(rels0), set(rels1)

        def ref(dv: dict, rel: str) -> str | None:
            return (dv.get(rel) or {}).get("ref")

        if self._mode == "cdc":
            # removed files stream their VISIBLE-at-v0 rows as deletes
            # (positions already masked at v0 were deleted in an
            # earlier window); added files stream their visible-at-v1
            # rows as inserts (appended-then-dv-deleted rows never
            # existed downstream); a carried file whose dv entry
            # changed emits ONLY the newly-masked positions as deletes
            # — masks only grow (dv.py), so mask_v1 ⊇ mask_v0.
            # The one operation that SHRINKS a carried file's mask is
            # restore() to a pre-delete version: the rows it
            # resurrects cannot be expressed as row-level deltas
            # (there is no insert source for positions downstream
            # already dropped), so detect it and fail loudly instead
            # of silently emitting nothing.
            shrunk = [
                r
                for r in sorted(set0 & set1)
                if int((dv0.get(r) or {}).get("n", 0))
                > int((dv1.get(r) or {}).get("n", 0))
            ]
            if shrunk:
                raise ValueError(
                    f"versions {v0}..{v1} of {self._item_dir!r} "
                    f"SHRINK the deletion-vector mask of {shrunk} — "
                    "a restore() resurrected masked rows, which a "
                    "cdc stream cannot replay as deltas; restart the "
                    "stream from a fresh checkpoint or reconcile in "
                    "batch via Collection.changes(mode='exact')"
                )
            removed = sorted(set0 - set1)
            delta = [
                r for r in sorted(set0 & set1)
                if dv0.get(r) != dv1.get(r)
            ]
            added = [r for r in rels1 if r not in set0]
            # driver-side position shipping: each referenced dv dir
            # reads once here instead of once per executor task
            ship0 = _ship_positions(
                self._item_dir,
                [
                    (r, ref(dv0, r), int((dv0.get(r) or {}).get("n", 0)))
                    for r in removed
                ],
                base=str(base0),
            )
            ship1 = _ship_positions(
                self._item_dir,
                [
                    (r, ref(dv1, r), int((dv1.get(r) or {}).get("n", 0)))
                    for r in delta + added
                ],
                base=str(base1),
            )
            ship_prev = _ship_positions(
                self._item_dir,
                [
                    (r, ref(dv0, r), int((dv0.get(r) or {}).get("n", 0)))
                    for r in delta
                    if r in ship1  # only useful when cur also shipped
                ],
                base=str(base1),
            )
            parts: list[FilePartition] = [
                FilePartition(
                    str(base0 / r), "delete", rel=r,
                    mask_ref=ref(dv0, r), dv_base=str(base0),
                    positions=ship0.get(r),
                )
                for r in removed
            ]
            parts += [
                FilePartition(
                    str(base1 / r), "delete", rel=r,
                    mask_ref=ref(dv1, r),
                    base_mask_ref=ref(dv0, r),
                    kind="dv_delta", dv_base=str(base1),
                    # the delta itself ships when both sides resolved
                    positions=tuple(sorted(
                        set(ship1[r]) - set(ship_prev.get(r, ()))
                    ))
                    if r in ship1
                    and (not ref(dv0, r) or r in ship_prev)
                    else None,
                )
                for r in delta
            ]
            parts += [
                FilePartition(
                    str(base1 / r), "insert", rel=r,
                    mask_ref=ref(dv1, r), dv_base=str(base1),
                    positions=ship1.get(r),
                )
                for r in added
            ]
            return parts
        dv_drift = any(dv0.get(r) != dv1.get(r) for r in set0 & set1)
        if not set0 <= set1 or dv_drift:
            raise ValueError(
                f"versions {v0}..{v1} of {self._item_dir!r} include a "
                "rewrite (compaction/delete/upsert"
                + (", or a deletion-vector delete" if dv_drift else "")
                + ") — a stream reads append-only windows; reconcile "
                "rewrites in batch via Collection.changes(mode='auto'),"
                " or stream the change feed with .option('mode', 'cdc')"
            )
        added = [r for r in rels1 if r not in set0]
        ship = _ship_positions(
            self._item_dir,
            [
                (r, ref(dv1, r), int((dv1.get(r) or {}).get("n", 0)))
                for r in added
            ],
            base=str(base1),
        )
        return [
            FilePartition(
                str(base1 / r), rel=r, mask_ref=ref(dv1, r),
                dv_base=str(base1), positions=ship.get(r),
            )
            for r in added
        ]

    def _batches(self, partition: FilePartition, schema):
        """Partition rows honoring its deletion-vector fields."""
        b = partition.dv_base or None
        if partition.kind == "dv_delta":
            if partition.positions is not None:
                include = set(partition.positions)  # driver-resolved
            else:
                cur = _dv_positions(
                    self._item_dir, partition.mask_ref, partition.rel,
                    base=b,
                )
                prev = _dv_positions(
                    self._item_dir, partition.base_mask_ref,
                    partition.rel, base=b,
                )
                lost = prev - cur
                if lost:  # backstop of the planner's shrink check
                    raise ValueError(
                        f"{partition.rel}: deletion-vector mask "
                        f"shrank inside a cdc window ({len(lost)} "
                        "positions resurrected by a restore) — "
                        "restart the stream from a fresh checkpoint"
                    )
                include = cur - prev
            yield from _read_file_batches_positional(
                partition.path, self._item_dir, schema,
                include=include,
            )
            return
        if partition.mask_ref:
            yield from _read_file_batches_positional(
                partition.path,
                self._item_dir,
                schema,
                exclude=set(partition.positions)
                if partition.positions is not None
                else _dv_positions(
                    self._item_dir, partition.mask_ref, partition.rel,
                    base=b,
                ),
            )
            return
        yield from _read_file_batches(
            partition.path, self._item_dir, schema
        )

    def read(self, partition: FilePartition) -> Iterator:
        if self._mode == "cdc":
            import pyarrow as pa
            from pyspark.sql.types import StructType as _St

            data_schema = _St(
                [
                    f
                    for f in self._schema.fields
                    if f.name != CDC_COL
                ]
            )
            for batch in self._batches(partition, data_schema):
                yield batch.append_column(
                    CDC_COL,
                    pa.array(
                        [partition.change_type] * batch.num_rows,
                        pa.string(),
                    ),
                )
            return
        yield from self._batches(partition, self._schema)

    def commit(self, end: dict) -> None:
        pass  # offsets are replayable version manifests; nothing to ack


class PyStoreDataSource(DataSource):
    """``format("pystore")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> "StructType":
        item_dir = _item_dir(self.options)
        if str(self.options.get("mode", "append")).lower() == "cdc":
            from pyspark.sql.types import StringType, StructField

            base = self._data_schema(item_dir)
            return type(base)(
                list(base.fields)
                + [StructField(CDC_COL, StringType(), False)]
            )
        return self._data_schema(item_dir)

    def _data_schema(self, item_dir: str) -> "StructType":
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        files = _abs_files(
            item_dir, _manifest(item_dir, _version_opt(self.options))
        )
        if not files:
            raise ValueError(f"item at {item_dir!r} has no data files")
        return from_arrow_schema(
            pq.read_schema(files[0], filesystem=_pa_fs(item_dir))
        )

    def reader(self, schema: "StructType") -> PyStoreBatchReader:
        return PyStoreBatchReader(dict(self.options), schema)

    def streamReader(self, schema: "StructType") -> PyStoreStreamReader:
        return PyStoreStreamReader(dict(self.options), schema)


def register(spark) -> None:
    """Register ``format("pystore")`` with the session (idempotent).

    Also enables ``spark.sql.python.filterPushdown.enabled`` — Spark
    4.1 refuses to plan a Python data source whose reader implements
    ``pushFilters`` while the conf is off, and the conf is
    runtime-settable, so turning it on here keeps one registration
    call sufficient."""
    try:
        spark.conf.set(
            "spark.sql.python.filterPushdown.enabled", "true"
        )
    except Exception:
        # builds without the conf: reads will surface Spark's explicit
        # DATA_SOURCE_PUSHDOWN_DISABLED error, which names the fix
        pass
    spark.dataSource.register(PyStoreDataSource)


def source_options(collection, item: str) -> dict:
    """The option dict addressing ``item`` of this collection —
    convenience for ``.options(**source_options(col, "it"))``."""
    from pathlib import Path

    store_dir = Path(collection.datastore)
    return {
        "path": str(store_dir.parent),
        "store": store_dir.name,
        "collection": collection.collection,
        "item": item,
    }
