"""Filesystem abstraction for the driver-side storage protocol.

The manifest commit protocol (manifest.py) was designed for object
stores from the start: writers stage files under names readers never
resolve, and the only *atomic* operation the protocol needs is the
single-object replace of the manifest pointer. This module makes that
design executable against more than the local disk:

* :class:`LocalFileSystem` — pathlib/os implementation; the atomic
  manifest install is ``os.replace`` of one JSON file.
* :class:`FakeS3FileSystem` — an in-memory object store with **S3
  semantics**: no rename (``move`` is copy+delete, which the protocol
  only ever applies to staged, reader-invisible objects), no
  directories (prefixes only), strongly consistent list-after-write
  (as S3 is since 2020), and **conditional put** (``If-Match`` /
  ``If-None-Match:*`` ETag compare-and-swap, as S3 supports since
  2024) for the manifest pointer — the storage layer's tests run the
  full write/append/read/GC/snapshot protocol against it.

Paths stay ordinary ``pathlib.Path``/``str`` values everywhere in the
engine; a **mount table** maps path prefixes to filesystems, so call
sites do ``fs_for(path)`` and keep their path arithmetic. A
``fakes3://name`` warehouse root resolves to a virtual mount at
``/__fakes3__/name``.

Real cloud backends: implement :class:`FileSystem` (a boto3-backed S3
one maps 1:1 — ``put_atomic`` is ``PutObject`` with
``IfMatch``/``IfNoneMatch``, ``move`` is ``CopyObject``+``Delete``)
and :func:`mount` it; Spark-side data I/O additionally needs the
corresponding Hadoop connector on the executors' classpath, which this
environment does not ship, so ``resolve_warehouse`` rejects real cloud
schemes with an actionable message rather than half-working.
"""

from __future__ import annotations

import hashlib
import io
import os
import shutil
import threading
import time
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Any, BinaryIO

from pystore_spark.exceptions import ConcurrentCommitError

# sentinel: unconditional put (distinct from if_match=None, which means
# "require the object to NOT exist" — S3 If-None-Match: *)
UNCONDITIONAL = object()


class FileSystem(ABC):
    """Object-store-compatible storage primitives.

    The contract deliberately excludes rename-of-committed-data and
    directory atomicity — everything the manifest protocol needs maps
    onto plain object GET/PUT/LIST/DELETE plus one conditional put.
    """

    #: Spark's JVM readers/writers can scan paths on this filesystem
    spark_readable: bool = False

    # --- objects ------------------------------------------------------
    @abstractmethod
    def read_bytes(self, path: str | Path) -> bytes: ...

    @abstractmethod
    def open_read(self, path: str | Path) -> BinaryIO:
        """Random-access-capable reader (pyarrow-compatible)."""

    @abstractmethod
    def open_write(self, path: str | Path) -> BinaryIO:
        """Writer that commits as ONE object on close (single put)."""

    @abstractmethod
    def put_atomic(
        self, path: str | Path, data: bytes, if_match: Any = UNCONDITIONAL
    ) -> str:
        """Atomically install ``data`` at ``path``; returns the new
        ETag. ``if_match=UNCONDITIONAL`` always wins; ``None`` requires
        the object to not exist; an ETag string requires the current
        object to match — otherwise :class:`ConcurrentCommitError`."""

    @abstractmethod
    def etag(self, path: str | Path) -> str | None:
        """Current ETag, or None when the object doesn't exist."""

    @abstractmethod
    def exists(self, path: str | Path) -> bool:
        """Object exists, or (FS with directories / prefix stores)
        anything lives under the path."""

    @abstractmethod
    def size(self, path: str | Path) -> int: ...

    @abstractmethod
    def mtime(self, path: str | Path) -> float: ...

    @abstractmethod
    def delete(self, path: str | Path, missing_ok: bool = True) -> None: ...

    @abstractmethod
    def move(self, src: str | Path, dst: str | Path) -> None:
        """Move ONE staged (reader-invisible) object. Local: rename;
        object stores: copy+delete — never applied to committed data."""

    @abstractmethod
    def link_or_copy(self, src: str | Path, dst: str | Path) -> None:
        """Hard link when the FS supports it, else copy (snapshot
        materialization; object stores: server-side copy)."""

    # --- namespace ----------------------------------------------------
    @abstractmethod
    def mkdirs(self, path: str | Path) -> None:
        """Create directories (no-op on prefix-only object stores)."""

    @abstractmethod
    def mkdir_exclusive(self, path: str | Path) -> None:
        """Atomically create a directory marker, raising
        ``FileExistsError`` when it already exists — the lock
        primitive (local: ``os.mkdir``; object stores: conditional put
        If-None-Match of a marker object)."""

    @abstractmethod
    def isdir(self, path: str | Path) -> bool: ...

    @abstractmethod
    def list_files(self, prefix: str | Path, suffix: str = "") -> list[str]:
        """All file paths under ``prefix`` (recursive), optionally
        filtered by suffix. Returns absolute path strings, sorted."""

    @abstractmethod
    def list_subdirs(self, path: str | Path) -> list[str]:
        """Immediate child directory NAMES (object stores: distinct
        first path components under the prefix)."""

    @abstractmethod
    def remove_prefix(self, path: str | Path) -> None:
        """Recursive delete (``rm -rf`` / delete-by-prefix)."""

    def move_prefix(self, src: str | Path, dst: str | Path) -> None:
        """Move a staged/backup TREE. Local: one rename; object
        stores: per-object copy+delete (non-atomic — callers only use
        it on reader-invisible trees; documented in transactions.py)."""
        src, dst = str(src), str(dst)
        for f in self.list_files(src):
            rel = f[len(src) :].lstrip("/")
            self.move(f, str(Path(dst) / rel))
        self.remove_prefix(src)

    def prune_empty_dirs(self, path: str | Path) -> None:
        """Remove empty directories under ``path`` (no-op on prefix
        stores, which have no empty directories)."""

    def as_pyarrow_filesystem(self):
        """pyarrow ``FileSystem`` adapter for dataset reads, or None
        when plain local paths work."""
        return None


# ---------------------------------------------------------------------------
# local
# ---------------------------------------------------------------------------
def _md5(data: bytes) -> str:
    return hashlib.md5(data).hexdigest()


class LocalFileSystem(FileSystem):
    spark_readable = True

    def read_bytes(self, path):
        with open(path, "rb") as fh:
            return fh.read()

    def open_read(self, path):
        return open(path, "rb")

    def open_write(self, path):
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        return open(path, "wb")

    # Conditional-put mutual exclusion, two layers:
    #   * a per-path threading.Lock for writers INSIDE this process
    #     (write_threaded, AsyncCollection, concurrent ingest stamps)
    #     — cheap fairness, no fd churn on the hot in-process path;
    #   * an OS-level flock on a sidecar ``<name>.lock`` file for
    #     writers in OTHER processes (a second driver on the same
    #     warehouse). POSIX has no conditional rename, so without the
    #     flock two processes both pass the etag check and the loser
    #     silently clobbers the winner — the round-6 cross-process
    #     hammer (tests/test_manifest.py) measured 53/100 counter
    #     increments surviving under exactly that race. The lock file
    #     is tiny, permanent, and invisible to data listings (no
    #     .parquet/.json suffix). Object-store backends instead use
    #     their native conditional put (FakeS3 below; real S3 via
    #     If-Match/If-None-Match in an adapter).
    _cas_locks: dict[str, threading.Lock] = {}
    _cas_locks_guard = threading.Lock()

    @classmethod
    def _cas_lock(cls, p: Path) -> threading.Lock:
        key = str(p)
        with cls._cas_locks_guard:
            # one small Lock per distinct manifest path for the
            # process lifetime — never cleared, because evicting a
            # lock another thread still holds would reopen the race
            return cls._cas_locks.setdefault(key, threading.Lock())

    def put_atomic(self, path, data, if_match=UNCONDITIONAL):
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)

        def _install() -> str:
            # ONE write path for both branches — divergent commit
            # mechanics (tmp naming, fsync policy) would give
            # conditional and unconditional puts different durability
            tmp = p.with_name(
                p.name + f".tmp{os.getpid()}.{threading.get_ident()}"
            )
            with open(tmp, "wb") as fh:
                fh.write(data)
            os.replace(tmp, p)
            return _md5(data)

        def _checked_install() -> str:
            current = self.etag(p)
            if current != if_match:
                raise ConcurrentCommitError(
                    f"conditional put of {p} failed: expected "
                    f"{if_match!r}, found {current!r}"
                )
            return _install()

        if if_match is UNCONDITIONAL:
            return _install()
        with self._cas_lock(p):
            try:
                import fcntl
            except ImportError:  # pragma: no cover — non-POSIX hosts
                return _checked_install()
            with open(p.with_name(p.name + ".lock"), "a+b") as lf:
                fcntl.flock(lf.fileno(), fcntl.LOCK_EX)
                try:
                    return _checked_install()
                finally:
                    fcntl.flock(lf.fileno(), fcntl.LOCK_UN)

    def etag(self, path):
        try:
            return _md5(self.read_bytes(path))
        except OSError:
            return None

    def exists(self, path):
        return Path(path).exists()

    def size(self, path):
        return Path(path).stat().st_size

    def mtime(self, path):
        return Path(path).stat().st_mtime

    def delete(self, path, missing_ok=True):
        try:
            Path(path).unlink(missing_ok=missing_ok)
        except IsADirectoryError:
            raise
        except OSError:
            if not missing_ok:
                raise

    def move(self, src, dst):
        Path(dst).parent.mkdir(parents=True, exist_ok=True)
        try:
            os.replace(src, dst)
        except OSError:
            shutil.copy2(src, dst)
            Path(src).unlink(missing_ok=True)

    def link_or_copy(self, src, dst):
        Path(dst).parent.mkdir(parents=True, exist_ok=True)
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy2(src, dst)

    def mkdirs(self, path):
        Path(path).mkdir(parents=True, exist_ok=True)

    def mkdir_exclusive(self, path):
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        os.mkdir(path)

    def isdir(self, path):
        return Path(path).is_dir()

    def list_files(self, prefix, suffix=""):
        p = Path(prefix)
        if not p.exists():
            return []
        return sorted(
            str(f)
            for f in p.rglob("*")
            if f.is_file() and f.name.endswith(suffix)
        )

    def list_subdirs(self, path):
        p = Path(path)
        if not p.exists():
            return []
        return sorted(d.name for d in p.iterdir() if d.is_dir())

    def remove_prefix(self, path):
        shutil.rmtree(path, ignore_errors=True)

    def move_prefix(self, src, dst):
        Path(dst).parent.mkdir(parents=True, exist_ok=True)
        try:
            os.replace(src, dst)
        except OSError:
            super().move_prefix(src, dst)

    def prune_empty_dirs(self, path):
        root = Path(path)
        if not root.exists():
            return
        for d in sorted(
            (p for p in root.rglob("*") if p.is_dir()), reverse=True
        ):
            try:
                os.rmdir(d)  # fails (harmlessly) unless empty
            except OSError:
                pass


# ---------------------------------------------------------------------------
# fake S3
# ---------------------------------------------------------------------------
class _PutOnClose(io.BytesIO):
    def __init__(self, fs: "FakeS3FileSystem", key: str):
        super().__init__()
        self._fs, self._key = fs, key

    def close(self):
        if not self.closed:
            self._fs.put_atomic(self._key, self.getvalue())
        super().close()


class FakeS3FileSystem(FileSystem):
    """In-memory object store with S3 semantics (see module
    docstring). Thread-safe; used by the storage-layer tests to
    exercise the manifest protocol without rename or directories."""

    spark_readable = False
    DIR_MARKER = ".__dir__"

    def __init__(self):
        self._lock = threading.Lock()
        # key -> (bytes, etag, mtime)
        self._objects: dict[str, tuple[bytes, str, float]] = {}

    @staticmethod
    def _key(path) -> str:
        k = str(path).replace("\\", "/")
        while "//" in k:
            k = k.replace("//", "/")
        return k.rstrip("/")

    # --- objects ------------------------------------------------------
    def read_bytes(self, path):
        with self._lock:
            try:
                return self._objects[self._key(path)][0]
            except KeyError:
                raise FileNotFoundError(str(path)) from None

    def open_read(self, path):
        import pyarrow as pa

        return pa.BufferReader(self.read_bytes(path))

    def open_write(self, path):
        return _PutOnClose(self, self._key(path))

    def put_atomic(self, path, data, if_match=UNCONDITIONAL):
        key = self._key(path)
        etag = _md5(data)
        with self._lock:
            current = self._objects.get(key)
            if if_match is not UNCONDITIONAL:
                cur_etag = current[1] if current is not None else None
                if cur_etag != if_match:
                    raise ConcurrentCommitError(
                        f"conditional put of {key} failed: expected "
                        f"{if_match!r}, found {cur_etag!r}"
                    )
            self._objects[key] = (bytes(data), etag, time.time())
        return etag

    def etag(self, path):
        with self._lock:
            obj = self._objects.get(self._key(path))
            return obj[1] if obj is not None else None

    def exists(self, path):
        key = self._key(path)
        pfx = key + "/"
        with self._lock:
            if key in self._objects:
                return True
            return any(k.startswith(pfx) for k in self._objects)

    def size(self, path):
        with self._lock:
            try:
                return len(self._objects[self._key(path)][0])
            except KeyError:
                raise FileNotFoundError(str(path)) from None

    def mtime(self, path):
        key = self._key(path)
        pfx = key + "/"
        with self._lock:
            obj = self._objects.get(key)
            if obj is not None:
                return obj[2]
            # prefix ("directory") mtime: newest object under it
            times = [
                v[2] for k, v in self._objects.items() if k.startswith(pfx)
            ]
            if times:
                return max(times)
            raise FileNotFoundError(str(path))

    def delete(self, path, missing_ok=True):
        with self._lock:
            if self._objects.pop(self._key(path), None) is None:
                if not missing_ok:
                    raise FileNotFoundError(str(path))

    def move(self, src, dst):
        # S3 has no rename: copy + delete (staged objects only)
        skey, dkey = self._key(src), self._key(dst)
        with self._lock:
            try:
                data, _etag, _t = self._objects[skey]
            except KeyError:
                raise FileNotFoundError(str(src)) from None
            self._objects[dkey] = (data, _md5(data), time.time())
            del self._objects[skey]

    def link_or_copy(self, src, dst):
        # server-side copy
        data = self.read_bytes(src)
        self.put_atomic(dst, data)

    # --- namespace ----------------------------------------------------
    def mkdirs(self, path):
        pass  # prefixes need no creation

    def mkdir_exclusive(self, path):
        # conditional put If-None-Match:* of a marker object — atomic
        # create-if-absent, the object-store lock primitive
        try:
            self.put_atomic(
                str(Path(str(path)) / self.DIR_MARKER), b"", if_match=None
            )
        except ConcurrentCommitError:
            raise FileExistsError(str(path)) from None

    def isdir(self, path):
        key = self._key(path)
        pfx = key + "/"
        with self._lock:
            return any(k.startswith(pfx) for k in self._objects)

    def list_files(self, prefix, suffix=""):
        pfx = self._key(prefix) + "/"
        with self._lock:
            return sorted(
                k
                for k in self._objects
                if k.startswith(pfx)
                and k.endswith(suffix)
                and not k.endswith(self.DIR_MARKER)
            )

    def list_subdirs(self, path):
        pfx = self._key(path) + "/"
        out = set()
        with self._lock:
            for k in self._objects:
                if k.startswith(pfx):
                    rest = k[len(pfx) :]
                    if "/" in rest:
                        out.add(rest.split("/", 1)[0])
        return sorted(out)

    def remove_prefix(self, path):
        key = self._key(path)
        pfx = key + "/"
        with self._lock:
            for k in [
                k
                for k in self._objects
                if k == key or k.startswith(pfx)
            ]:
                del self._objects[k]

    def as_pyarrow_filesystem(self):
        import pyarrow.fs as pafs

        return pafs.PyFileSystem(_ArrowHandler(self))


import pyarrow.fs as _pafs


class _ArrowHandler(_pafs.FileSystemHandler):
    """Minimal pyarrow FileSystemHandler over a FakeS3FileSystem so
    ``pyarrow.dataset`` reads (the Arrow client path) run against the
    fake backend with pushdown intact."""

    def __init__(self, fs: FakeS3FileSystem):
        self.fs = fs

    def get_type_name(self):
        return "fakes3"

    def normalize_path(self, path):
        return FakeS3FileSystem._key(path)

    def get_file_info(self, paths):
        import pyarrow.fs as pafs

        out = []
        for p in paths:
            key = FakeS3FileSystem._key(p)
            with self.fs._lock:
                obj = self.fs._objects.get(key)
            if obj is not None:
                out.append(
                    pafs.FileInfo(
                        key,
                        type=pafs.FileType.File,
                        size=len(obj[0]),
                        mtime_ns=int(obj[2] * 1e9),
                    )
                )
            elif self.fs.isdir(key):
                out.append(pafs.FileInfo(key, type=pafs.FileType.Directory))
            else:
                out.append(pafs.FileInfo(key, type=pafs.FileType.NotFound))
        return out

    def get_file_info_selector(self, selector):
        import pyarrow.fs as pafs

        base = FakeS3FileSystem._key(selector.base_dir)
        pfx = base + "/"
        infos = []
        seen_dirs: set[str] = set()
        with self.fs._lock:
            items = list(self.fs._objects.items())
        for k, (data, _e, t) in items:
            if not k.startswith(pfx):
                continue
            rest = k[len(pfx) :]
            if not selector.recursive and "/" in rest:
                d = pfx + rest.split("/", 1)[0]
                if d not in seen_dirs:
                    seen_dirs.add(d)
                    infos.append(
                        pafs.FileInfo(d, type=pafs.FileType.Directory)
                    )
                continue
            if k.endswith(FakeS3FileSystem.DIR_MARKER):
                continue
            infos.append(
                pafs.FileInfo(
                    k,
                    type=pafs.FileType.File,
                    size=len(data),
                    mtime_ns=int(t * 1e9),
                )
            )
            if selector.recursive and "/" in rest:
                parts = rest.split("/")[:-1]
                acc = base
                for part in parts:
                    acc = acc + "/" + part
                    if acc not in seen_dirs:
                        seen_dirs.add(acc)
                        infos.append(
                            pafs.FileInfo(
                                acc, type=pafs.FileType.Directory
                            )
                        )
        return infos

    def open_input_stream(self, path):
        return self.fs.open_read(path)

    def open_input_file(self, path):
        return self.fs.open_read(path)

    def open_output_stream(self, path, metadata=None):
        import pyarrow as pa

        return pa.PythonFile(self.fs.open_write(path), mode="w")

    def open_append_stream(self, path, metadata=None):
        raise NotImplementedError("object stores do not append")

    def create_dir(self, path, recursive=True):
        pass

    def delete_dir(self, path):
        self.fs.remove_prefix(path)

    def delete_dir_contents(self, path, missing_dir_ok=False):
        self.fs.remove_prefix(path)

    def delete_root_dir_contents(self):
        raise NotImplementedError

    def delete_file(self, path):
        self.fs.delete(path, missing_ok=False)

    def move(self, src, dest):
        self.fs.move(src, dest)

    def copy_file(self, src, dest):
        self.fs.link_or_copy(src, dest)


# ---------------------------------------------------------------------------
# mount table + scheme dispatch
# ---------------------------------------------------------------------------
LOCAL = LocalFileSystem()

_MOUNTS: dict[str, FileSystem] = {}
_MOUNT_LOCK = threading.Lock()

FAKE_S3_ROOT = "/__fakes3__"

#: real cloud schemes the protocol supports by design but this
#: environment cannot execute (no cloud SDK / Hadoop connector baked in)
_CLOUD_SCHEMES = (
    "s3", "s3a", "s3n", "gs", "gcs", "abfs", "abfss", "wasb", "wasbs",
    "hdfs", "oss",
)


def mount(prefix: str, fs: FileSystem) -> None:
    """Route every path under ``prefix`` to ``fs``."""
    with _MOUNT_LOCK:
        _MOUNTS[str(prefix).rstrip("/")] = fs


def unmount(prefix: str) -> None:
    with _MOUNT_LOCK:
        _MOUNTS.pop(str(prefix).rstrip("/"), None)


def fs_for(path: str | Path) -> FileSystem:
    """Filesystem owning ``path`` — longest mount-prefix match, local
    by default. O(mounts), and mounts exist only for test/fake
    backends, so this adds nothing to the local hot path."""
    if not _MOUNTS:
        return LOCAL
    p = str(path)
    best: tuple[int, FileSystem] | None = None
    with _MOUNT_LOCK:
        for prefix, fs in _MOUNTS.items():
            if p == prefix or p.startswith(prefix + "/"):
                if best is None or len(prefix) > best[0]:
                    best = (len(prefix), fs)
    return best[1] if best else LOCAL


def resolve_warehouse(path: str) -> str:
    """Scheme dispatch for warehouse roots (replaces the old
    local-only guard):

    * plain / ``file://`` → expanduser, local filesystem;
    * ``fakes3://name[/sub]`` → an in-memory S3-semantics store,
      mounted at ``/__fakes3__/name`` (tests; driver-side only);
    * real cloud schemes → rejected with the adapter instructions
      (the protocol is object-store-ready; the SDK is not shipped);
    * anything else → ValueError, as before.
    """
    path = str(path)
    if path.startswith("fakes3://"):
        rest = path[len("fakes3://") :].strip("/")
        if not rest:
            raise ValueError("fakes3:// paths need a bucket name")
        bucket, _, sub = rest.partition("/")
        root = f"{FAKE_S3_ROOT}/{bucket}"
        with _MOUNT_LOCK:
            if root not in _MOUNTS:
                _MOUNTS[root] = FakeS3FileSystem()
        return f"{root}/{sub}" if sub else root
    m = path.split("://", 1)
    if len(m) == 2 and m[0] not in ("file",):
        scheme = m[0]
        if scheme in _CLOUD_SCHEMES:
            raise NotImplementedError(
                f"{scheme}:// warehouses need a cloud FileSystem adapter "
                "(implement pystore_spark.fs.FileSystem over the cloud "
                "SDK and fs.mount() it; Spark-side data I/O additionally "
                "needs the matching Hadoop connector on the classpath). "
                "The manifest commit protocol itself is object-store "
                "compatible — see fs.FakeS3FileSystem for the executable "
                "spec of the required semantics."
            )
        raise ValueError(
            "pystore_spark warehouse paths must be local/file paths or a "
            f"registered scheme; got {path!r}"
        )
    return os.path.expanduser(path.removeprefix("file://"))
