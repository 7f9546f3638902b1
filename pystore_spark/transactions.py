"""Transactions, batch transactions, and collection locks.

Reference: pystore/transactions.py:41-362. These are driver-side
protocols over the item directory layout:

* ``Transaction`` — ordered write/append/delete ops with per-item
  backups (hard-linked trees, O(metadata)) and rollback-on-error.
* ``BatchTransaction`` — dedups ops per item, applies deletes →
  writes → appends, pre-merging multiple appends with ``unionByName``.
* ``CollectionLock`` — atomic-mkdir lease with a uuid owner file,
  timeout/retry (works on any FS with atomic mkdir).
"""

from __future__ import annotations

import json
import time
import uuid
from pathlib import Path
from typing import Any

import pandas as pd

from pystore_spark import utils
from pystore_spark.exceptions import TransactionError


class Transaction:
    def __init__(self, collection):
        self.collection = collection
        self.ops: list[tuple[str, str, Any, dict]] = []
        self._backups: dict[str, Path | None] = {}
        self._token = uuid.uuid4().hex[:8]
        self.active = False
        self.committed = False

    # --- op staging -------------------------------------------------
    def write(self, item: str, data, **kwargs) -> "Transaction":
        self.ops.append(("write", item, data, kwargs))
        return self

    def append(self, item: str, data, **kwargs) -> "Transaction":
        self.ops.append(("append", item, data, kwargs))
        return self

    def delete(self, item: str, **kwargs) -> "Transaction":
        self.ops.append(("delete", item, None, kwargs))
        return self

    # --- protocol ---------------------------------------------------
    def _backup(self, item: str) -> None:
        if item in self._backups:
            return
        fs = self.collection.fs
        src = self.collection._item_path(item)
        if not fs.exists(src):
            self._backups[item] = None
            return
        dst = self.collection.path / f".__txn_{self._token}_{item}"
        utils.link_tree(src, dst)
        self._backups[item] = dst

    def _restore_all(self) -> None:
        fs = self.collection.fs
        for item, bkp in self._backups.items():
            target = self.collection._item_path(item)
            utils.rm_tree(target)
            if bkp is not None and fs.exists(bkp):
                # local: one rename; object stores: per-object
                # copy+delete of the backup tree (rollback is a
                # writer-side recovery path — readers resolve through
                # manifests and never observe the intermediate state)
                fs.move_prefix(bkp, target)
        self._backups.clear()
        self.collection.clear_metadata_cache()

    def _cleanup(self) -> None:
        for bkp in self._backups.values():
            if bkp is not None:
                utils.rm_tree(bkp)
        self._backups.clear()

    def commit(self) -> None:
        try:
            for op, item, data, kwargs in self.ops:
                self._backup(item)
                if op == "write":
                    kwargs.setdefault("overwrite", True)
                    self.collection.write(item, data, **kwargs)
                elif op == "append":
                    self.collection.append(item, data, **kwargs)
                elif op == "delete":
                    if self.collection.item_exists(item):
                        self.collection.delete_item(item)
        except Exception as exc:
            self._restore_all()
            raise TransactionError(f"transaction rolled back: {exc}") from exc
        else:
            self._cleanup()
            self.committed = True
        finally:
            self.ops.clear()
            self.active = False

    def rollback(self) -> None:
        self._restore_all()
        self.ops.clear()
        self.active = False


class BatchTransaction(Transaction):
    """Dedups/merges ops per item before applying (reference:
    pystore/transactions.py:184-245): deletes first, then writes, then
    appends; multiple appends to one item pre-merged into one."""

    def commit(self) -> None:
        deletes: list[str] = []
        writes: dict[str, tuple[Any, dict]] = {}
        appends: dict[str, list[tuple[Any, dict]]] = {}
        for op, item, data, kwargs in self.ops:
            if op == "delete":
                deletes.append(item)
                writes.pop(item, None)
                appends.pop(item, None)
            elif op == "write":
                writes[item] = (data, kwargs)
                appends.pop(item, None)
            elif op == "append":
                appends.setdefault(item, []).append((data, kwargs))

        merged_ops: list[tuple[str, str, Any, dict]] = []
        for item in deletes:
            merged_ops.append(("delete", item, None, {}))
        for item, (data, kwargs) in writes.items():
            merged_ops.append(("write", item, data, kwargs))
        for item, chunks in appends.items():
            if len(chunks) == 1:
                data, kwargs = chunks[0]
            else:
                frames = [c[0] for c in chunks]
                kwargs = chunks[0][1]
                if all(isinstance(f, pd.DataFrame) for f in frames):
                    from pystore_spark.arrow_path import concat_live

                    data = concat_live(frames, ignore_index=False)
                else:
                    data = frames[0]
                    for f in frames[1:]:
                        data = data.unionByName(f, allowMissingColumns=True)
            merged_ops.append(("append", item, data, kwargs))
        self.ops = merged_ops
        super().commit()


class transaction:
    """Context manager (reference: pystore/transactions.py:248-266):
    commits on clean exit, rolls back staged backups on exception."""

    def __init__(self, collection, batch: bool = False):
        self.txn = (BatchTransaction if batch else Transaction)(collection)

    def __enter__(self) -> Transaction:
        self.txn.active = True
        return self.txn

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is not None:
            self.txn.rollback()
            return False
        if not self.txn.committed:
            self.txn.commit()
        return False


class CollectionLock:
    """mkdir-based lease (reference: pystore/transactions.py:289-362).

    The exclusive-create primitive routes through the filesystem
    abstraction: ``os.mkdir`` locally, a conditional put
    (If-None-Match) of a marker object on object-store backends —
    see fs.FileSystem.mkdir_exclusive."""

    def __init__(
        self,
        collection,
        name: str = "collection",
        timeout: float = 30.0,
        retry_interval: float = 0.1,
        stale_after: float = 300.0,
    ):
        from pystore_spark.fs import fs_for

        self.lock_dir = Path(collection.path) / f".__lock_{name}"
        self.fs = getattr(collection, "fs", None) or fs_for(self.lock_dir)
        self.owner = uuid.uuid4().hex
        self.timeout = timeout
        self.retry_interval = retry_interval
        self.stale_after = stale_after
        self.held = False

    def _read_owner(self) -> dict:
        return json.loads(self.fs.read_bytes(self.lock_dir / "owner.json"))

    def acquire(self) -> bool:
        deadline = time.monotonic() + self.timeout
        while True:
            try:
                self.fs.mkdir_exclusive(self.lock_dir)
                # atomic owner-file publication: a reader must never
                # observe a partially written owner.json (it would look
                # corrupt and justify breaking a live lock)
                self.fs.put_atomic(
                    self.lock_dir / "owner.json",
                    json.dumps(
                        {"owner": self.owner, "acquired": time.time()}
                    ).encode(),
                )
                self.held = True
                return True
            except FileExistsError:
                self._break_if_stale()
                if time.monotonic() >= deadline:
                    raise TransactionError(
                        f"could not acquire lock {self.lock_dir.name} within "
                        f"{self.timeout}s"
                    )
                time.sleep(self.retry_interval)

    def _claim_break(self, judged: dict | None) -> None:
        """Break the lock in place, serialized by a breaker lock.

        A rename-to-tombstone protocol (break by moving the dir away,
        restore if it turns out fresh) cannot restore safely: while
        the dir is renamed away a third process can acquire, and the
        restore then clobbers or orphans that fresh lock. Instead,
        breaking itself is a critical section: only the waiter holding
        the ``.breaker`` mkdir-lock may delete, and it re-validates
        (same owner as judged stale AND still past the TTL) before
        removing the dir in place. A new holder can only appear while
        the lock dir is absent — i.e. strictly after a completed
        break — so a fresh lock is never destroyed. (A paused-process
        holder whose lease was legitimately broken still needs fencing
        tokens to be safe against; that is beyond any FS-only lock.)
        """
        breaker = self.lock_dir.with_name(self.lock_dir.name + ".breaker")
        try:
            self.fs.mkdir_exclusive(breaker)
        except (FileExistsError, OSError):
            # another waiter is breaking; clear the breaker itself if
            # its owner crashed mid-break, then let the retry loop spin
            try:
                if time.time() - self.fs.mtime(breaker) > max(
                    30.0, 10 * self.retry_interval
                ):
                    utils.rm_tree(breaker)
            except OSError:
                pass
            return
        try:
            try:
                info = self._read_owner()
                stale = (
                    time.time() - float(info.get("acquired", 0))
                    > self.stale_after
                )
                same = judged is None or info.get("owner") == judged.get(
                    "owner"
                )
                if not (stale and same):
                    return  # re-acquired since judgement — leave it
            except (OSError, ValueError, KeyError, TypeError):
                # unreadable owner.json: only break if the directory
                # itself outlived the stale window (crashed mid-acquire)
                try:
                    if (
                        time.time() - self.fs.mtime(self.lock_dir)
                        <= self.stale_after
                    ):
                        return
                except OSError:
                    return  # lock vanished — nothing to break
            # final identity re-check right before deletion: release()
            # serializes through this same breaker, so the dir cannot
            # be swapped for a fresh holder's while we hold it — but a
            # release that timed out waiting for a wedged breaker may
            # have deleted-and-let-reacquire, so read once more
            try:
                now_info = self._read_owner()
                if judged is not None and now_info.get("owner") != judged.get(
                    "owner"
                ):
                    return  # different (fresh) holder — leave it
            except (OSError, ValueError, KeyError, TypeError):
                pass
            utils.rm_tree(self.lock_dir)
        finally:
            utils.rm_tree(breaker)

    def _break_if_stale(self) -> None:
        try:
            info = self._read_owner()
            if time.time() - float(info.get("acquired", 0)) > self.stale_after:
                self._claim_break(info)
            return
        except (OSError, ValueError, KeyError, TypeError):
            pass
        # owner.json missing/unreadable: the holder may be mid-acquire —
        # break ONLY if the lock directory itself has been around longer
        # than the stale window (a crashed holder never published it)
        try:
            if time.time() - self.fs.mtime(self.lock_dir) > self.stale_after:
                self._claim_break(None)
        except OSError:
            pass

    def release(self) -> None:
        """Release the lease. Serializes with `_claim_break` through
        the same ``.breaker`` mkdir-lock, closing the TOCTOU where a
        stale-but-alive holder releases between a breaker's validation
        and its rm_tree, letting a third process acquire a lock the
        breaker then destroys. If the breaker stays wedged past a
        short deadline (its holder crashed mid-break), fall through
        with the ownership re-check only — full safety against paused
        processes needs fencing tokens, beyond any FS-only lock."""
        if not self.held:
            return
        self.held = False
        breaker = self.lock_dir.with_name(self.lock_dir.name + ".breaker")
        got_breaker = False
        deadline = time.monotonic() + max(2.0, 10 * self.retry_interval)
        while True:
            try:
                self.fs.mkdir_exclusive(breaker)
                got_breaker = True
                break
            except FileExistsError:
                if time.monotonic() >= deadline:
                    break
                time.sleep(self.retry_interval)
            except OSError:
                break
        try:
            # only delete a lock we still own — if our lease was broken
            # as stale and re-acquired by someone else, leave theirs
            try:
                if self._read_owner().get("owner") != self.owner:
                    return
            except (OSError, ValueError, KeyError, TypeError):
                return
            utils.rm_tree(self.lock_dir)
        finally:
            if got_breaker:
                utils.rm_tree(breaker)

    def __enter__(self) -> "CollectionLock":
        self.acquire()
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        self.release()
        return False
