"""Transactions, batch transactions, locks (reference spec:
tests/test_phase4_features.py:103-134, pystore/transactions.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from pystore_spark.exceptions import TransactionError
from pystore_spark.transactions import CollectionLock, transaction


def _frame(start="2024-01-01", n=5, v=0.0):
    idx = pd.date_range(start, periods=n, freq="D")
    return pd.DataFrame({"value": [v + i for i in range(n)]}, index=idx)


def test_transaction_commit(test_collection):
    with transaction(test_collection) as txn:
        txn.write("a", _frame())
        txn.append_called = False
    assert test_collection.item("a").to_pandas().shape[0] == 5


def test_transaction_rollback_on_error(test_collection):
    test_collection.write("a", _frame(v=1.0))
    with pytest.raises((TransactionError, RuntimeError)):
        with transaction(test_collection) as txn:
            txn.write("a", _frame(v=2.0), overwrite=True)
            txn.write("b", None)  # invalid data -> fails mid-commit
    out = test_collection.item("a").to_pandas()
    assert out["value"].iloc[0] == 1.0  # original restored
    assert not test_collection.item_exists("b")


def test_transaction_delete_and_restore(test_collection):
    test_collection.write("a", _frame())
    with pytest.raises((TransactionError, RuntimeError)):
        with transaction(test_collection) as txn:
            txn.delete("a")
            txn.write("bad", None)
    assert test_collection.item_exists("a")  # delete rolled back


def test_batch_transaction_merges_appends(test_collection):
    test_collection.write("a", _frame("2024-01-01", 3))
    with transaction(test_collection, batch=True) as txn:
        txn.append("a", _frame("2024-01-04", 3, v=10.0))
        txn.append("a", _frame("2024-01-07", 3, v=20.0))
    out = test_collection.item("a").to_pandas()
    assert len(out) == 9


def test_collection_lock(test_collection):
    with CollectionLock(test_collection, timeout=2.0) as lock:
        assert lock.held
        other = CollectionLock(test_collection, timeout=0.3)
        with pytest.raises(TransactionError):
            other.acquire()
    # released: can acquire again
    with CollectionLock(test_collection, timeout=2.0):
        pass


def test_concurrent_appends_serialized_by_lock(test_collection):
    import threading

    test_collection.write("shared", _frame("2024-01-01", 5))

    errors = []

    def appender(start, v):
        try:
            with CollectionLock(
                test_collection, name="shared", timeout=180.0
            ):
                test_collection.append("shared", _frame(start, 5, v))
        except Exception as exc:  # noqa: BLE001 — surfaced below
            errors.append(exc)

    threads = [
        threading.Thread(target=appender, args=("2024-02-01", 100.0)),
        threading.Thread(target=appender, args=("2024-03-01", 200.0)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    out = test_collection.item("shared").to_pandas()
    assert len(out) == 15  # both appends landed, none lost
    assert out.index.is_monotonic_increasing


def test_release_serializes_with_breaker(test_collection):
    """release() must not delete the lock while a breaker holds the
    critical section — and must still release after it clears."""
    import os
    import threading
    import time as _time

    from pystore_spark.transactions import CollectionLock

    lock = CollectionLock(test_collection, name="brk", stale_after=999)
    assert lock.acquire()
    breaker = lock.lock_dir.with_name(lock.lock_dir.name + ".breaker")
    os.mkdir(breaker)  # simulate an in-flight break

    released = threading.Event()

    def do_release():
        lock.release()
        released.set()

    t = threading.Thread(target=do_release, daemon=True)
    t.start()
    _time.sleep(0.3)
    assert not released.is_set()  # blocked on the breaker
    assert lock.lock_dir.exists()
    os.rmdir(breaker)  # break completes
    t.join(timeout=5)
    assert released.is_set()
    assert not lock.lock_dir.exists()


def test_sql_view_collision_raises(test_collection):
    import pandas as pd
    import pytest as _pytest

    df = pd.DataFrame({"v": [1.0]}, index=pd.DatetimeIndex(["2024-01-01"]))
    test_collection.write("a-b", df)
    test_collection.write("a_b", df)
    with _pytest.raises(ValueError, match="sanitize to"):
        test_collection.sql("SELECT * FROM a_b")
    # explicit subset avoids the collision
    out = test_collection.sql("SELECT * FROM a_b", items=["a_b"])
    assert out.count() == 1
    # digit-leading names get a stable prefix, reported by the mapping
    test_collection.write("1min", df)
    assert test_collection.sql_view_names(["1min"]) == {"1min": "i_1min"}
    assert test_collection.sql(
        "SELECT * FROM i_1min", items=["1min"]
    ).count() == 1
