"""Async wrappers around the engine (reference:
pystore/async_operations.py:38-209; spec tests/test_phase4_features.py:36-73).

Spark jobs are thread-safe per SparkSession, so the wrappers simply
run the blocking engine calls in an executor.
"""

from __future__ import annotations

import asyncio
from concurrent.futures import ThreadPoolExecutor
from contextlib import asynccontextmanager
from typing import Any


class AsyncCollection:
    def __init__(self, collection, max_workers: int = 4, pool=None):
        self.collection = collection
        # a pool handed in (AsyncStore's shared executor — reference
        # pystore/async_operations.py:155-160) is NOT owned here;
        # close() only shuts down a self-created pool
        self._owns_pool = pool is None
        self._pool = pool or ThreadPoolExecutor(max_workers=max_workers)

    async def _run(self, fn, *args, **kwargs):
        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(
            self._pool, lambda: fn(*args, **kwargs)
        )

    async def write(self, item: str, data: Any, **kwargs):
        return await self._run(self.collection.write, item, data, **kwargs)

    async def append(self, item: str, data: Any, **kwargs):
        return await self._run(self.collection.append, item, data, **kwargs)

    async def read(self, item: str, **kwargs):
        return await self._run(
            lambda: self.collection.item(item, **kwargs).to_pandas()
        )

    async def delete(self, item: str):
        return await self._run(self.collection.delete_item, item)

    async def list_items(self, **kwargs):
        return await self._run(self.collection.list_items, **kwargs)

    async def write_batch(self, items_data: dict, **kwargs):
        return await self._run(self.collection.write_batch, items_data, **kwargs)

    async def read_batch(self, items, **kwargs):
        return await self._run(self.collection.read_batch, items, **kwargs)

    async def parallel_append(self, appends: dict[str, Any], **kwargs):
        tasks = [
            self.append(item, data, **kwargs) for item, data in appends.items()
        ]
        return await asyncio.gather(*tasks)

    async def maintain(self, item: str | None = None, **kwargs):
        """Async nightly maintenance (GC + compact + stats + rollups);
        the natural overnight-job surface."""
        return await self._run(self.collection.maintain, item, **kwargs)

    async def compact(self, item: str, **kwargs):
        return await self._run(self.collection.compact, item, **kwargs)

    async def export_training_shards(self, export_item: str, source, **kwargs):
        """Async deterministic training-shard export — see
        Collection.export_training_shards."""
        return await self._run(
            self.collection.export_training_shards, export_item,
            source, **kwargs,
        )

    async def ingest(self, item: str, data: Any, **kwargs):
        """Async one-call curated ingest (pipeline stages +
        persistent-index dedup + append + funnel stamp) off the
        event loop — see Collection.ingest."""
        return await self._run(self.collection.ingest, item, data, **kwargs)

    async def append_dedup(
        self, item: str, data: Any, index_item: str, **kwargs
    ):
        """Async incremental near-dedup append (the daily-ingest
        call): probe the persistent index, drop corpus near-dups,
        append + delta-index survivors off the event loop."""
        return await self._run(
            self.collection.append_dedup, item, data, index_item,
            **kwargs,
        )

    async def analyze(self, item: str, **kwargs):
        return await self._run(
            self.collection.analyze_incremental, item, **kwargs
        )

    async def delete_where(self, item: str, filters, **kwargs):
        return await self._run(
            self.collection.delete_where, item, filters, **kwargs
        )

    async def update_where(self, item: str, filters, **kwargs):
        return await self._run(
            self.collection.update_where, item, filters, **kwargs
        )

    async def delete_range(self, item: str, **kwargs):
        return await self._run(
            self.collection.delete_range, item, **kwargs
        )

    async def verify_index(self, item: str, index_item: str, **kwargs):
        return await self._run(
            self.collection.verify_index, item, index_item, **kwargs
        )

    async def repair_index(self, item: str, index_item: str, **kwargs):
        return await self._run(
            self.collection.repair_index, item, index_item, **kwargs
        )

    # round-6 continuation surface: derived state + feeds — same
    # one-liner delegation, the pool is the async boundary
    async def create_matview(self, name: str, query: str, **kwargs):
        return await self._run(
            self.collection.create_matview, name, query, **kwargs
        )

    async def refresh_matview(self, name: str, **kwargs):
        return await self._run(
            self.collection.refresh_matview, name, **kwargs
        )

    async def matview_status(self, name: str):
        return await self._run(self.collection.matview_status, name)

    async def changes(self, item: str, since: int, **kwargs):
        return await self._run(
            self.collection.changes, item, since, **kwargs
        )

    async def history(self, item: str):
        return await self._run(self.collection.history, item)

    async def estimate_percentiles(self, item: str, column: str, **kwargs):
        return await self._run(
            self.collection.estimate_percentiles, item, column, **kwargs
        )

    async def export_webdataset(self, source, out_dir: str, **kwargs):
        return await self._run(
            self.collection.export_webdataset, source, out_dir, **kwargs
        )

    async def merge_into(self, item: str, source, on, **kwargs):
        return await self._run(
            self.collection.merge_into, item, source, on, **kwargs
        )

    def close(self) -> None:
        if self._owns_pool:
            self._pool.shutdown(wait=False)


class AsyncStore:
    """Async store wrapper with ONE shared executor across its
    collections; ``close()`` shuts it down for all of them (reference
    AsyncStore.close: pystore/async_operations.py:147-174)."""

    def __init__(self, store, max_workers: int = 4):
        self.store = store
        self.max_workers = max_workers
        self._pool = ThreadPoolExecutor(max_workers=max_workers)

    def collection(self, name: str) -> AsyncCollection:
        return AsyncCollection(
            self.store.collection(name),
            max_workers=self.max_workers,
            pool=self._pool,
        )

    async def list_collections(self):
        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(self._pool, self.store.list_collections)

    def close(self) -> None:
        """Shut down the shared executor (all collection wrappers from
        this store stop accepting work)."""
        self._pool.shutdown(wait=True)


@asynccontextmanager
async def async_pystore(obj):
    """Wrap a Store or Collection for async use (reference:
    pystore/async_operations.py:197-209)."""
    from pystore_spark.collection import Collection
    from pystore_spark.store import Store

    if isinstance(obj, Store):
        wrapped: Any = AsyncStore(obj)
    elif isinstance(obj, Collection):
        wrapped = AsyncCollection(obj)
    else:
        raise TypeError(f"cannot wrap {type(obj).__name__}")
    try:
        yield wrapped
    finally:
        wrapped.close()
