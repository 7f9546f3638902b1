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
    def __init__(self, collection, max_workers: int = 4):
        self.collection = collection
        self._pool = ThreadPoolExecutor(max_workers=max_workers)

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

    def close(self) -> None:
        self._pool.shutdown(wait=False)


class AsyncStore:
    def __init__(self, store, max_workers: int = 4):
        self.store = store
        self.max_workers = max_workers

    def collection(self, name: str) -> AsyncCollection:
        return AsyncCollection(
            self.store.collection(name), max_workers=self.max_workers
        )

    async def list_collections(self):
        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(None, self.store.list_collections)


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
        if isinstance(wrapped, AsyncCollection):
            wrapped.close()
