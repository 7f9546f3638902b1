"""Store: top-level namespace of collections.

Reference: pystore/store.py:32-98, pystore/utils.py:116-171.
All catalog operations are driver-side directory bookkeeping.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import SparkSession

from pystore_spark import config, utils
from pystore_spark.collection import Collection
from pystore_spark.exceptions import (
    CollectionExistsError,
    CollectionNotFoundError,
)
from pystore_spark.session import get_spark


class Store:
    def __init__(self, datastore: str, spark: SparkSession | None = None):
        from pystore_spark.fs import fs_for

        self.spark = spark or get_spark()
        root = utils.validate_path_local(config.get_path())
        self.datastore = Path(root) / datastore
        self.fs = fs_for(self.datastore)
        self.fs.mkdirs(self.datastore)
        meta = utils.read_metadata(self.datastore)
        if not meta:
            utils.write_metadata(
                self.datastore, {"engine": "pystore_spark", "type": "store"}
            )
        self.metadata = utils.read_metadata(self.datastore)

    def __repr__(self) -> str:  # pragma: no cover
        return f"pystore_spark.Store <{self.datastore}>"

    @property
    def collections(self) -> list[str]:
        return utils.subdirs(self.datastore)

    def list_collections(self) -> list[str]:
        return self.collections

    def collection_exists(self, collection: str) -> bool:
        return self.fs.isdir(self.datastore / collection)

    def collection(self, collection: str, overwrite: bool = False) -> Collection:
        """Open-or-create a collection (reference pystore/store.py:88-98;
        ``overwrite=True`` replaces an existing one)."""
        if self.collection_exists(collection):
            if overwrite:
                utils.rm_tree(self.datastore / collection)
            return Collection(self.spark, str(self.datastore), collection)
        return Collection(self.spark, str(self.datastore), collection)

    def create_collection(self, collection: str, overwrite: bool = False) -> Collection:
        """Creating-API: raises CollectionExistsError on existing
        (spec: tests/test_collection.py:19-24 — SURVEY §8.3 resolution:
        separate create vs open intents)."""
        if self.collection_exists(collection) and not overwrite:
            raise CollectionExistsError(
                f"collection {collection!r} already exists"
            )
        if self.collection_exists(collection):
            utils.rm_tree(self.datastore / collection)
        return Collection(self.spark, str(self.datastore), collection)

    def delete_collection(self, collection: str) -> bool:
        if not self.collection_exists(collection):
            raise CollectionNotFoundError(
                f"collection {collection!r} does not exist"
            )
        utils.rm_tree(self.datastore / collection)
        return True

    def maintain(
        self, collections: list[str] | None = None, **kwargs
    ) -> dict[str, dict]:
        """Run :meth:`Collection.maintain` (GC, compaction, stats,
        rollup/index refresh — and the index fsck with
        ``verify_indexes=True``) over every collection of the store,
        or the given subset. The whole-datastore nightly job in one
        call; per-collection results keyed by collection name."""
        names = collections or self.list_collections()
        return {
            name: self.collection(name).maintain(**kwargs)
            for name in names
        }

    def sql(self, query: str, collections: list[str] | None = None):
        """Spark SQL across collections: every item of every (or the
        given) collection registers as a temp view named
        ``<collection>__<item>`` (sanitized like
        :meth:`Collection.sql_view_names`), then ``query`` runs
        against them — the cross-collection join surface.

        Views are the same lazy manifest-resolved plans
        ``Item.data`` returns, so filter/projection pushdown and
        ``_pb`` partition pruning apply unchanged. Distinct
        (collection, item) pairs colliding onto one view name raise
        instead of shadowing.

        ``FOR VERSION AS OF`` / ``FOR TIMESTAMP AS OF`` clauses on a
        view resolve to that manifest commit's file list, exactly as
        in :meth:`Collection.sql`."""
        names = (
            list(collections)
            if collections is not None
            else self.collections
        )
        seen: dict[str, tuple[str, str]] = {}
        for cname in names:
            col = self.collection(cname)
            mapping = col.sql_view_names()
            for item, view in mapping.items():
                full = f"{utils.sanitize_sql_ident(cname)}__{view}"
                if full in seen and seen[full] != (cname, item):
                    raise ValueError(
                        f"{seen[full]} and {(cname, item)} both "
                        f"sanitize to SQL view {full!r}"
                    )
                seen[full] = (cname, item)
        query, tt_specs = utils.rewrite_time_travel(query, set(seen))
        for full, (cname, item) in seen.items():
            self.collection(cname).item(item).data.createOrReplaceTempView(
                full
            )
        for view, kind, val, alias in tt_specs:
            cname, item = seen[view]
            it = (
                self.collection(cname).item(item, version=int(val))
                if kind == "version"
                else self.collection(cname).item(item, as_of=val)
            )
            it.data.createOrReplaceTempView(alias)
        return self.spark.sql(query)


def store(datastore: str, spark: SparkSession | None = None) -> Store:
    return Store(datastore, spark=spark)


def list_stores() -> list[str]:
    root = utils.validate_path_local(config.get_path())
    return utils.subdirs(root)


def delete_store(datastore: str) -> bool:
    root = utils.validate_path_local(config.get_path())
    utils.rm_tree(Path(root) / datastore)
    return True


def delete_stores() -> bool:
    from pystore_spark.fs import fs_for

    root = utils.validate_path_local(config.get_path())
    utils.rm_tree(root)
    fs_for(root).mkdirs(root)
    return True
