"""pystore_spark — a PySpark-native analytics/storage engine with the
query and data-processing capabilities of ranaroussi/pystore.

Brand-new implementation on the Spark DataFrame API:

* store → collection → item hierarchy of partitioned Parquet datasets
  with JSON metadata sidecars (reference: pystore/store.py:32-98,
  pystore/collection.py:48-60, pystore/utils.py:89-107).
* index-keyed append/upsert with duplicate-handling strategies
  expressed as anti/semi joins and window dedup (reference:
  pystore/collection.py:391-527).
* snapshots, transactions, locks, validation rules, schema evolution.
* scale extensions for training-data pipelines: dedup (exact, MinHash
  LSH, SimHash, n-gram Jaccard), embedding similarity search, text
  analysis, multimodal column plumbing.

Everything is expressed with the declarative DataFrame API so Catalyst
supplies predicate pushdown, column pruning, partition pruning,
whole-stage codegen, and AQE; engine code adds only the semantics Spark
lacks (keyed upsert, sidecar type round-trip, snapshot protocol).
"""

from pystore_spark.config import get_path, set_path
from pystore_spark.exceptions import (
    CollectionExistsError,
    CollectionNotFoundError,
    ConfigurationError,
    DataIntegrityError,
    ItemExistsError,
    ItemNotFoundError,
    PyStoreError,
    SchemaError,
    SnapshotNotFoundError,
    StorageError,
    TransactionError,
    ValidationError,
)
from pystore_spark.logger import get_logger, setup_logging
from pystore_spark.session import get_spark
from pystore_spark.store import (
    Store,
    delete_store,
    delete_stores,
    list_stores,
    store,
)
from pystore_spark.sources import read_csv, read_jsonl
from pystore_spark.schema_evolution import EvolutionStrategy
from pystore_spark.transactions import BatchTransaction, CollectionLock, transaction
from pystore_spark.exceptions import VersionNotFoundError
from pystore_spark.pipeline import CurationPipeline
from pystore_spark.validation import (
    DataValidator,
    create_financial_validator,
    create_timeseries_validator,
    create_validator,
    with_validation,
)

__version__ = "0.1.0"

__all__ = [
    "store",
    "CurationPipeline",
    "VersionNotFoundError",
    "Store",
    "list_stores",
    "delete_store",
    "delete_stores",
    "get_path",
    "set_path",
    "get_spark",
    "get_logger",
    "setup_logging",
    "read_csv",
    "read_jsonl",
    "PyStoreError",
    "DataIntegrityError",
    "ItemNotFoundError",
    "ItemExistsError",
    "CollectionNotFoundError",
    "CollectionExistsError",
    "SnapshotNotFoundError",
    "StorageError",
    "SchemaError",
    "ConfigurationError",
    "ValidationError",
    "TransactionError",
    "EvolutionStrategy",
    "transaction",
    "BatchTransaction",
    "CollectionLock",
    "DataValidator",
    "create_validator",
    "create_timeseries_validator",
    "create_financial_validator",
    "with_validation",
]
