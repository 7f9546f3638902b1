"""Error taxonomy, mirroring the reference's semantics
(reference: pystore/exceptions.py:26-82)."""


class PyStoreError(Exception):
    """Base exception for all engine errors."""


class DataIntegrityError(PyStoreError):
    """Data integrity issues detected."""


class ItemNotFoundError(PyStoreError):
    """Item not found."""


class ItemExistsError(PyStoreError):
    """Item already exists (write without overwrite)."""


class CollectionNotFoundError(PyStoreError):
    """Collection not found."""


class CollectionExistsError(PyStoreError):
    """Collection already exists."""


class SnapshotNotFoundError(PyStoreError):
    """Snapshot not found."""


class VersionNotFoundError(PyStoreError):
    """Requested item version is unknown or beyond retention."""


class StorageError(PyStoreError):
    """Storage operation failed."""


class SchemaError(PyStoreError):
    """Schema incompatibility."""


class ConfigurationError(PyStoreError):
    """Invalid configuration."""


class ValidationError(PyStoreError):
    """Data validation failed."""


class TransactionError(StorageError):
    """Transaction operation failed."""


class ConcurrentCommitError(StorageError):
    """Manifest-pointer conditional put lost a compare-and-swap race:
    another writer committed between this writer's manifest read and
    its install (object-store If-Match/ETag semantics; see fs.py)."""
