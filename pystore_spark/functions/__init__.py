"""Reusable column/DataFrame functions for training-data pipelines:
text analysis, deduplication, similarity search, multimodal columns.

All hot-path expressions are built-in Catalyst functions (split,
transform, aggregate, md5, …) — JVM-side, codegen'd, no Python UDFs —
so they scale to 100 TB the same way any native expression does.
"""

from pystore_spark.functions import (
    dedup,
    multimodal,
    sampling,
    similarity,
    text,
)

__all__ = ["text", "dedup", "similarity", "multimodal", "sampling"]
