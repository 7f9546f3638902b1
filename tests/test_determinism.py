"""Parallelism-independence: float-bearing queries must produce
IDENTICAL values at different shuffle widths.

DESIGN.md's correctness-at-scale claim: every floating-point result
is order-independent (decimal intermediates) or fold-order-pinned, so
partial-aggregation order — which changes with parallelism — cannot
change results. This executes a sample of the float-heaviest registry
queries at shuffle_partitions=1 and =16 and compares row-for-row.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

# the queries whose results would drift under float partial-agg
# reordering if the decimal/fold discipline slipped
QUERIES_UNDER_TEST = [
    "pricing_summary",
    "revenue_by_nation",
    "token_entropy",
    "lm_perplexity_scores",
    "rolling_zscore_outliers",
    "embedding_cosine_topk_vectorized",
    "tfidf_top_terms",
    "curation_funnel",
]


def _run_sorted(spark, name):
    from pystore_spark.queries import QUERIES

    df = QUERIES[name].spark_fn(spark, SF_DIR)
    pdf = df.toPandas()
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", QUERIES_UNDER_TEST)
def test_results_identical_across_shuffle_widths(spark, name):
    import pandas as pd

    import pystore_spark.queries_ext  # noqa: F401 (registry load)

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        narrow = _run_sorted(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "16")
        wide = _run_sorted(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    pd.testing.assert_frame_equal(narrow, wide)
