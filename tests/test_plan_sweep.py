"""Registry-wide physical-plan sweep: forbidden-pattern guard.

Every oracle-registry query's plan is checked for the patterns that
are always scale-killers at 100 TB, regardless of which operator they
appear in:

* ``CartesianProduct`` — an unkeyed all-pairs join;
* ``BroadcastNestedLoopJoin`` — a non-equi join that re-scans the
  broadcast side per row (the failure mode interval_join_banded
  exists to avoid).

The targeted plan tests (test_plans.py) assert what SHOULD be in
specific plans; this sweep asserts what must NEVER be in any of them,
so a new or refactored query can't quietly reintroduce one.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin")

# A BroadcastNestedLoopJoin is acceptable ONLY when the broadcast
# side is provably bounded — then the "nested loop" is constant work
# per stream row. Three sanctioned shapes in the registry, each
# documented in its query's docstring:
#   * 1-row scalar-aggregate broadcasts (corpus total, mean-count
#     threshold, global sum/count): corpus_mix_report, heavy_hitters,
#     waiting_customers_antijoin;
#   * the brute-force cosine BASELINE joins the corpus against the
#     fixed broadcast query set by design — its scale path is the
#     separate vectorized/LSH variants: embedding_cosine_topk.
# Anything else hitting a BNLJ is a regression.
ALLOWED_SCALAR_JOIN = {
    "corpus_mix_report",
    "heavy_hitters",
    "waiting_customers_antijoin",
    "embedding_cosine_topk",
    # 1-row totals aggregate cross-joined into the ≤256-bucket model
    # (bounded broadcast by construction)
    "dsir_importance_weights",
    # 1-row (t_tot, pow_tot) totals broadcast against the per-stratum
    # frame (strata ≪ rows; functions/sampling.py:mixture_plan)
    "mixture_plan",
    # 1-row bigram-type-total T broadcast into the vocabulary-scaled
    # KN model frame (queries_ext.kneser_ney_logprob)
    "kneser_ney_logprob",
    # driver-sized query LUTs (3 rows) broadcast-crossed against the
    # PQ codes frame — the intended ADC scoring shape (every
    # candidate scores against every query; similarity.pq_adc_topk)
    "pq_adc_topk",
    # 1-row (n_docs, avgdl) corpus-stats aggregate broadcast-crossed
    # onto the hit postings — the r12 in-plan stats rewrite of
    # functions/text.bm25_topk (one job instead of an eager collect
    # + scoring job)
    "bm25_retrieval_topk",
}


def _names():
    from pystore_spark.queries import QUERIES  # noqa: WPS433
    import pystore_spark.queries_ext  # noqa: F401  (registry load)

    return list(QUERIES)


@pytest.mark.parametrize("name", _names())
def test_no_forbidden_plan_patterns(spark, name):
    from pystore_spark.queries import QUERIES

    df = QUERIES[name].spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for pat in FORBIDDEN:
        if pat == "BroadcastNestedLoopJoin" and name in ALLOWED_SCALAR_JOIN:
            continue
        assert pat not in plan, f"{name}: {pat} in physical plan"


def test_doc_chunks_plan_is_shuffle_free(spark):
    """split_documents claims row-local chunking — the executed plan
    of its registry query must contain no DATA-DEPENDENT exchange.
    The only allowed Exchange is widen_parallelism's explicit
    RoundRobin repartition of the tiny test input (a scan-width knob,
    not part of the operator)."""
    import re

    from pystore_spark.queries import QUERIES

    df = QUERIES["doc_chunks_stats"].spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    bad = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "RoundRobinPartitioning" not in ln
    ]
    assert not bad, bad
    assert not re.search(r"hashpartitioning|rangepartitioning", plan)
