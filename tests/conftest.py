"""Shared fixtures (modeled on the reference's tests/conftest.py:14-73)."""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

# ---------------------------------------------------------------------------
# slow tier (round-9 verdict #7): the default gate (`pytest tests/`,
# pytest.ini addopts `-m "not slow"`) stays fast; the stress tier —
# concurrency hammers, randomized long chains, multi-commit
# lifecycles, crash-replay matrices — runs with `-m slow` (both tiers
# via tools/round_start.sh). Central name list so the tier is one
# auditable block instead of decorators scattered over 20 files.
# Rule: every name here is a STRESS variant of a feature that keeps a
# fast-tier test; nothing here is a feature's only coverage.
SLOW_TESTS = {
    # randomized / property / long-chain
    "test_dv_vacuum_long_chain_randomized",
    "test_update_where_dv_rewrite_parity_randomized",
    "test_incremental_fold_equals_rebuild_randomized",
    "test_dedup_lines_properties",
    # multi-commit lifecycles (every stage has its own fast test)
    "test_full_curated_corpus_lifecycle",
    "test_multi_day_ingest_lifecycle",
    "test_clone_dml_vacuum_interaction_both_directions",
    "test_bucketed_clone_dml_vacuum_interaction",
    "test_incremental_equals_batch_dedup_on_union",
    "test_next_batch_loses_passages_registered_by_previous",
    # streaming crash-replay matrix (the representative
    # test_dedup_sink_replay_repairs_crashed_index_append stays fast)
    "test_clean_dedup_replay_never_registers_dropped_doc_grams",
    "test_curated_sink_text_index_crash_repair",
    "test_curated_sink_substring_census_cut_and_crash_repair",
    "test_curated_sink_replay_repairs_crashed_line_registration",
    "test_replay_probe_ignores_batch_own_index_rows",
    "test_replay_exclusion_spares_presto_stored_rows",
    "test_replay_markers_survive_delta_deletion_by_repair",
    # concurrency hammers / races (single-writer correctness of each
    # op is fast-tier; these pin the CAS/lock behavior under load)
    "test_cas_counter_survives_multiprocess_hammer",
    "test_two_driver_compact_append_race",
    "test_concurrent_locked_appends_lose_nothing",
    "test_concurrent_reads_never_see_missing_files",
    "test_concurrent_create_same_item_loses_visibly",
    "test_merge_survives_concurrent_appends",
    "test_fold_preserves_concurrent_delta_appends",
    "test_threaded_append_on_bucketed_item",
    "test_concurrent_bucketed_appends_both_land",
    "test_compact_preserves_concurrent_metadata",
    "test_compact_detects_concurrent_append",
    "test_threaded_append_enforced",
    "test_threaded_bucketed_append_enforced",
    "test_delete_preserves_concurrent_metadata_updates",
    "test_concurrent_ingest_totals_never_lose_increments",
    "test_s3_concurrent_reads_never_see_missing_files",
    "test_rewrite_conflicts_with_concurrent_dv_commit",
    "test_whole_item_rewrites_conflict_with_concurrent_dv",
    "test_dv_delete_retries_when_concurrent_mask_commit_lands",
    "test_append_threaded",
    "test_append_dedup_sugar_threaded",
    "test_whole_item_append_detects_concurrent_commit",
    "test_write_threaded",
    "test_concurrent_source_registration_cas",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = getattr(item, "originalname", None) or item.name
        if name.split("[")[0] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
    # process-level sharding (tools/fast_gate.sh): the suite profile
    # is FLAT (~0.5 s/test of irreducible Spark-job latency; the
    # round-9 --durations audit), so single-process marking cannot
    # reach the <10-min gate — but N concurrent pytest processes,
    # each a local[4] session on the 32-CPU box, can. PYSTORE_
    # TEST_SHARD="i/N" keeps every item with collected-index ≡ i
    # (mod N): round-robin balances wall-clock under a flat profile
    # and the union over shards is exactly the full suite (disjoint
    # by construction — same collection order in every process).
    shard = os.environ.get("PYSTORE_TEST_SHARD")
    if shard:
        idx, total = (int(x) for x in shard.split("/", 1))
        keep = [it for i, it in enumerate(items) if i % total == idx]
        drop = [it for i, it in enumerate(items) if i % total != idx]
        items[:] = keep
        config.hook.pytest_deselected(items=drop)


@pytest.fixture(scope="session")
def spark():
    from pystore_spark.session import get_spark

    # local[4]/4-shuffle-partitions measured as fast as local[8/16]
    # suite-wide (job-scheduling latency dominates the tiny-data
    # tests; only the compute-heavy index files gain from threads) —
    # override with PYSTORE_SPARK_TEST_CPUS when iterating on those
    n = os.environ.get("PYSTORE_SPARK_TEST_CPUS", "4")
    s = get_spark(app_name="pystore_spark_tests", master=f"local[{n}]",
                  shuffle_partitions=4)
    yield s


@pytest.fixture()
def temp_store_path(monkeypatch):
    path = tempfile.mkdtemp(prefix="pystore_spark_test_")
    monkeypatch.setenv("PYSTORE_SPARK_PATH", path)
    import pystore_spark.config as config

    config._path = None
    yield path
    shutil.rmtree(path, ignore_errors=True)
    config._path = None


@pytest.fixture()
def test_store(spark, temp_store_path):
    import pystore_spark as ps

    return ps.store("test_store", spark=spark)


@pytest.fixture()
def test_collection(test_store):
    return test_store.collection("test_collection")


@pytest.fixture()
def sample_data():
    rng = np.random.default_rng(42)
    n = 100
    idx = pd.date_range("2024-01-01", periods=n, freq="D")
    return pd.DataFrame(
        {
            "value1": rng.standard_normal(n),
            "value2": rng.standard_normal(n) * 100,
            "category": pd.Categorical(
                rng.choice(["A", "B", "C"], size=n)
            ).astype(str),
        },
        index=idx,
    )


@pytest.fixture()
def sample_data_with_duplicates():
    rng = np.random.default_rng(7)
    dates = list(pd.date_range("2024-01-01", periods=50, freq="D"))
    dates += dates[-10:]  # last 10 repeat
    return pd.DataFrame(
        {"value": rng.standard_normal(len(dates))}, index=pd.DatetimeIndex(dates)
    )


@pytest.fixture()
def sample_data_nanosecond():
    base = pd.Timestamp("2024-01-01").value
    rng = np.random.default_rng(3)
    idx = pd.to_datetime(
        [base + i * 1_000_000_000 + int(rng.integers(0, 1000)) for i in range(10)]
    )
    return pd.DataFrame({"value": rng.standard_normal(10)}, index=idx)
