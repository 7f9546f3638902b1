"""Selective small-file compaction (Collection.compact).

OPTIMIZE-style maintenance: only buckets carrying more files than
their bytes need are rewritten; well-sized buckets keep their exact
file pointers (no data I/O, no churn of their stale window). The
census runs entirely off the manifest's per-file size map.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pystore_spark import utils
from pystore_spark import manifest as mf


def _frame(n, start="2023-01-01", freq="min"):
    return pd.DataFrame(
        {
            "v": np.arange(n, dtype="float64"),
            "w": np.arange(n, dtype="float64") * 2.0,
        },
        index=pd.date_range(start, periods=n, freq=freq),
    )


def _files_per_bucket(item_path):
    man = utils.read_manifest(item_path)
    out: dict[str, list[str]] = {}
    for rel in man["files"]:
        b = mf._bucket_of(rel)
        out.setdefault(b, []).append(rel)
    return out


def _fragment_bucket(item_path, bucket, k):
    """Split one bucket's single file into ``k`` committed slices —
    the state a history of tiny independent commits leaves behind.
    Any live-file layout is legal under the manifest protocol, so the
    fabricated state is indistinguishable from an organic one."""
    import pyarrow.parquet as pq

    man = utils.read_manifest(item_path)
    files = list(man["files"])
    sizes = dict(man.get("sizes") or {})
    (victim,) = [r for r in files if mf._bucket_of(r) == bucket]
    tbl = pq.read_table(item_path / victim)
    step = max(1, len(tbl) // k)
    new_rels = []
    for i in range(k):
        part = tbl.slice(i * step, step if i < k - 1 else None)
        rel = f"_pb={bucket}/frag{i:02d}-part.parquet"
        pq.write_table(part, item_path / rel)
        new_rels.append(rel)
        sizes[rel] = (item_path / rel).stat().st_size
    files = [r for r in files if r != victim] + new_rels
    (item_path / victim).unlink()
    sizes.pop(victim, None)
    utils.write_manifest(
        item_path,
        files,
        man.get("metadata"),
        stale=man.get("stale"),
        version=int(man.get("version", 0)) + 1,
        stats=man.get("stats"),
        sizes=sizes,
    )


def test_compact_merges_only_fragmented_buckets(test_collection):
    c = test_collection
    # ~90k rows over 3 months at minute freq → time layout, one file
    # per bucket; fragment two buckets into 4 slices each
    c.write("frag", _frame(90_000))
    item_path = c._item_path("frag")
    buckets = sorted(_files_per_bucket(item_path))
    _fragment_bucket(item_path, buckets[0], 4)
    _fragment_bucket(item_path, buckets[1], 4)
    before = _files_per_bucket(item_path)
    assert sum(len(v) for v in before.values()) > len(before), (
        "test premise: at least one bucket must be fragmented"
    )
    expected = c.item("frag").to_pandas()

    res = c.compact("frag")
    assert res["buckets_compacted"] >= 1
    assert res["files_after"] < res["files_before"]

    after = _files_per_bucket(item_path)
    # every bucket is now at its needed count (tiny buckets → 1 file)
    assert all(len(v) == 1 for v in after.values())
    # identical data, identical buckets
    assert set(after) == set(before)
    pd.testing.assert_frame_equal(c.item("frag").to_pandas(), expected)

    # idempotent: a second pass finds nothing and touches no pointers
    files1 = set(utils.read_manifest(item_path)["files"])
    res2 = c.compact("frag")
    assert res2["buckets_compacted"] == 0
    assert set(utils.read_manifest(item_path)["files"]) == files1


def test_compact_leaves_wellsized_buckets_untouched(test_collection):
    """Pointer-level assertion: the untouched buckets keep the exact
    same file names through the compaction commit."""
    c = test_collection
    c.write("mix", _frame(90_000))
    item_path = c._item_path("mix")
    buckets = sorted(_files_per_bucket(item_path))
    _fragment_bucket(item_path, buckets[0], 3)
    before = _files_per_bucket(item_path)
    res = c.compact("mix")
    assert res["buckets_compacted"] == 1
    after = _files_per_bucket(item_path)
    for b in buckets[1:]:
        assert after[b] == before[b], f"healthy bucket {b} was rewritten"
    assert len(after[buckets[0]]) == 1


def test_compact_maintains_zonemap(test_collection):
    c = test_collection
    c.write("zm", _frame(90_000), zonemap=["v"])
    item_path = c._item_path("zm")
    buckets = sorted(_files_per_bucket(item_path))
    _fragment_bucket(item_path, buckets[0], 3)
    res = c.compact("zm")
    assert res["buckets_compacted"] == 1
    man = utils.read_manifest(item_path)
    stats = man.get("stats") or {}
    # every live file carries v-stats (rewritten ones regenerated;
    # fabricated slices had none, so equality proves regeneration)
    assert set(stats) == set(man["files"])
    sel = c.item("zm", filters=[("v", ">=", 0.0), ("v", "<", 10.0)])
    assert len(sel.to_pandas()) == 10


def test_analyze_records_column_stats(test_collection):
    c = test_collection
    df = _frame(5_000)
    df.loc[df.index[:100], "w"] = None
    c.write("an", df)
    stats = c.analyze("an")
    assert stats["n_rows"] == 5_000
    assert stats["columns"]["w"]["n_nulls"] == 100
    assert stats["columns"]["v"]["n_nulls"] == 0
    assert stats["columns"]["v"]["min"] == 0.0
    assert stats["columns"]["v"]["max"] == 4_999.0
    # HLL NDV within its standard error envelope
    ndv = stats["columns"]["v"]["approx_ndv"]
    assert 4_500 <= ndv <= 5_500

    # persisted: a fresh handle reads them back, with staleness info
    it = c.item("an")
    got = it.stats()
    assert got is not None and got["n_rows"] == 5_000
    assert got["as_of_version"] + 1 == it.version  # stats commit bumped

    # a data change does NOT silently update stats; as_of_version
    # now lags the live version by > 1
    import pandas as pd
    c.append("an", pd.DataFrame(
        {"v": [1.0], "w": [2.0]}, index=pd.DatetimeIndex(["2024-06-01"])
    ))
    it2 = c.item("an")
    assert it2.stats()["as_of_version"] < it2.version


def test_analyze_incremental_rescans_only_changed_buckets(test_collection):
    """Incremental stats: append to ONE bucket → only that bucket
    rescans; merged global stats (counts, min/max, HLL-union NDV)
    match a from-scratch incremental run on the same data."""
    c = test_collection
    c.write("inc", _frame(90_000))  # 3 monthly buckets
    s1 = c.analyze_incremental("inc")
    assert s1["incremental"] and s1["buckets_rescanned"] == 3
    assert s1["n_rows"] == 90_000
    assert s1["columns"]["v"]["min"] == 0.0
    assert s1["columns"]["v"]["max"] == 89_999.0

    # second run with nothing changed: zero rescans, same answer
    s2 = c.analyze_incremental("inc")
    assert s2["buckets_rescanned"] == 0
    assert s2["n_rows"] == 90_000
    assert s2["columns"]["v"]["approx_ndv"] == s1["columns"]["v"]["approx_ndv"]

    # append into a single existing bucket → exactly one rescan
    c.append(
        "inc",
        pd.DataFrame(
            {"v": [1e6], "w": [None]},
            index=pd.DatetimeIndex(["2023-01-15 00:00:30"]),
        ),
    )
    s3 = c.analyze_incremental("inc")
    assert s3["buckets_rescanned"] == 1
    assert s3["n_rows"] == 90_001
    assert s3["columns"]["v"]["max"] == 1e6
    assert s3["columns"]["w"]["n_nulls"] == 1

    # merged sketch estimate ≈ true NDV within lg_k=8 error (±~13%
    # at 3 sigma)
    ndv = s3["columns"]["v"]["approx_ndv"]
    assert 0.8 * 90_001 <= ndv <= 1.2 * 90_001

    # Item.stats() serves the merged summary
    got = c.item("inc").stats()
    assert got["n_rows"] == 90_001 and got["incremental"] is True


def test_maintain_runs_all_steps(test_collection):
    """One-call nightly maintenance: GC + compact + incremental stats
    + rollup refresh, per item, each step CAS-committed and
    restartable."""
    c = test_collection
    c.write("m1", _frame(90_000))
    item_path = c._item_path("m1")
    _fragment_bucket(item_path, sorted(_files_per_bucket(item_path))[0], 3)
    c.create_rollup("m1", "m1_daily", unit="day", aggs={"v": ["sum"]})

    res = c.maintain()
    assert set(res) == {"m1"}  # the rollup item is derived, not a target
    r = res["m1"]
    assert r["compact"]["buckets_compacted"] == 1
    assert r["stats"]["n_rows"] == 90_000
    assert "gc_removed" in r and "m1_daily" in r["rollups"]

    # second run: nothing to do, still clean
    res2 = c.maintain("m1")
    assert res2["m1"]["compact"]["buckets_compacted"] == 0
    assert res2["m1"]["stats"]["buckets_rescanned"] in (0, 1)


def test_compact_non_time_item_is_noop_when_healthy(test_collection):
    """Review fix: a well-sized non-time item must not be rewritten by
    compact (and therefore by every nightly maintain) — the census
    applies to the flat layout too."""
    c = test_collection
    df = pd.DataFrame({"a": np.arange(500.0), "b": np.arange(500.0)})
    df.index = pd.RangeIndex(500)
    c.write("flat", df)
    man1 = utils.read_manifest(c._item_path("flat"))
    res = c.compact("flat")
    assert res["buckets_compacted"] == 0
    man2 = utils.read_manifest(c._item_path("flat"))
    # no rewrite: same version, same file pointers
    assert man2["version"] == man1["version"]
    assert man2["files"] == man1["files"]


def test_compact_detects_concurrent_append(test_collection, monkeypatch):
    """Lost-update window: an append that commits to a selected bucket
    between compact's manifest read and its commit must NOT have its
    files silently moved to stale. The observed-state guard raises
    ConcurrentCommitError inside the commit and compact retries
    against the fresh manifest — no rows vanish."""
    c = test_collection
    c.write("race", _frame(90_000))
    item_path = c._item_path("race")
    buckets = sorted(_files_per_bucket(item_path))
    _fragment_bucket(item_path, buckets[0], 4)

    base = c.item("race").to_pandas()
    # new rows landing inside the fragmented (selected) bucket
    inc = pd.DataFrame(
        {"v": [1e6, 2e6], "w": [3e6, 4e6]},
        index=base.index[:2] + pd.Timedelta(seconds=30),
    )

    fired = {}
    orig_write = c._write_df

    def hooked(df, path, plan):
        # compact has computed its rewrite; land a concurrent append
        # into the selected bucket before compact's manifest commit
        if "x" not in fired:
            fired["x"] = True
            c.append("race", inc)
        return orig_write(df, path, plan)

    monkeypatch.setattr(c, "_write_df", hooked)
    c.compact("race")  # must not raise; retries internally

    got = c.item("race").to_pandas()
    expected = pd.concat([base, inc]).sort_index()
    pd.testing.assert_frame_equal(
        got.sort_index(), expected, check_freq=False
    )


def test_commit_guard_raises_on_drift(test_collection):
    """Direct guard check: a bucket-scoped commit carrying an
    expect_files map that no longer matches the live manifest raises
    ConcurrentCommitError and leaves the live state untouched."""
    import pytest

    from pystore_spark.exceptions import ConcurrentCommitError

    c = test_collection
    c.write("g", _frame(2_000))
    item_path = c._item_path("g")
    man0 = utils.read_manifest(item_path)
    stale_expect = {
        b: tuple(list(fs_) + ["_gone.parquet"])
        for b, fs_ in mf.bucket_file_map(man0).items()
    }
    before = c.item("g").to_pandas()

    def write_fn(tmp):
        # rewrite bucket 0's file into tmp under its hive dir
        import shutil

        rel = man0["files"][0]
        dst = tmp / rel
        dst.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(item_path / rel, dst)

    with pytest.raises(ConcurrentCommitError):
        c._install_buckets("g", write_fn, dict(c.item("g").metadata),
                           expect_files=stale_expect)
    pd.testing.assert_frame_equal(
        c.item("g").to_pandas(), before, check_freq=False
    )
