"""Collection.merge_into — Delta-style conditional MERGE.

Beyond-reference operator (the reference's append duplicate_handling
is MERGE's update_all/insert_all corner); semantics modeled on Delta's
MERGE INTO: per matched row delete-then-update clause ordering,
key-unique source enforcement, standard SQL null-key behavior."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pystore_spark.exceptions import (
    DataIntegrityError,
    ItemNotFoundError,
    ValidationError,
)


@pytest.fixture()
def coll(test_store):
    return test_store.collection("merge_tests", overwrite=True)


def _target():
    return pd.DataFrame(
        {
            "k": range(10),
            "v": [float(i) for i in range(10)],
            "status": ["A"] * 5 + ["B"] * 5,
        }
    ).set_index("k")


def test_merge_semantics_size_layout(coll):
    coll.write("t1", _target())
    src = pd.DataFrame(
        {
            "k": [2, 3, 4, 7, 11, 12],
            "v": [20.0, 30.0, 40.0, 70.0, 110.0, 120.0],
            "status": ["B", "A", "B", "A", "N", "N"],
        }
    ).set_index("k")
    rep = coll.merge_into(
        "t1", src, on="k",
        when_matched={"v": "t.v + s.v"},
        matched_condition="s.status = 'B'",
        when_matched_delete="t.status = 'B' AND s.status = 'A'",
        when_not_matched="insert_all",
    )
    # k2: update (s=B) 2+20; k3: no clause fires; k4: update 4+40;
    # k7: t=B,s=A → deleted; k11/k12 inserted
    assert rep == {
        "n_updated": 2, "n_deleted": 1, "n_inserted": 2,
        "n_unchanged_matched": 1,
    }
    out = coll.item("t1").to_pandas().sort_index()
    assert out.loc[2, "v"] == 22.0 and out.loc[4, "v"] == 44.0
    assert out.loc[3, "v"] == 3.0  # unchanged matched
    assert 7 not in out.index
    assert out.loc[11, "status"] == "N" and len(out) == 11


def test_merge_update_all_and_insert_none(coll):
    coll.write("t2", _target())
    src = pd.DataFrame(
        {"k": [1, 99], "v": [100.0, 999.0], "status": ["Z", "Z"]}
    ).set_index("k")
    rep = coll.merge_into(
        "t2", src, on="k",
        when_matched="update_all", when_not_matched=None,
    )
    assert rep["n_updated"] == 1 and rep["n_inserted"] == 0
    out = coll.item("t2").to_pandas().sort_index()
    assert out.loc[1, "v"] == 100.0 and out.loc[1, "status"] == "Z"
    assert 99 not in out.index and len(out) == 10


def test_merge_matched_none_keeps_target(coll):
    coll.write("t3", _target())
    src = pd.DataFrame(
        {"k": [1, 42], "v": [-1.0, -2.0], "status": ["Z", "Z"]}
    ).set_index("k")
    rep = coll.merge_into(
        "t3", src, on="k", when_matched=None,
        when_not_matched="insert_all",
    )
    assert rep["n_updated"] == 0 and rep["n_inserted"] == 1
    out = coll.item("t3").to_pandas().sort_index()
    assert out.loc[1, "v"] == 1.0  # untouched
    assert out.loc[42, "v"] == -2.0


def test_merge_guards(coll):
    coll.write("t4", _target())
    dup = pd.DataFrame(
        {"k": [1, 1], "v": [0.0, 0.0], "status": ["A", "A"]}
    ).set_index("k")
    with pytest.raises(DataIntegrityError):
        coll.merge_into("t4", dup, on="k")
    with pytest.raises(ValueError):  # assigning the index column
        coll.merge_into(
            "t4", _target().iloc[:1], on="k",
            when_matched={"k": "s.k + 1"},
        )
    with pytest.raises(ValidationError):  # insert_all needs full schema
        partial = pd.DataFrame({"k": [1], "v": [0.0]}).set_index("k")
        coll.merge_into("t4", partial, on="k")
    with pytest.raises(ItemNotFoundError):
        coll.merge_into("nope", _target(), on="k")
    with pytest.raises(ValueError):  # unknown key
        coll.merge_into("t4", _target(), on="zzz")


def test_merge_time_layout_bucket_scoped(coll):
    from pystore_spark import utils

    n = 40_000
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2023-01-01", periods=n, freq="min"),
            "v": np.arange(n, dtype=float),
            "tag": ["x"] * n,
        }
    ).set_index("ts")
    coll.write("tt", pdf)
    it = coll.item("tt")
    assert it._plan.kind == "time"
    man_before = utils.read_manifest(coll._item_path("tt"))
    upd = pdf.iloc[1000:1100].copy()
    upd["v"] = -1.0
    upd["tag"] = "upd"
    dele = pdf.iloc[2000:2050].copy()
    dele["tag"] = "kill"
    new = pd.DataFrame(
        {
            "ts": pd.date_range("2024-06-01", periods=30, freq="min"),
            "v": 7.0,
            "tag": ["new"] * 30,
        }
    ).set_index("ts")
    rep = coll.merge_into(
        "tt", pd.concat([upd, dele, new]), on="ts",
        when_matched={"v": "s.v", "tag": "s.tag"},
        when_matched_delete="s.tag = 'kill'",
        when_not_matched="insert_all",
    )
    assert rep == {
        "n_updated": 100, "n_deleted": 50, "n_inserted": 30,
        "n_unchanged_matched": 0,
    }
    out = coll.item("tt").to_pandas()
    assert len(out) == n - 50 + 30
    assert (out["v"] == -1.0).sum() == 100
    assert (out["tag"] == "new").sum() == 30
    # bucket scope: untouched buckets keep their exact file pointers
    man_after = utils.read_manifest(coll._item_path("tt"))
    import pathlib

    def by_bucket(man):
        out = {}
        for f in man["files"]:
            out.setdefault(
                pathlib.PurePosixPath(f).parent.as_posix(), []
            ).append(f)
        return out

    b0, b1 = by_bucket(man_before), by_bucket(man_after)
    touched = {"_pb=2023-01", "_pb=2024-06"}
    untouched_same = [
        b for b in b0
        if b not in touched and b0[b] == b1.get(b)
    ]
    assert len(untouched_same) == len(b0) - 1  # all but 2023-01


def test_merge_empties_whole_bucket(coll):
    n = 130_000  # ~90 days of minutes → several monthly buckets
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2023-01-01", periods=n, freq="min"),
            "v": np.arange(n, dtype=float),
        }
    ).set_index("ts")
    coll.write("tk", pdf)
    assert coll.item("tk")._plan.kind == "time"
    # delete EVERY row of the first month through merge — the bucket
    # must be dropped from the manifest even though it stages no files
    first_month = pdf.loc["2023-01"]
    rep = coll.merge_into(
        "tk", first_month, on="ts",
        when_matched=None,
        when_matched_delete="true",
        when_not_matched=None,
    )
    assert rep["n_deleted"] == len(first_month)
    out = coll.item("tk").to_pandas()
    assert len(out) == n - len(first_month)
    assert out.index.min() >= pd.Timestamp("2023-02-01")


def test_merge_refuses_to_empty_item(coll):
    from pystore_spark.exceptions import StorageError

    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2023-01-01", periods=5_000, freq="min"),
            "v": np.arange(5_000, dtype=float),
        }
    ).set_index("ts")
    coll.write("tempty", pdf)
    with pytest.raises(StorageError):
        coll.merge_into(
            "tempty", pdf, on="ts",
            when_matched=None, when_matched_delete="true",
            when_not_matched=None,
        )
    assert len(coll.item("tempty").to_pandas()) == 5_000


def test_merge_null_keys_never_match(coll):
    pdf = pd.DataFrame(
        {"k": ["a", "b", None], "v": [1.0, 2.0, 3.0]}
    )
    coll.write("tn", pdf.set_index(pd.RangeIndex(3, name="rid")))
    src = pdf.copy()
    src["v"] = [10.0, 20.0, 30.0]
    src["rid"] = [0, 1, 7]
    rep = coll.merge_into(
        "tn", src.set_index("rid"), on="k",
        when_matched="update_all", when_not_matched="insert_all",
    )
    # null key in source matches nothing → insert; null-key target
    # row stays
    assert rep["n_updated"] == 2 and rep["n_inserted"] == 1
    out = coll.item("tn").to_pandas()
    assert len(out) == 4
    assert sorted(out["v"].tolist()) == [3.0, 10.0, 20.0, 30.0]


def test_merge_matches_pandas_model_random(coll):
    rng = np.random.default_rng(11)
    tgt = pd.DataFrame(
        {
            "k": np.arange(500),
            "v": rng.normal(size=500).round(3),
            "g": rng.choice(["p", "q", "r"], 500),
        }
    ).set_index("k")
    coll.write("tr", tgt)
    sk = rng.choice(800, 300, replace=False)
    src = pd.DataFrame(
        {
            "k": sk,
            "v": rng.normal(size=300).round(3),
            "g": rng.choice(["p", "q", "r"], 300),
        }
    ).set_index("k")
    rep = coll.merge_into(
        "tr", src, on="k",
        when_matched={"v": "t.v + s.v"},
        matched_condition="s.g = 'p'",
        when_matched_delete="s.g = 'q' AND t.g = 'q'",
        when_not_matched="insert_all",
    )
    # pandas model
    t = tgt.reset_index()
    s = src.reset_index()
    m = t.merge(s, on="k", how="outer", suffixes=("_t", "_s"),
                indicator=True)
    deleted = (m["_merge"] == "both") & (m["g_s"] == "q") & (
        m["g_t"] == "q"
    )
    updated = (
        (m["_merge"] == "both") & ~deleted & (m["g_s"] == "p")
    )
    final_v = np.where(
        m["_merge"] == "right_only", m["v_s"],
        np.where(updated, m["v_t"] + m["v_s"], m["v_t"]),
    )
    model = pd.DataFrame(
        {
            "k": m["k"],
            "v": final_v,
            "g": np.where(
                m["_merge"] == "right_only", m["g_s"], m["g_t"]
            ),
        }
    )[~deleted].sort_values("k").reset_index(drop=True)
    assert rep["n_deleted"] == int(deleted.sum())
    assert rep["n_updated"] == int(updated.sum())
    out = (
        coll.item("tr").to_pandas().reset_index()
        .sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out[["k", "v", "g"]],
        model.astype({"k": out["k"].dtype}),
        check_exact=False, rtol=1e-9,
    )


def test_merge_not_matched_condition(coll):
    coll.write("t5", _target())
    src = pd.DataFrame(
        {
            "k": [1, 50, 51],
            "v": [100.0, 500.0, 510.0],
            "status": ["Z", "OK", "SKIP"],
        }
    ).set_index("k")
    rep = coll.merge_into(
        "t5", src, on="k",
        when_matched="update_all",
        when_not_matched="insert_all",
        not_matched_condition="s.status <> 'SKIP'",
    )
    assert rep["n_updated"] == 1 and rep["n_inserted"] == 1
    out = coll.item("t5").to_pandas().sort_index()
    assert 50 in out.index and 51 not in out.index


def test_merge_survives_concurrent_appends(coll):
    """A thread lands paced small appends into the same bucket while
    the main thread loops merge_into over it: every commit rides the
    observed-state CAS, the loser retries against fresh state, and
    row conservation holds across both writers (a lost update on
    either side shows as missing rows)."""
    import threading
    import time as _t

    n = 40_000
    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=n, freq="min"),
            "v": np.arange(n, dtype=float),
        }
    ).set_index("ts")
    coll.write("race_m", pdf)
    assert coll.item("race_m")._plan.kind == "time"

    APPENDS, PER = 30, 25
    errs: list = []

    def appender():
        try:
            for i in range(APPENDS):
                extra = pd.DataFrame(
                    {"v": [1000.0 + i] * PER},
                    index=pd.date_range(
                        "2024-01-10", periods=PER, freq="s"
                    )
                    + pd.Timedelta(minutes=i),
                ).rename_axis("ts")
                coll.append("race_m", extra, duplicate_handling="keep_all")
                # pacing: stretch the append window past several merge
                # round-trips so the two writers' commits interleave
                _t.sleep(0.25)
        except Exception as exc:  # surfaced below
            errs.append(exc)

    th = threading.Thread(target=appender, daemon=True)
    th.start()
    upd = pdf.iloc[:100].copy()
    upd["v"] = -1.0
    from pystore_spark.exceptions import ConcurrentCommitError

    merges = 0
    # ≥2 merges, the first of which provably overlaps the append
    # window (the thread is alive when it starts); a single merge can
    # span the whole window when CAS retries stretch it. Per the
    # documented contract, a merge that exhausts its bounded retries
    # under sustained contention raises ConcurrentCommitError and the
    # CALLER retries cleanly — this loop is that caller.
    while th.is_alive() or merges < 2:
        try:
            coll.merge_into(
                "race_m", upd, on="ts",
                when_matched={"v": "s.v"}, when_not_matched=None,
            )
        except ConcurrentCommitError:
            continue
        merges += 1
    th.join()
    assert not errs, errs
    coll.clear_metadata_cache("race_m")
    out = coll.item("race_m").to_pandas()
    assert len(out) == n + APPENDS * PER  # conservation, both writers
    assert (out["v"] == -1.0).sum() == 100
    from pystore_spark import utils as _u

    item_path = coll._item_path("race_m")
    man = _u.read_manifest(item_path)
    import pathlib as _pl

    for rel in man["files"]:
        assert (_pl.Path(item_path) / rel).exists()
