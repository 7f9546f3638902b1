"""Incremental-maintenance scale evidence: matview refresh and
histogram-stats refresh cost vs corpus size.

The O(new) claims measured directly, the dedup_index_scale.py way:
build the same daily-bucketed events item from the sf0.01 corpus
(10k rows) and the sf0.1 corpus (100k rows), then append the SAME
fixed batch to each and time

* ``refresh_matview`` on an algebraic matview (incremental fold —
  should be near-flat across the 10x corpora, vs the full rebuild
  which is corpus-proportional), and
* ``analyze_incremental(histograms=...)`` after the append (rescans
  only the appended buckets — near-flat) vs its first full build.

Writes BENCH_MATVIEW.json at the repo root.
Usage: python tools/matview_scale.py
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

VIEW_SQL = (
    "SELECT event_type, COUNT(*) AS n_events, "
    "CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DECIMAL(30,6)) AS total "
    "FROM {item} GROUP BY event_type"
)
INC = {"keys": ["event_type"], "merge": {"n_events": "sum",
                                         "total": "sum"}}


def main() -> None:
    from pyspark.sql import functions as F

    import pystore_spark as ps
    from pystore_spark import config as cfg
    from pystore_spark.session import get_spark
    from pystore_spark.sources import load_table

    spark = get_spark(app_name="matview_scale")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="ps_mv_scale_")
    old_path = cfg._path
    out: dict = {"metric": "incremental_maintenance_vs_corpus_size"}
    try:
        cfg.set_path(tmp)
        col = ps.store("scale", spark=spark).collection("c")
        # the same fixed batch for both corpora: 3 disjoint future
        # days derived from the small corpus (pure file additions)
        base_small = load_table(
            spark, "/root/testdata/sf0.01", "events"
        ).select("ts", "event_type", "value")
        # 40-day strides: each batch's 30-day span lands on days no
        # prior batch (or the corpus) touched — pure file additions,
        # the shape the incremental fold requires
        batches = [
            base_small.limit(1000).withColumn(
                "ts",
                F.col("ts") + F.expr(f"INTERVAL {31 + 40 * d} DAYS"),
            ).localCheckpoint(eager=True)
            for d in range(3)
        ]
        # warm the JVM/codegen paths so the first measured corpus
        # doesn't absorb session startup
        col.write(
            "warm", base_small.limit(2000), index_col="ts", freq="D"
        )
        col.create_matview(
            "mv_warm", VIEW_SQL.format(item="warm"), incremental=INC
        )
        col.append("warm", batches[0], duplicate_handling="keep_all")
        col.refresh_matview("mv_warm")
        col.analyze_incremental(
            "warm", columns=["value"], histograms=["value"]
        )
        results: dict = {}
        for label, sf_dir in (
            ("corpus_10k", "/root/testdata/sf0.01"),
            ("corpus_100k", "/root/testdata/sf0.1"),
        ):
            item, mv = f"ev_{label}", f"mv_{label}"
            ev = load_table(spark, sf_dir, "events").select(
                "ts", "event_type", "value"
            )
            col.write(item, ev, index_col="ts", freq="D")
            t0 = time.perf_counter()
            col.create_matview(
                mv, VIEW_SQL.format(item=item), incremental=INC
            )
            build_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            s_full = col.analyze_incremental(
                item, columns=["value"], histograms=["value"]
            )
            analyze_full_s = time.perf_counter() - t0

            refresh_s, analyze_inc_s, modes = [], [], []
            rescanned = []
            for i, b in enumerate(batches):
                col.append(item, b, duplicate_handling="keep_all")
                t0 = time.perf_counter()
                rep = col.refresh_matview(mv)
                refresh_s.append(time.perf_counter() - t0)
                modes.append(rep["mode"])
                t0 = time.perf_counter()
                s = col.analyze_incremental(
                    item, columns=["value"], histograms=["value"]
                )
                analyze_inc_s.append(time.perf_counter() - t0)
                rescanned.append(s["buckets_rescanned"])
            t0 = time.perf_counter()
            col.refresh_matview(mv, force=True)
            rebuild_s = time.perf_counter() - t0
            results[label] = {
                "matview_build_s": round(build_s, 4),
                "incremental_refresh_s": round(min(refresh_s), 4),
                "refresh_modes": modes,
                "full_rebuild_s": round(rebuild_s, 4),
                "analyze_full_s": round(analyze_full_s, 4),
                "analyze_incremental_s": round(min(analyze_inc_s), 4),
                "buckets_rescanned": rescanned,
                "total_buckets_full": s_full["buckets_rescanned"],
            }
        small, big = results["corpus_10k"], results["corpus_100k"]
        out["results"] = results
        out["refresh_ratio_10x_corpus"] = round(
            big["incremental_refresh_s"]
            / small["incremental_refresh_s"], 3,
        )
        out["rebuild_ratio_10x_corpus"] = round(
            big["full_rebuild_s"] / small["full_rebuild_s"], 3
        )
        out["analyze_ratio_10x_corpus"] = round(
            big["analyze_incremental_s"]
            / small["analyze_incremental_s"], 3,
        )
        out["note"] = (
            "incremental refresh/analyze time the same fixed batch "
            "against 10x corpora; ratios near 1.0 evidence the O(new)"
            " claims, while the full rebuild scales with the corpus."
        )
    finally:
        cfg._path = old_path
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
