"""sf1.0 scale probe (VERDICT r4 item 3).

The driver ships testdata up to sf0.1; the engine's claims are about
100 TB. This tool measures how each headline query's runtime SCALES by
synthesizing an sf1.0-equivalent dataset (10× sf0.1, ~6M lineitem
rows) and timing the bench set at both scales, reporting the empirical
scaling exponent ``log(t_big / t_small) / log(10)`` per query:

* exponent ≈ 1.0  → linear (ideal for scans/projections/hash aggs)
* exponent ≈ 1.1  → n log n territory (sorts, range exchanges)
* exponent > 1.2  → flagged: super-linear, would not survive 100 TB
* exponent < ~0.3 → fixed-cost dominated at this scale (reported, not
  flagged — the probe can't distinguish O(1) from O(n) under ~1s)

Synthesis (Spark-side, ~one minute) replicates each fact table 10×
with SHIFTED KEYS so join fan-outs stay realistic (copy k of orders
joins only copy k of lineitem/customer), and DECORRELATES text and
embeddings per copy (token/segment rotation) so dedup/LSH bucket
sizes grow linearly like a real corpus, not quadratically like a
mirrored one. Dimension tables (region/nation/part/supplier) stay
fixed — exactly how TPC-H scales. The synthesized dir is a timing
input ONLY — correctness gates always run on driver-generated
testdata.

Usage:  python tools/scale_probe.py [--keep] [out_json]
Writes BENCH_SF1.json at the repo root by default.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMALL = "/root/testdata/sf0.1"
FACTOR = 10
KEY_SHIFT = 100_000_000  # beyond every sf0.1 key range

TABLES_FIXED = ["region", "nation", "part", "supplier"]


def synthesize(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    from pystore_spark.sources import load_table

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    def write(name, df):
        df.write.mode("overwrite").parquet(str(out / f"{name}.parquet"))

    for name in TABLES_FIXED:
        write(name, load_table(spark, SF_SMALL, name))

    def replicate(name, shift_cols, transform=None):
        base = load_table(spark, SF_SMALL, name)
        copies = []
        for k in range(FACTOR):
            c = base
            for col in shift_cols:
                c = c.withColumn(col, F.col(col) + F.lit(k * KEY_SHIFT))
            if transform is not None:
                c = transform(c, k)
            copies.append(c)
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        write(name, df)

    replicate("customer", ["c_custkey"])
    replicate("orders", ["o_orderkey", "o_custkey"])
    replicate("lineitem", ["l_orderkey"])
    replicate("events", ["user_id"])

    def rot_text(df, k):
        # rotate the token sequence by k: every shingle changes, so
        # copies are NOT near-duplicates of each other and LSH bucket
        # sizes scale like a real corpus
        if k == 0:
            return df
        toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
        n = F.size(toks)
        rot = F.when(
            n > k,
            F.concat(
                F.slice(toks, k + 1, n - k), F.slice(toks, 1, k)
            ),
        ).otherwise(toks)
        return df.withColumn("text", F.concat_ws(" ", rot))

    replicate("documents", ["doc_id"], transform=rot_text)

    def rot_vec(df, k):
        if k == 0:
            return df
        v = F.col("embedding")
        n = F.size(v)
        return df.withColumn(
            "embedding",
            F.concat(F.slice(v, k + 1, n - k), F.slice(v, 1, k)),
        )

    replicate("embeddings", ["vec_id"], transform=rot_vec)


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    from bench import BENCH_QUERIES

    from pystore_spark.queries import QUERIES

    timings = {}
    QUERIES["index_minmax"].spark_fn(spark, sf_dir).count()  # warmup
    for name in BENCH_QUERIES:
        spec = QUERIES.get(name)
        if spec is None:
            continue

        def run():
            spec.spark_fn(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()

        run()  # per-query warmup (page cache + codegen)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    return timings


def main() -> None:
    keep = "--keep" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_json = args[0] if args else str(
        Path(__file__).resolve().parent.parent / "BENCH_SF1.json"
    )
    big_dir = os.environ.get(
        "SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1"
    )

    from pystore_spark.session import get_spark

    spark = get_spark(app_name="pystore_spark_scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    synthesize(spark, big_dir)
    synth_sec = round(time.perf_counter() - t0, 1)
    print(f"synthesized {big_dir} in {synth_sec}s", file=sys.stderr)

    small = time_queries(spark, SF_SMALL)
    big = time_queries(spark, big_dir)

    # the storage write→upsert→filtered-read cycle — the reference's
    # headline path — probed at both scales too
    from bench import _storage_bench, _storage_dv_bench

    small["storage_write_append_read"] = round(
        _storage_bench(spark, SF_SMALL), 4
    )
    big["storage_write_append_read"] = round(
        _storage_bench(spark, big_dir), 4
    )
    # round-7 flagship: the merge-on-read DML cycle (dv delete +
    # update + masked read) — its write side is O(matches), so the
    # exponent should track the match-scan, not the corpus rewrite
    small["storage_dv_delete_update"] = round(
        _storage_dv_bench(spark, SF_SMALL), 4
    )
    big["storage_dv_delete_update"] = round(
        _storage_dv_bench(spark, big_dir), 4
    )

    report = {}
    flagged = []
    for name, ts in small.items():
        tb = big.get(name)
        if tb is None:
            continue
        exp = (
            round(math.log(tb / ts) / math.log(FACTOR), 3)
            if ts > 0 and tb > 0
            else None
        )
        report[name] = {"sf0.1_sec": ts, "sf1_sec": tb, "exponent": exp}
        # under ~1s at the SMALL scale, fixed costs (session, job
        # scheduling) dominate and the exponent is meaningless; only
        # flag queries with real compute at both scales
        if exp is not None and exp > 1.2 and tb > 2.0:
            flagged.append(name)

    out = {
        "metric": "scale_probe_sf0.1_to_sf1",
        "factor": FACTOR,
        "flagged_superlinear": sorted(flagged),
        "queries": report,
        "totals": {
            "sf0.1_sec": round(sum(small.values()), 2),
            "sf1_sec": round(sum(big.values()), 2),
            "exponent": round(
                math.log(sum(big.values()) / sum(small.values()))
                / math.log(FACTOR),
                3,
            ),
        },
    }
    Path(out_json).write_text(json.dumps(out, indent=1))
    print(json.dumps({k: out[k] for k in (
        "metric", "flagged_superlinear", "totals")}))
    if not keep:
        shutil.rmtree(big_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
