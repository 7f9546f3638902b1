"""Near-dup clustering scale evidence: wall time vs corpus size.

near_dedup_clusters (functions/dedup.py) must stay LSH-bounded like
the pipeline it mirrors: candidate generation is confined to band
buckets, label propagation touches only edge-bearing docs, and the
size aggregation is component-keyed. This tool times the full
cluster-assignment query at sf0.01 (500 docs) and sf0.1 (5,000 docs)
and reports the 10x-corpus ratio + the implied scaling exponent —
sub-linear is the pass bar (the quadratic terms live inside buckets).

Writes BENCH_CLUSTERS.json at the repo root.
Usage: python tools/cluster_scale.py
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pystore_spark.functions.dedup import near_dedup_clusters
    from pystore_spark.session import get_spark
    from pystore_spark.sources import load_table

    spark = get_spark(app_name="cluster_scale")
    spark.sparkContext.setLogLevel("ERROR")

    results = {}
    for sf, label in (("sf0.01", "corpus_500"), ("sf0.1", "corpus_5000")):
        docs = load_table(
            spark, f"/root/testdata/{sf}", "documents"
        ).select("doc_id", "text")
        # warmup (codegen + page cache), then min of 3 steady-state
        near_dedup_clusters(docs, "text", "doc_id").count()
        best, rows = float("inf"), 0
        for _ in range(3):
            t0 = time.perf_counter()
            rows = near_dedup_clusters(docs, "text", "doc_id").count()
            best = min(best, time.perf_counter() - t0)
        results[label] = {"sec": round(best, 2), "clustered_docs": rows}

    r5, r50 = results["corpus_500"], results["corpus_5000"]
    ratio = r50["sec"] / r5["sec"]
    out = {
        "metric": "neardup_cluster_assignment_vs_corpus_size",
        "results": results,
        "ratio_10x_corpus": round(ratio, 2),
        "scaling_exponent": round(math.log10(max(ratio, 1e-9)), 2),
        "verdict": (
            "sub-linear — LSH-bounded"
            if ratio < 10.0
            else "super-linear — REGRESSION"
        ),
    }
    Path(
        Path(__file__).resolve().parent.parent / "BENCH_CLUSTERS.json"
    ).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
