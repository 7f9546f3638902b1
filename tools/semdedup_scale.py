"""SemDeDup scale evidence: cluster-local cost vs corpus size.

Two claims to measure (functions/similarity.semdedup_kept and
Collection.semantic_dedup_probe):

1. BATCH: SemDeDup's candidate stage is quadratic only within each
   learned cluster, so with n_cells scaled proportionally to the
   corpus (the paper's recipe — bounded cluster sizes) the
   candidate-pair count grows ~linearly, not quadratically. We run
   the full semdedup_kept at 1x and 10x corpus with 10x the cells
   and report wall time and the within-cluster pair count; a
   quadratic stage would show ~100x pairs.

2. INCREMENTAL: semantic_dedup_probe against a persistent vector
   index costs O(batch + probed cells), not O(corpus): probing the
   SAME batch against a 1x and a 10x index should be near-flat.

Writes BENCH_SEMDEDUP.json at the repo root.
Usage: python tools/semdedup_scale.py
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_CELLS_1X = 16
THRESHOLD = 0.35  # the synthetic corpus is near-uniform; see
#                   semdedup_kept_docs — real corpora run 0.95+


def main() -> None:
    from pyspark.sql import functions as F

    import pystore_spark as ps
    from pystore_spark import config as cfg
    from pystore_spark.functions import similarity as S
    from pystore_spark.session import get_spark
    from pystore_spark.sources import load_table

    spark = get_spark(app_name="semdedup_scale")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="ps_semdedup_scale_")
    old_path = cfg._path
    out: dict = {
        "metric": "semdedup_cost_vs_corpus_size",
        "threshold": THRESHOLD,
        "n_cells": {"corpus_1x": N_CELLS_1X, "corpus_10x": N_CELLS_1X * 10},
    }
    try:
        cfg.set_path(tmp)
        col = ps.store("scale", spark=spark).collection("c")
        base = load_table(
            spark, "/root/testdata/sf0.1", "embeddings"
        ).select("vec_id", "embedding")
        # 10x corpus: shifted ids, per-copy component rotation keeps
        # the copies distinct points of the same distribution (same
        # construction as tools/pq_scale.py)
        copies = [
            base.select(
                (F.col("vec_id") + 100_000 * k).alias("vec_id"),
                (
                    F.col("embedding")
                    if k == 0
                    else F.expr(
                        "transform(embedding, "
                        f"(x, i) -> element_at(embedding, "
                        f"1 + (i + {k}) % size(embedding)))"
                    )
                ).alias("embedding"),
            )
            for k in range(10)
        ]
        big = copies[0]
        for c_ in copies[1:]:
            big = big.unionByName(c_)
        big = big.localCheckpoint(eager=True)

        batch = (
            base.orderBy("vec_id")
            .limit(200)
            .select(
                (F.col("vec_id") + 5_000_000).alias("vec_id"),
                "embedding",
            )
            .localCheckpoint(eager=True)
        )

        results: dict = {}
        raw_probe: dict = {}
        for label, corpus, n_cells in (
            ("corpus_1x", base, N_CELLS_1X),
            ("corpus_10x", big, N_CELLS_1X * 10),
        ):
            n_rows = corpus.count()
            # --- batch semdedup: time + candidate-pair count -------
            t0 = time.perf_counter()
            n_kept = S.semdedup_kept(
                corpus, "embedding", "vec_id",
                n_cells=n_cells, n_iters=2, threshold=THRESHOLD,
            ).count()
            batch_sec = time.perf_counter() - t0
            assigned = S.build_ivf_index_deterministic(
                corpus, "embedding", "vec_id",
                n_cells=n_cells, n_iters=2,
            )
            n_pairs = (
                assigned.groupBy("cell")
                .agg(F.count(F.lit(1)).alias("n"))
                .select(
                    F.sum(
                        F.col("n") * (F.col("n") - 1) / 2
                    ).alias("pairs")
                )
                .first()["pairs"]
            )
            # --- incremental probe against the persisted index ----
            item = f"sdix_{label}"
            t0 = time.perf_counter()
            col.build_vector_index(
                item, corpus, n_cells=n_cells, n_iters=2,
                overwrite=True,
            )
            build_sec = time.perf_counter() - t0
            col.semantic_dedup_probe(
                item, batch, threshold=THRESHOLD, nprobe=1
            ).collect()  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                col.semantic_dedup_probe(
                    item, batch, threshold=THRESHOLD, nprobe=1
                ).collect()
                best = min(best, time.perf_counter() - t0)
            raw_probe[label] = best
            results[label] = {
                "n_rows": n_rows,
                "semdedup_sec": round(batch_sec, 2),
                "n_kept": n_kept,
                "candidate_pairs": int(n_pairs),
                "pairs_per_row": round(n_pairs / n_rows, 1),
                "index_build_sec": round(build_sec, 2),
                "probe_sec": round(best, 2),
            }
        r1, r10 = results["corpus_1x"], results["corpus_10x"]
        out["results"] = results
        out["pairs_ratio_10x_corpus"] = round(
            r10["candidate_pairs"] / r1["candidate_pairs"], 2
        )
        # ratio from the UNROUNDED timings: a sub-5ms probe rounds
        # to 0.00 for display and must not divide-by-zero here
        out["probe_ratio_10x_corpus"] = round(
            raw_probe["corpus_10x"] / max(raw_probe["corpus_1x"], 1e-9),
            2,
        )
        quad = r10["candidate_pairs"] / r1["candidate_pairs"] > 30
        probe_flat = out["probe_ratio_10x_corpus"] < 2.0
        out["verdict"] = (
            ("pairs grow ~linearly with cells scaled to the corpus"
             if not quad
             else "pair stage is quadratic — REGRESSION")
            + "; "
            + ("probe is corpus-independent"
               if probe_flat
               else "probe scales with corpus — REGRESSION")
        )
    finally:
        cfg._path = old_path
        shutil.rmtree(tmp, ignore_errors=True)

    Path(
        Path(__file__).resolve().parent.parent / "BENCH_SEMDEDUP.json"
    ).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
