"""Text-index scale evidence: BM25 search cost vs corpus size.

The persistent inverted index (text_index.py) claims retrieval in
O(query-term postings): the `tp IN (...)` zonemap filter prunes base
files, so a search reads the query terms' postings and nothing else —
while the batch operator (functions/text.bm25_topk) re-explodes and
re-shuffles O(corpus) tokens per query. Measured directly: index the
sf0.1 documents corpus (5k docs) and a 10× key-shifted, token-
decorated replication (50k docs — every decorated copy's vocabulary
is distinct, so the QUERY TERMS' posting lists are identical at both
scales), then time the same query bag against each. The decisive
evidence is the indexed search staying ~flat at 10× the corpus while
the batch operator scales with it.

Writes BENCH_TEXT_INDEX.json at the repo root.
Usage: python tools/text_index_scale.py
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERY = ["spark", "query", "window", "vector"]


def main() -> None:
    from pyspark.sql import functions as F

    import pystore_spark as ps
    from pystore_spark import config as cfg
    from pystore_spark.functions.text import bm25_topk
    from pystore_spark.session import get_spark
    from pystore_spark.sources import load_table

    spark = get_spark(app_name="text_index_scale")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="ps_tidx_scale_")
    old_path = cfg._path
    out: dict = {"metric": "bm25_search_vs_corpus_size"}
    try:
        cfg.set_path(tmp)
        col = ps.store("scale", spark=spark).collection("c")
        base = load_table(
            spark, "/root/testdata/sf0.1", "documents"
        ).select("doc_id", "text")

        def replicate(k: int):
            """k key-shifted copies; copies ≥1 get per-copy token
            prefixes so their vocabulary is disjoint from the query
            bag — the corpus (and total postings) grow ~k× while the
            query terms' posting lists stay IDENTICAL, isolating the
            claimed O(query-postings) behavior."""
            if k == 1:
                return base
            copies = [base] + [
                base.select(
                    (F.col("doc_id") + 100_000 * i).alias("doc_id"),
                    F.array_join(
                        F.transform(
                            F.split("text", r"\s+"),
                            lambda t: F.concat(F.lit(f"c{i}_"), t),
                        ),
                        " ",
                    ).alias("text"),
                )
                for i in range(1, k)
            ]
            u = copies[0]
            for c in copies[1:]:
                u = u.unionByName(c)
            return u

        results = {}
        for k, label in ((1, "corpus_5k"), (10, "corpus_50k")):
            docs = replicate(k).localCheckpoint(eager=True)
            item, idx = f"corpus_{label}", f"tix_{label}"
            t0 = time.perf_counter()
            col.write(item, docs, index_col="doc_id")
            col.build_text_index(idx, item)
            build_sec = time.perf_counter() - t0

            def run_search() -> None:
                col.search_bm25(idx, QUERY, top_k=10).collect()

            run_search()  # warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                run_search()
                best = min(best, time.perf_counter() - t0)

            def run_batch() -> None:
                bm25_topk(
                    col.item(item).data, QUERY, top_k=10
                ).collect()

            run_batch()  # warm
            batch_best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                run_batch()
                batch_best = min(
                    batch_best, time.perf_counter() - t0
                )

            results[label] = {
                "build_sec": round(build_sec, 2),
                "indexed_search_sec": round(best, 3),
                "batch_bm25_sec": round(batch_best, 3),
            }
        r5, r50 = results["corpus_5k"], results["corpus_50k"]
        out["results"] = results
        out["indexed_search_ratio_10x_corpus"] = round(
            r50["indexed_search_sec"] / r5["indexed_search_sec"], 2
        )
        out["batch_operator_ratio_10x_corpus"] = round(
            r50["batch_bm25_sec"] / r5["batch_bm25_sec"], 2
        )
        out["indexed_vs_batch_speedup_at_50k"] = round(
            r50["batch_bm25_sec"] / r50["indexed_search_sec"], 2
        )
    finally:
        cfg._path = old_path
        shutil.rmtree(tmp, ignore_errors=True)

    path = Path(__file__).resolve().parent.parent / "BENCH_TEXT_INDEX.json"
    path.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
