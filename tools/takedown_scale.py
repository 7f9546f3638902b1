"""GDPR-takedown end-to-end drill at sf1-equivalent corpus scale.

One flow, timed per stage, the way an operator runs a takedown:

1. ``delete_where(refresh_exports=True, repair_indexes=True)`` — the
   row-level DELETE plus automatic repair of every derived artifact
   (dedup index, training-shard export) in the same call;
2. ``verify_export`` — the id-space fsck proving no taken-down row
   still ships to trainers and no surviving doc went missing;
3. ``maintain`` — the nightly job whose export audit is the backstop
   for drift (must come back clean right after a takedown).

``EXPORT_PRUNE_MIN_SOURCE_BYTES`` is forced to 0 so the refresh's
source-prune tiers run against real storage at this scale instead of
short-circuiting to the toy-scale full scan: the first takedown
exercises the broadcast left-semi tier (affected-shard membership in
the thousands), the second raises EXPORT_PRUNE_ISIN_CAP so the same
membership pushes into the parquet reader as ``In(doc_id ...)``. Each
stage's wall time, the prune tier the refresh chose, and the audit
outcomes land in BENCH_TAKEDOWN.json.

Corpus: the sf0.1 documents table replicated 10x with shifted ids and
rotated text (the scale_probe recipe, ~50k docs) — large enough that
per-stage costs are real work, small enough for the sandbox.

Usage: python tools/takedown_scale.py
Writes BENCH_TAKEDOWN.json at the repo root.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import functions as F

    import pystore_spark as ps
    from pystore_spark import config as cfg
    from pystore_spark.session import get_spark
    from pystore_spark.sources import load_table

    spark = get_spark(app_name="takedown_scale")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="ps_takedown_")
    old_path = cfg._path
    old_min = cfg.EXPORT_PRUNE_MIN_SOURCE_BYTES
    old_isin = cfg.EXPORT_PRUNE_ISIN_CAP
    out: dict = {"metric": "takedown_end_to_end_sf1eq"}
    try:
        cfg.set_path(tmp)
        col = ps.store("scale", spark=spark).collection("c")
        base = load_table(
            spark, "/root/testdata/sf0.1", "documents"
        ).select("doc_id", "text")
        copies = [
            base.select(
                (F.col("doc_id") + 100_000 * k).alias("doc_id"),
                F.concat(F.lit(f"copy{k} "), F.col("text")).alias(
                    "text"
                ),
            )
            for k in range(10)
        ]
        docs = copies[0]
        for c_ in copies[1:]:
            docs = docs.unionByName(c_)
        docs = docs.localCheckpoint(eager=True)
        n_docs = docs.count()
        out["n_docs"] = n_docs

        t0 = time.perf_counter()
        col.write("corpus", docs, index_col="doc_id")
        col.build_dedup_index("cidx", "corpus")
        col.export_training_shards(
            "exp", "corpus", n_shards=64, pack_budget=512
        )
        out["setup_sec"] = round(time.perf_counter() - t0, 2)

        # takedowns run the prune tiers against real storage
        cfg.EXPORT_PRUNE_MIN_SOURCE_BYTES = 0
        runs = []
        victims = [r["doc_id"] for r in docs.orderBy("doc_id").limit(6).collect()]
        for label, ids, isin_cap in (
            ("semi_join_tier", victims[:3], old_isin),
            ("isin_tier", victims[3:], 1 << 20),
        ):
            cfg.EXPORT_PRUNE_ISIN_CAP = isin_cap
            stages: dict = {"deleted_ids": len(ids)}
            t0 = time.perf_counter()
            rep = col.delete_where(
                "corpus",
                [("doc_id", "in", list(ids))],
                refresh_exports=True,
                repair_indexes=True,
            )
            stages["delete_where_sec"] = round(
                time.perf_counter() - t0, 2
            )
            ers = rep.get("export_refreshes") or {}
            er = ers.get("exp") or next(iter(ers.values()), {})
            stages["rows_deleted"] = rep.get("n_deleted") or rep.get(
                "rows_deleted"
            )
            stages["export_refreshes_ok"] = rep.get(
                "export_refreshes_ok"
            )
            stages["prune_tier"] = er.get("source_prune")
            stages["shards_rebuilt"] = er.get("n_shards_rebuilt") or er.get(
                "shards_rebuilt"
            )

            t0 = time.perf_counter()
            fsck = col.verify_export("exp")
            stages["verify_export_sec"] = round(
                time.perf_counter() - t0, 2
            )
            stages["verify_export_clean"] = bool(fsck.get("ok"))
            stages["verify_export_raw"] = {
                k: v
                for k, v in fsck.items()
                if isinstance(v, (int, bool))
            }
            runs.append({label: stages})

        t0 = time.perf_counter()
        mrep = col.maintain(verify_indexes=True)
        out["maintain_sec"] = round(time.perf_counter() - t0, 2)
        exp_audit = (mrep.get("exp") or {}).get("verify_export") or {}
        out["maintain_export_audit"] = {
            k: v
            for k, v in exp_audit.items()
            if isinstance(v, (int, bool))
        }
        out["runs"] = runs
        out["all_clean"] = bool(exp_audit.get("ok")) and all(
            list(r.values())[0]["export_refreshes_ok"]
            and list(r.values())[0]["verify_export_clean"]
            for r in runs
        )
        out["verdict"] = (
            "clean — takedown end-to-end with pruned refresh"
            if out["all_clean"]
            else "AUDIT FAILURE"
        )
    finally:
        cfg._path = old_path
        cfg.EXPORT_PRUNE_MIN_SOURCE_BYTES = old_min
        cfg.EXPORT_PRUNE_ISIN_CAP = old_isin
        shutil.rmtree(tmp, ignore_errors=True)

    Path(
        Path(__file__).resolve().parent.parent / "BENCH_TAKEDOWN.json"
    ).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
