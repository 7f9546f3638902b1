"""Deletion-vector scale evidence: scattered-delete cost, dv vs
rewrite, at 10x the corpus.

delete_where(mode="dv") claims the 100 TB GDPR shape: a delete whose
matches are SCATTERED across every bucket writes O(matching rows) of
mask positions plus one manifest CAS — while mode="rewrite" must
re-write every bucket that contains even one match, i.e. the whole
item. Measured directly: two corpus sizes 10x apart, each carrying
the SAME fixed count of tombstone-marked rows spread uniformly over
all buckets, deleted once per mode on identical twin items. The
decisive evidence is the rewrite cost growing with the corpus while
the dv cost grows only with the (corpus-independent) match scan, and
the post-delete read paying a bounded anti-join surcharge.

Writes BENCH_DV.json at the repo root.
Usage: python tools/dv_scale.py
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_TOMBSTONES = 1_000


def main() -> None:
    import numpy as np
    import pandas as pd

    import pystore_spark as ps
    from pystore_spark import config as cfg
    from pystore_spark.session import get_spark

    spark = get_spark(app_name="dv_scale")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"metric": "dv_delete_scaling", "cases": {}}
    tmp = tempfile.mkdtemp(prefix="ps_dv_scale_")
    old_path = cfg._path
    try:
        cfg.set_path(tmp)
        col = ps.store("dv_scale", spark=spark).collection("c")
        # warmup: first Spark job + codegen out of the timed region
        warm = pd.DataFrame(
            {"v": np.arange(30_000, dtype="float64"),
             "tomb": np.zeros(30_000)},
            index=pd.date_range("2020-01-01", periods=30_000,
                                freq="min"),
        )
        warm.iloc[::100, warm.columns.get_loc("tomb")] = 1.0
        col.write("warm", warm)
        col.delete_where("warm", [[("tomb", "==", 1.0)]], mode="dv")

        for label, n in (("62d_90k", 90_000), ("625d_900k", 900_000)):
            pdf = pd.DataFrame(
                {"v": np.arange(n, dtype="float64"),
                 "tomb": np.zeros(n)},
                index=pd.date_range("2023-01-01", periods=n,
                                    freq="min"),
            )
            # the SAME fixed tombstone count at both scales, spread
            # over every bucket — isolates write cost from match count
            pdf.iloc[:: n // N_TOMBSTONES,
                     pdf.columns.get_loc("tomb")] = 1.0
            pred = [[("tomb", "==", 1.0)]]
            col.write(f"dv_{label}", pdf)
            col.write(f"rw_{label}", pdf)

            def _files(item):
                p = Path(col._item_path(item))
                from pystore_spark import utils
                man = utils.read_manifest(str(p))
                return {
                    r: (p / r).stat().st_size
                    for r in man.get("files") or []
                }

            rw_before = _files(f"rw_{label}")

            t0 = time.perf_counter()
            rep_dv = col.delete_where(f"dv_{label}", pred, mode="dv")
            dv_sec = time.perf_counter() - t0
            dv_dir = Path(col._item_path(f"dv_{label}"))
            dv_bytes = sum(
                f.stat().st_size
                for f in (dv_dir / rep_dv["dv_ref"]).rglob("*")
                if f.is_file()
            )

            t0 = time.perf_counter()
            rep_rw = col.delete_where(f"rw_{label}", pred,
                                      mode="rewrite")
            rw_sec = time.perf_counter() - t0
            rw_after = _files(f"rw_{label}")
            rw_bytes = sum(
                sz for r, sz in rw_after.items() if r not in rw_before
            )

            t0 = time.perf_counter()
            seen = col.item(f"dv_{label}").data.count()
            read_sec = time.perf_counter() - t0
            assert seen == n - rep_dv["n_deleted"], (seen, rep_dv)
            assert rep_dv["n_deleted"] == rep_rw["n_deleted"]

            # merge-on-read UPDATE of a second fixed scattered set
            # (fresh twin item): mask originals + append copies, one
            # CAS — write cost O(matches) like the dv delete
            col.write(f"up_{label}", pdf)
            t0 = time.perf_counter()
            rep_up = col.update_where(
                f"up_{label}", [[("tomb", "==", 1.0)]],
                set={"v": "v + 0.5"}, mode="dv",
            )
            up_sec = time.perf_counter() - t0
            assert rep_up["n_updated"] == rep_dv["n_deleted"]

            out["cases"][label] = {
                "rows": n,
                "n_deleted": rep_dv["n_deleted"],
                "files_masked": rep_dv["files_masked"],
                "buckets_rewritten_by_rewrite_mode": len(
                    rep_rw["buckets_rewritten"]
                ),
                "dv_delete_sec": round(dv_sec, 3),
                "rewrite_delete_sec": round(rw_sec, 3),
                "dv_update_sec": round(up_sec, 3),
                "dv_bytes_written": dv_bytes,
                "rewrite_bytes_written": rw_bytes,
                "masked_read_sec": round(read_sec, 3),
            }
        # mask-debt fold (round 8): a 40%-masked item pays the
        # anti-join on every read until compact's masked-fraction
        # trigger (config.DV_FOLD_MASKED_FRACTION) folds the mask into
        # a rewrite — measure the masked read before vs after the fold
        n = 400_000
        pdf = pd.DataFrame(
            {"v": np.arange(n, dtype="float64"),
             # 40% of EVERY file masked (uniform per bucket), so each
             # masked file exceeds the fold fraction — no boundary
             # file straddles the threshold
             "m": np.arange(n, dtype="float64") % 10.0},
            index=pd.date_range("2023-01-01", periods=n, freq="min"),
        )
        col.write("fold", pdf)
        col.delete_where("fold", [[("m", "<", 4.0)]], mode="dv")
        t0 = time.perf_counter()
        before_rows = col.item("fold").data.count()
        masked_read_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        rep_fold = col.compact("fold")
        fold_sec = time.perf_counter() - t0
        assert rep_fold["buckets_compacted"] >= 1, rep_fold
        from pystore_spark import dv as dvm
        from pystore_spark import utils as _u

        assert dvm.dv_total(
            _u.read_manifest(col._item_path("fold"))
        ) == 0
        t0 = time.perf_counter()
        after_rows = col.item("fold").data.count()
        folded_read_sec = time.perf_counter() - t0
        assert before_rows == after_rows == n - int(n * 0.4)
        out["mask_debt_fold"] = {
            "rows": n,
            "masked_fraction": 0.4,
            "masked_read_sec": round(masked_read_sec, 3),
            "fold_compact_sec": round(fold_sec, 3),
            "folded_read_sec": round(folded_read_sec, 3),
            "read_speedup_after_fold": round(
                masked_read_sec / max(folded_read_sec, 1e-9), 2
            ),
            "note": (
                "compact's census selects buckets on masked-fraction "
                "> DV_FOLD_MASKED_FRACTION as well as small files, so "
                "long-lived heavy masks fold under nightly maintain() "
                "and reads stop paying the anti-join"
            ),
        }
        a = out["cases"]["62d_90k"]
        b = out["cases"]["625d_900k"]
        out["dv_time_ratio_at_10x"] = round(
            b["dv_delete_sec"] / a["dv_delete_sec"], 2
        )
        out["rewrite_time_ratio_at_10x"] = round(
            b["rewrite_delete_sec"] / a["rewrite_delete_sec"], 2
        )
        out["dv_bytes_ratio_at_10x"] = round(
            b["dv_bytes_written"] / max(a["dv_bytes_written"], 1), 2
        )
        out["rewrite_bytes_ratio_at_10x"] = round(
            b["rewrite_bytes_written"]
            / max(a["rewrite_bytes_written"], 1), 2
        )
        out["dv_write_amplification_saved_at_10x"] = round(
            b["rewrite_bytes_written"] / max(b["dv_bytes_written"], 1),
            1,
        )
        out["verdict"] = (
            "scattered delete of a FIXED match count: dv bytes stay "
            "flat at 10x the corpus (O(matches) mask + one CAS) while "
            "rewrite bytes grow with every touched bucket — wall "
            "times at this toy scale are scheduler-dominated, the "
            "bytes ratio is the structural 100 TB evidence"
        )
    finally:
        cfg._path = old_path
        shutil.rmtree(tmp, ignore_errors=True)
    dst = Path(__file__).resolve().parent.parent / "BENCH_DV.json"
    dst.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
