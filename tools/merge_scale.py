"""merge_into scale evidence: bucket-scoped MERGE cost vs item size.

The claim (collection.merge_into docstring): when the merge key
includes the index on a time-layout item, only the buckets containing
source keys are joined and rewritten — so a fixed-size merge's cost is
set by the touched time range, not the item size. Measured directly:
the SAME ~3-day source (updates+deletes+inserts) merged into a ~3-month
item and a ~30-month (10×) item; the scoped merge time should stay
~flat while a whole-item-rewrite merge (key ≠ index) grows with the
item.

Writes BENCH_MERGE.json at the repo root.
Usage: python tools/merge_scale.py
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

    spark = get_spark(app_name="merge_scale")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"metric": "merge_into_scaling", "cases": {}}
    tmp = tempfile.mkdtemp(prefix="ps_merge_scale_")
    old_path = cfg._path

    def frame(n, start="2023-01-01"):
        return pd.DataFrame(
            {
                "ts": pd.date_range(start, periods=n, freq="min"),
                "v": np.arange(n, dtype=float),
                "kid": np.arange(n) % 1000,
            }
        ).set_index("ts")

    try:
        cfg.set_path(tmp)
        col = ps.store("merge_scale", spark=spark).collection("c")
        # warmup
        col.write("warm", frame(20_000))
        col.merge_into(
            "warm", frame(1_000), on="ts", when_matched="update_all"
        )

        src_n = 4_000  # ~3 days of minutes, fixed across cases
        for label, n in (("x1_130k", 130_000), ("x10_1300k", 1_300_000)):
            pdf = frame(n)
            col.write(f"it_{label}", pdf)
            upd = pdf.iloc[1_000 : 1_000 + src_n // 2].copy()
            upd["v"] = -1.0
            new = frame(src_n // 2, start="2030-01-01")
            src = pd.concat([upd, new])
            t0 = time.perf_counter()
            rep = col.merge_into(
                f"it_{label}", src, on="ts",
                when_matched={"v": "s.v"},
                when_not_matched="insert_all",
            )
            scoped = time.perf_counter() - t0
            # contrast: same item size, key NOT the index → documented
            # whole-item rewrite path
            ksrc = pd.DataFrame(
                {
                    "ts": pd.date_range(
                        "2040-01-01", periods=200, freq="min"
                    ),
                    "v": 0.0,
                    "kid": np.arange(200) + 5_000,  # all unmatched
                }
            ).set_index("ts")
            t1 = time.perf_counter()
            col.merge_into(
                f"it_{label}", ksrc, on="kid",
                when_matched={"v": "s.v"},
                when_not_matched=None,
            )
            whole = time.perf_counter() - t1
            out["cases"][label] = {
                "n_rows": n,
                "scoped_merge_sec": round(scoped, 4),
                "whole_item_merge_sec": round(whole, 4),
                "n_updated": rep["n_updated"],
                "n_inserted": rep["n_inserted"],
            }
        x1 = out["cases"]["x1_130k"]
        x10 = out["cases"]["x10_1300k"]
        out["scoped_ratio_at_10x"] = round(
            x10["scoped_merge_sec"] / x1["scoped_merge_sec"], 3
        )
        out["whole_item_ratio_at_10x"] = round(
            x10["whole_item_merge_sec"] / x1["whole_item_merge_sec"], 3
        )
    finally:
        cfg._path = old_path
        shutil.rmtree(tmp, ignore_errors=True)
    dest = Path(__file__).resolve().parent.parent / "BENCH_MERGE.json"
    dest.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
