"""Native format("pystore") source — pushdown evidence.

Round 7 added pushFilters (arrow-side row filtering); round 8 added
driver-side FILE pruning in partitions() from the pushed filters
(manifest zonemap + derived _pb bucket terms — the same rules Item
reads use). This probe measures both layers at bench scale: a
selective index-range read over a 60-bucket item with Spark's Python
datasource pushdown ON vs OFF — wall time, partitions scheduled, and
bytes behind them.

Writes BENCH_DATASOURCE.json at the repo root.
Usage: python tools/datasource_scale.py
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_ROWS = 1_000_000  # ~60 daily buckets at 1 row/5s


def main() -> None:
    import numpy as np
    import pandas as pd

    import pystore_spark as ps
    from pystore_spark import config as cfg
    from pystore_spark.datasource import (
        PyStoreBatchReader, register, source_options,
    )
    from pystore_spark.session import get_spark

    spark = get_spark(app_name="datasource_scale")
    spark.sparkContext.setLogLevel("ERROR")
    register(spark)

    out: dict = {"metric": "datasource_pushdown", "rows": N_ROWS}
    tmp = tempfile.mkdtemp(prefix="ps_ds_scale_")
    old_path = cfg._path
    try:
        cfg.set_path(tmp)
        col = ps.store("ds_scale", spark=spark).collection("c")
        pdf = pd.DataFrame(
            {"v": np.arange(N_ROWS, dtype="float64")},
            index=pd.date_range(
                "2023-01-01", periods=N_ROWS, freq="5s"
            ),
        )
        col.write("fact", pdf, freq="D")
        man_files = len(
            (col.item("fact")._manifest or {}).get("files") or []
        )
        pred = "index >= timestamp'2023-01-10' AND index < timestamp'2023-01-11'"
        expected = 17_280  # one day at 5s cadence

        # Spark refuses to PLAN a source implementing pushFilters with
        # the conf off, so the no-pushdown baseline is a twin source
        # whose reader hides the override
        from pyspark.sql.datasource import DataSourceReader
        from pystore_spark.datasource import PyStoreDataSource

        class _NoPushReader(PyStoreBatchReader):
            pushFilters = DataSourceReader.pushFilters

        class _NoPushSource(PyStoreDataSource):
            @classmethod
            def name(cls) -> str:
                return "pystore_nopush"

            def reader(self, schema):
                return _NoPushReader(dict(self.options), schema)

        spark.dataSource.register(_NoPushSource)

        def _timed_read(fmt: str) -> tuple[float, int]:
            t0 = time.perf_counter()
            n = (
                spark.read.format(fmt)
                .options(**source_options(col, "fact"))
                .load()
                .filter(pred)
                .count()
            )
            return time.perf_counter() - t0, n

        # warm the sources + codegen out of the timed region
        _timed_read("pystore")
        _timed_read("pystore_nopush")

        off_sec, n_off = _timed_read("pystore_nopush")
        on_sec, n_on = _timed_read("pystore")
        assert n_off == n_on == expected, (n_off, n_on)

        # partitions scheduled + bytes behind them, via the reader
        d = (
            spark.read.format("pystore")
            .options(**source_options(col, "fact"))
            .load()
        )
        base = PyStoreBatchReader(
            source_options(col, "fact"), d.schema
        )
        n_parts_all = len(base.partitions())
        import datetime

        from pyspark.sql.datasource import (
            GreaterThanOrEqual, LessThan,
        )

        pruned = PyStoreBatchReader(
            source_options(col, "fact"), d.schema
        )
        list(
            pruned.pushFilters(
                [
                    GreaterThanOrEqual(
                        ("index",), datetime.datetime(2023, 1, 10)
                    ),
                    LessThan(
                        ("index",), datetime.datetime(2023, 1, 11)
                    ),
                ]
            )
        )
        sel = pruned.partitions()
        item_path = Path(col._item_path("fact"))
        sel_bytes = sum(Path(p.path).stat().st_size for p in sel)
        all_bytes = sum(
            (item_path / r).stat().st_size
            for r in (col.item("fact")._manifest or {}).get("files")
            or []
        )
        out.update(
            {
                "files_live": man_files,
                "partitions_without_pushdown": n_parts_all,
                "partitions_with_pushdown": len(sel),
                "bytes_total": all_bytes,
                "bytes_selected": sel_bytes,
                "read_sec_pushdown_off": round(off_sec, 3),
                "read_sec_pushdown_on": round(on_sec, 3),
                "speedup": round(off_sec / max(on_sec, 1e-9), 2),
                "verdict": (
                    "a one-day index-range read of a 60-bucket item "
                    "schedules only the matching bucket's partitions "
                    "(driver-side prune_files on the pushed filters) "
                    "and row-filters arrow-side before the JVM — at "
                    "100 TB the win is the scheduled-bytes ratio, "
                    "which is structural, not the toy-scale wall time"
                ),
            }
        )
    finally:
        cfg._path = old_path
        shutil.rmtree(tmp, ignore_errors=True)
    dst = Path(__file__).resolve().parent.parent / "BENCH_DATASOURCE.json"
    dst.write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
