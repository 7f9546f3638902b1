"""Memory introspection utilities.

Reference surface: pystore/memory.py:41-67 (get_memory_info /
check_memory_usage), :235-250 (MemoryMonitor), :69-89
(memory_efficient_read). The reference watches ONE process because its
engine is single-node; on Spark the driver is only the coordinator, so
the Spark-native mapping adds :func:`executor_memory_report`, which
reads per-executor storage-memory state from the SparkContext — the
numbers that actually matter at cluster scale.

psutil is not available in this environment; driver stats come from
``/proc`` + ``resource`` (Linux) with graceful degradation elsewhere.
"""

from __future__ import annotations

import gc
import os
from contextlib import contextmanager
from typing import Any

from pystore_spark.logger import get_logger

logger = get_logger(__name__)

# reference thresholds: pystore/memory.py:36-38
MEMORY_WARNING_THRESHOLD = 0.8
MEMORY_CRITICAL_THRESHOLD = 0.9

_GB = 1024 ** 3


def _proc_meminfo() -> dict[str, int]:
    out: dict[str, int] = {}
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                parts = line.split()
                if len(parts) >= 2 and parts[0].endswith(":"):
                    out[parts[0][:-1]] = int(parts[1]) * 1024  # kB → B
    except OSError:
        pass
    return out


def get_memory_info() -> dict[str, float]:
    """Driver-process + host memory snapshot (reference
    get_memory_info: pystore/memory.py:41-57), psutil-free."""
    mem = _proc_meminfo()
    total = mem.get("MemTotal", 0)
    avail = mem.get("MemAvailable", mem.get("MemFree", 0))
    rss = vms = 0
    try:
        with open(f"/proc/{os.getpid()}/statm") as fh:
            size_pages, rss_pages = map(int, fh.read().split()[:2])
        page = os.sysconf("SC_PAGE_SIZE")
        rss, vms = rss_pages * page, size_pages * page
    except (OSError, ValueError):
        try:  # non-Linux fallback: peak RSS only
            import resource

            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
        except Exception:
            pass
    return {
        "total_gb": total / _GB,
        "available_gb": avail / _GB,
        "used_percent": (1 - avail / total) if total else 0.0,
        "process_rss_gb": rss / _GB,
        "process_vms_gb": vms / _GB,
    }


def check_memory_usage() -> dict[str, float]:
    """Log a warning above the reference thresholds (pystore/
    memory.py:59-67); returns the snapshot it judged."""
    info = get_memory_info()
    pct = info["used_percent"]
    if pct > MEMORY_CRITICAL_THRESHOLD:
        logger.warning(
            "Critical memory usage: %.1f%% (%.1f GB available)",
            pct * 100, info["available_gb"],
        )
    elif pct > MEMORY_WARNING_THRESHOLD:
        logger.warning(
            "High memory usage: %.1f%% (%.1f GB available)",
            pct * 100, info["available_gb"],
        )
    return info


def executor_memory_report(spark) -> list[dict[str, Any]]:
    """Per-executor storage-memory state — the cluster-scale analog of
    the reference's single-process view. One py4j call, no Spark job."""
    report = []
    try:
        status = spark._jsc.sc().getExecutorMemoryStatus()
        it = status.iterator()
        while it.hasNext():
            entry = it.next()
            max_mem = int(entry._2()._1())
            free_mem = int(entry._2()._2())
            report.append(
                {
                    "executor": str(entry._1()),
                    "max_memory_gb": max_mem / _GB,
                    "free_memory_gb": free_mem / _GB,
                    "used_percent": (
                        (max_mem - free_mem) / max_mem if max_mem else 0.0
                    ),
                }
            )
    except Exception as exc:  # py4j surface varies across builds
        logger.debug("executor memory status unavailable: %s", exc)
    return report


class MemoryMonitor:
    """Before/after memory deltas around a block of work (reference
    MemoryMonitor: pystore/memory.py:235-250)."""

    def __init__(self, label: str = "operation"):
        self.label = label
        self.start: dict[str, float] | None = None
        self.delta_gb: float | None = None

    def __enter__(self) -> "MemoryMonitor":
        self.start = get_memory_info()
        return self

    def __exit__(self, *exc) -> None:
        end = get_memory_info()
        assert self.start is not None
        self.delta_gb = end["process_rss_gb"] - self.start["process_rss_gb"]
        logger.debug(
            "%s: rss %+0.3f GB (now %.3f GB)",
            self.label, self.delta_gb, end["process_rss_gb"],
        )


@contextmanager
def memory_efficient_read(spark=None, max_partition_bytes: int = 32 * 1024 * 1024):
    """Bound per-task input size for a memory-tight read (the Spark
    analog of the reference's dask chunk-size clamp,
    pystore/memory.py:69-89): temporarily lowers
    ``spark.sql.files.maxPartitionBytes`` so scans split into smaller
    tasks, and gc-collects around the block."""
    prev = None
    key = "spark.sql.files.maxPartitionBytes"
    if spark is not None:
        try:
            prev = spark.conf.get(key)
            spark.conf.set(key, str(max_partition_bytes))
        except Exception:
            prev = None
    gc.collect()
    try:
        yield
    finally:
        if spark is not None and prev is not None:
            try:
                spark.conf.set(key, prev)
            except Exception:
                pass
        gc.collect()
