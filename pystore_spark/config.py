"""Engine configuration: warehouse root path and defaults.

Reference: pystore/config.py:24-30 (PYSTORE_PATH env + ~/pystore
default, partition-size knob).
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_PATH = os.path.expanduser("~/pystore_spark")

# write-path partition planning targets (reference:
# pystore/partition.py:33-35 — 128 MB target, 32 MB min, 512 MB max)
PARTITION_TARGET_BYTES = 128 * 1024 * 1024
PARTITION_MIN_BYTES = 32 * 1024 * 1024
PARTITION_MAX_BYTES = 512 * 1024 * 1024
MAX_PARTITIONS = 100_000  # reference clamps to 100 (pystore/partition.py:81)
                          # — far too low for 100 TB items; keep a sane backstop

# metadata cache TTL (reference: pystore/collection.py:116-136 — 5 min)
METADATA_CACHE_TTL_SECONDS = 300.0

# Driver-side Arrow fast-path ceiling (write/append; see arrow_path.py).
# Frames estimated above this always take the distributed Spark path;
# 0 disables the fast path entirely.
DRIVER_PATH_MAX_BYTES = int(
    os.environ.get("PYSTORE_SPARK_DRIVER_PATH_MAX_BYTES", 256 * 1024 * 1024)
)

# Manifest commit protocol (see manifest.py): replaced data files are
# kept on disk for this long after they leave the live manifest, so
# in-flight readers holding the previous manifest never hit a missing
# file (the MVCC retention window — same idea as Delta/Iceberg VACUUM).
STALE_RETENTION_SECONDS = float(
    os.environ.get("PYSTORE_SPARK_STALE_RETENTION_SECONDS", 600)
)
# Staged files that never made it into a manifest (crash before the
# commit rename) are orphans; they are invisible to readers and are
# garbage-collected once older than this.
ORPHAN_GRACE_SECONDS = float(
    os.environ.get("PYSTORE_SPARK_ORPHAN_GRACE_SECONDS", 3600)
)
# compact/maintain fold a file's deletion-vector mask into a rewrite
# once masked rows exceed this fraction of its footer rows — the
# Delta-purge analog: a long-lived heavy mask makes every read pay an
# anti-join over mostly-dead rows forever (dv.py)
DV_FOLD_MASKED_FRACTION = float(
    os.environ.get("PYSTORE_SPARK_DV_FOLD_MASKED_FRACTION", 0.30)
)

# dedup_substrings hot-gram split point: a gram occurring in more rows
# than this is boilerplate-hot — its (gram → first-owner) row is
# broadcast so the hot key never shuffles, while cold keys keep the
# plain gram-keyed join with per-key rows bounded by this cap
# (functions/text.dedup_substrings). The hot set is ≤ total_grams/cap
# rows by construction.
SUBSTRING_HOT_GRAM_ROWS = int(
    os.environ.get("PYSTORE_SPARK_SUBSTRING_HOT_GRAM_ROWS", 262_144)
)

# IVF vector-index centroid-staleness thresholds: appended vectors are
# cell-assigned with centroids PINNED at build time, so under
# distribution drift the per-vector KMeans objective (mean squared
# distance to the assigned centroid) rises and cell sizes unbalance —
# recall sags invisibly. The staleness audit flags the index once the
# current mean distance exceeds DIST_RATIO × the build-time figure or
# the cell skew exceeds SKEW_RATIO × the build-time skew;
# maintain() then retrains + reassigns (Collection.retrain_vector_index)
VECTOR_STALENESS_DIST_RATIO = float(
    os.environ.get("PYSTORE_SPARK_VECTOR_STALENESS_DIST_RATIO", 1.25)
)
VECTOR_STALENESS_SKEW_RATIO = float(
    os.environ.get("PYSTORE_SPARK_VECTOR_STALENESS_SKEW_RATIO", 4.0)
)
# A build-time mean distance at or below this is "not comparable":
# ratios against a ~0 denominator (n_vectors <= n_cells, perfectly
# clustered data) explode without meaning anything — the staleness
# audit then decides on cell skew alone (reported dist_comparable).
VECTOR_STALENESS_DIST_EPS = float(
    os.environ.get("PYSTORE_SPARK_VECTOR_STALENESS_DIST_EPS", 1e-9)
)

# Incremental shard-refresh source pruning (Collection.
# refresh_training_shards): the rebuild restricts the full-width
# source read to affected-shard rows via a key set computed from
# COLUMN-PRUNED scans (id column only / the export's partition-pruned
# (_src_id, shard) columns). Key sets up to ISIN_CAP become a
# PUSHABLE In(id) predicate — parquet row-group stats / dictionaries
# / blooms skip the text pages outright. The cap is POINT-LOOKUP
# sized on purpose: a thousands-literal In() is a planner cost at any
# data size (measured 3× slower than the plain scan at the sf1
# probe), so anything larger takes the broadcast left-semi join
# (ids-only build side; the full-width source never shuffles) up to
# BROADCAST_CAP. Beyond that — or when at least FULLSCAN_FRACTION of
# the shards are affected — the refresh is degenerate by the scatter
# math (n·(1−(1−1/n)^c)) and takes the plain full-scan plan a bulk
# rebuild wants anyway.
#
# Pruning itself only pays once the text it AVOIDS reading outweighs
# the key-set pass + join (0.2-1.5 s fixed at local toy scale —
# BENCH_EXPORT_REFRESH's prune_tier audit — constant at cluster
# scale): sources below MIN_SOURCE_BYTES take the plain scan — free
# at that size — and the tiers engage where they matter.
EXPORT_PRUNE_ISIN_CAP = int(
    os.environ.get("PYSTORE_SPARK_EXPORT_PRUNE_ISIN_CAP", 64)
)
EXPORT_PRUNE_BROADCAST_CAP = int(
    os.environ.get(
        "PYSTORE_SPARK_EXPORT_PRUNE_BROADCAST_CAP", 2_000_000
    )
)
EXPORT_PRUNE_FULLSCAN_FRACTION = float(
    os.environ.get(
        "PYSTORE_SPARK_EXPORT_PRUNE_FULLSCAN_FRACTION", 0.5
    )
)
EXPORT_PRUNE_MIN_SOURCE_BYTES = int(
    os.environ.get(
        "PYSTORE_SPARK_EXPORT_PRUNE_MIN_SOURCE_BYTES", 1 << 30
    )
)

# dedup_substrings' hot-gram census costs two eager jobs (census
# materialization + max-count gate) before the ownership join can
# plan. Below this Catalyst size estimate of the input docs the whole
# min-owner computation runs as ONE window over the gram shuffle
# instead — no census, no gate, identical hits (min per gram is min
# per gram) — because at that size even a corpus-wide boilerplate
# gram's window partition is bounded by the input itself. Larger
# corpora keep the census + hot/cold split.
SUBSTRING_WINDOW_MIN_BYTES = int(
    os.environ.get(
        "PYSTORE_SPARK_SUBSTRING_WINDOW_MIN_BYTES", 64 << 20
    )
)

# cosine_dedup_pairs' hot-block skew gate costs one eager max-count
# job before the pair join can plan. Below this Catalyst size
# estimate the gate is SKIPPED and the plain block join runs
# unconditionally: at ~500 B/vector row the default (4 MiB ≈ 9k
# rows) bounds even the fully-skewed worst case (every row in one
# block) at ~8e7 pair folds — seconds of distributed work — so the
# probe job costs more than the skew it guards against. Identical
# results either way (the salted and plain joins are parity-pinned);
# this only picks the physical plan by input size, the
# EXPORT_PRUNE_MIN_SOURCE_BYTES discipline applied to SemDeDup.
COSINE_SKEW_GATE_MIN_BYTES = int(
    os.environ.get(
        "PYSTORE_SPARK_COSINE_SKEW_GATE_MIN_BYTES", 4 << 20
    )
)

# same discipline for lsh_candidate_pairs' bucket-count probe: below
# this input estimate even one bucket holding every doc is a bounded
# cheap self-join, so the eager max-count job is skipped and the
# plain per-bucket join runs (identical pair set — parity-pinned).
LSH_SKEW_GATE_MIN_BYTES = int(
    os.environ.get(
        "PYSTORE_SPARK_LSH_SKEW_GATE_MIN_BYTES", 4 << 20
    )
)

# bm25_topk tier gate (r13): ABOVE this Catalyst size estimate of the
# (id, text) projection the corpus stats, per-term document
# frequencies and hit postings all derive from ONE pinned
# (id, term) aggregation — the corpus is scanned and tokenized once
# instead of four times (the two-scan plan holds four copies of the
# scan+tokenize subtree), measured 2.3x faster at a 16x sf0.1 corpus
# and the only shape that survives 100 TB (4x the scan work never
# amortizes). BELOW it the two-scan plan stays: at toy scale the
# four subtrees run as concurrent cheap stages and the pin's extra
# exchange + materialization costs more than the re-scans it saves
# (measured 1.51 vs 1.71 s at sf0.1). Same results bit-for-bit on
# both tiers (parity-pinned).
BM25_SHARED_SCAN_MIN_BYTES = int(
    os.environ.get(
        "PYSTORE_SPARK_BM25_SHARED_SCAN_MIN_BYTES", 32 << 20
    )
)

# the deterministic KMeans trainers (coarse IVF + PQ codebooks) run
# 1 + n_iters sequential driver-blocking Spark jobs per training call
# — each a tiny scan + aggregation whose wall time at small inputs is
# dominated by fixed job-launch cost (~0.2-0.5 s of scheduling/AQE/
# py4j, r12 verdict's "job-sequence-bound" finding). Below this
# Catalyst size estimate of the TRAINING frame the trainer collects
# (id, vec) ONCE and runs the identical fold/quantized-mean recipe in
# numpy on the driver — one job instead of 1 + n_iters, bit-identical
# centroids (parity-pinned; the numpy loop accumulates components in
# the same sequential order as the fold expression). Larger inputs —
# i.e. anything at production scale — keep the distributed iteration.
# The row cap bounds driver memory when Catalyst underestimates a
# post-filter frame (ADVICE r12): the collect is LIMIT'ed to cap+1
# rows and falls back to the distributed path when the cap is hit.
KMEANS_DRIVER_TRAIN_MAX_BYTES = int(
    os.environ.get(
        "PYSTORE_SPARK_KMEANS_DRIVER_TRAIN_MAX_BYTES", 32 << 20
    )
)
KMEANS_DRIVER_TRAIN_MAX_ROWS = int(
    os.environ.get(
        "PYSTORE_SPARK_KMEANS_DRIVER_TRAIN_MAX_ROWS", 262_144
    )
)

_path: str | None = None


def get_path() -> str:
    """Warehouse root directory (``PYSTORE_SPARK_PATH`` env overrides)."""
    global _path
    if _path is None:
        _path = os.environ.get("PYSTORE_SPARK_PATH", _DEFAULT_PATH)
    return _path


def set_path(path: str) -> str:
    """Set the warehouse root (reference: pystore/utils.py:116-149).
    Scheme-dispatched: local paths expand ~; ``fakes3://`` roots mount
    the in-memory object store (see fs.resolve_warehouse)."""
    global _path
    from pystore_spark import fs as fslib

    resolved = fslib.resolve_warehouse(str(path).rstrip("/"))
    fslib.fs_for(resolved).mkdirs(resolved)
    _path = resolved
    return _path
