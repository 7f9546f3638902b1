"""Persistent incremental line-census index — keep-one-owner line
dedup ACROSS TIME.

`functions/text.dedup_lines` removes corpus-wide boilerplate lines in
one batch pass; appending to a 100 TB curated item daily would have to
re-census the whole corpus to keep the rule. This module persists the
census the same way dedup_index.py persists MinHash band keys (the
round-5 incremental pattern):

* **base tier** — one row per distinct non-blank trimmed line the
  stored corpus owns: ``(lhp BIGINT, lh CHAR(32), owner)``; ``lh`` is
  the full md5 (exact membership — a 56-bit key alone would false-
  positive at the ~2²⁸-line birthday bound and silently DELETE novel
  lines), ``lhp`` its first-14-hex bigint prefix, the sort/zonemap
  key. Whole-batch probes span the uniform hash space, so they SCAN
  the census (in parallel, never shuffling it); the ordering/zonemap
  pays off in the fold's ordered rewrite and for range-restricted
  reads, not for probe pruning.
* **delta tier** — time-indexed on ``added_at``; each ingest appends
  its genuinely-new lines there in O(batch) via the engine's
  partition-scoped append. ``refresh_line_index`` (wired into
  ``Collection.maintain``) folds delta → base with the same
  generation-pinned trim as the dedup index (dedup_index.trim_delta —
  rows landing mid-fold survive).

Probe shape (``dedup_lines_incremental``): the batch's distinct line
hashes BROADCAST against one streaming scan of base ∪ delta (semi
join — the census never shuffles, and the scan parallelizes across
the cluster); the hit set is batch-bounded and broadcasts back into
the per-line anti join. Batches whose distinct-line count exceeds the
broadcast gate fall back to a plain shuffle join (the dedup.py
cheap-gate pattern). Cost per ingest: O(batch) + one parallel census
scan; never a census shuffle, never a corpus re-census.

No reference counterpart (pystore has no text surface); this extends
SURVEY §2.13's incremental family.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pystore_spark.exceptions import StorageError
from pystore_spark.functions import text as X

META_KEY = "_line_index"

#: above this many distinct batch lines the probe abandons the forced
#: broadcast (a 32-char hash per line — 2M ≈ 64 MB) for a shuffle join
BROADCAST_LINES_MAX = 2_000_000


def _lhp(lh_col) -> Any:
    """First-14-hex bigint prefix of an md5 column — the base tier's
    sort/zonemap key (same recipe as dedup_index bkey)."""
    return F.conv(F.substring(lh_col, 1, 14), 16, 10).cast("bigint")


def _census(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(lhp, lh, owner) — distinct lines with their first owner.
    Derived from functions/text.line_census (the batch operator's
    census) so split/trim/hash semantics can never diverge between
    the persistent index and the batch path it claims equivalence
    with."""
    return X.line_census(df, id_col, text_col).select(
        _lhp(F.col("_lh")).alias("lhp"),
        F.col("_lh").alias("lh"),
        F.col("_owner").alias("owner"),
    )


def build_line_index(
    col,
    index_item: str,
    source,
    text_col: str = "text",
    id_col: str = "doc_id",
    overwrite: bool = False,
) -> dict:
    """Full census build over a stored item (by name) or DataFrame.
    One corpus pass; after this, ingests probe instead of re-censusing.
    """
    from pystore_spark import dedup_index as DI

    if not overwrite and col.item_exists(index_item):
        from pystore_spark.exceptions import ItemExistsError

        raise ItemExistsError(
            f"line index {index_item!r} already exists; use "
            "overwrite=True to rebuild"
        )
    df = (
        DI._read_frame(col, source) if isinstance(source, str) else source
    )
    census = _census(df, text_col, id_col).localCheckpoint(eager=True)
    meta = {
        "text_col": text_col,
        "id_col": id_col,
        "delta_item": f"{index_item}__delta",
        "source_item": source if isinstance(source, str) else None,
    }
    col.write(
        index_item,
        census,
        index_col="lhp",
        zonemap=["lhp"],
        overwrite=overwrite,
        sidecar_extra={META_KEY: meta},
    )
    if col.item_exists(meta["delta_item"]):
        col.delete_item(meta["delta_item"])
    return {"index_item": index_item, "n_lines": census.count()}


def _index_meta(col, index_item: str) -> dict:
    meta = (col.get_item_metadata(index_item) or {}).get(META_KEY)
    if not meta:
        raise StorageError(
            f"item {index_item!r} is not a line index "
            "(build_line_index creates one)"
        )
    return meta


def _stored_lines(col, index_item: str, meta: dict) -> DataFrame:
    from pystore_spark import dedup_index as DI

    return DI._union_tiers(
        col, index_item, meta["delta_item"], ["lh"]
    )


def dedup_lines_incremental(
    col,
    index_item: str,
    df: DataFrame,
    update_index: bool = True,
) -> tuple[DataFrame, dict]:
    """Keep-one-owner line dedup against the STORED corpus, O(batch):

    1. batch-internal pass (functions/text.dedup_lines) — lines shared
       within the batch keep one owner;
    2. every surviving line the census already contains is removed
       (the stored corpus owns it);
    3. the batch's genuinely-new lines register in the delta tier
       (``update_index=True``) so the NEXT batch loses them.

    ``update_index=False`` DEFERS registration: the report carries the
    materialized new-line census under ``"_new_census"`` for
    :func:`register_new_lines` — the ingest path appends FIRST and
    registers only the surviving documents' lines, so a doc dropped by
    downstream near-dedup (or a failed append) can never orphan its
    lines in the census (lines owned by nothing stored would be
    silently stripped from every future batch).

    Returns ``(cleaned_df, report)``; both the cleaned frame and the
    batch-internal dedup result are materialized (eager
    localCheckpoint) because several downstream actions consume them —
    without it the 3-shuffle batch dedup re-runs per action."""
    meta = _index_meta(col, index_item)
    id_col, text_col = meta["id_col"], meta["text_col"]

    cleaned = X.dedup_lines(df, id_col, text_col).localCheckpoint(
        eager=True
    )
    lines = cleaned.select(
        F.col(id_col),
        F.posexplode(X.split_lines(text_col)).alias("_pos", "_line"),
    ).withColumn(
        "_lh",
        F.when(F.trim("_line") != "", F.md5(F.trim("_line"))),
    )
    batch_lh = (
        lines.filter(F.col("_lh").isNotNull())
        .select(F.col("_lh").alias("lh"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_batch_lines = batch_lh.count()
    stored = _stored_lines(col, index_item, meta)
    if n_batch_lines <= BROADCAST_LINES_MAX:
        # census scans in parallel and never shuffles; the batch-
        # bounded hit set broadcasts back into the per-line anti join
        hits = stored.join(
            F.broadcast(batch_lh), on="lh", how="leftsemi"
        ).localCheckpoint(eager=True)
        kept = lines.join(
            F.broadcast(hits.withColumnRenamed("lh", "_lh")),
            on="_lh",
            how="left_anti",
        )
    else:  # cheap-gate fallback: plain shuffle joins
        # checkpoint here too: `kept` feeds BOTH the rebuilt output
        # and the new-line census — left lazy, each consumer would
        # re-scan the full stored census (the expensive side at
        # exactly the batch sizes that take this branch)
        hits = stored.join(
            batch_lh, on="lh", how="leftsemi"
        ).localCheckpoint(eager=True)
        kept = lines.join(
            hits.withColumnRenamed("lh", "_lh"),
            on="_lh",
            how="left_anti",
        )
    out = X.rebuild_from_lines(
        cleaned, kept, id_col, text_col
    ).localCheckpoint(eager=True)
    report = {
        "n_batch_lines": n_batch_lines,
        "n_new_lines": 0,
        "broadcast_probe": n_batch_lines <= BROADCAST_LINES_MAX,
    }
    new_census = (
        kept.filter(F.col("_lh").isNotNull())
        .groupBy(F.col("_lh").alias("lh"))
        .agg(F.min(id_col).alias("owner"))
        .select(
            F.current_timestamp().alias("added_at"),
            _lhp(F.col("lh")).alias("lhp"),
            "lh",
            "owner",
        )
        .localCheckpoint(eager=True)
    )
    report["n_new_lines"] = new_census.count()
    if update_index:
        register_new_lines(col, index_item, new_census)
    else:
        report["_new_census"] = new_census
    return out, report


def register_new_lines(
    col, index_item: str, new_census: DataFrame
) -> None:
    """Append a batch's new-line census rows to the delta tier —
    called inside :func:`dedup_lines_incremental` for the standalone
    path, or AFTER a successful append (restricted to surviving
    owners) by ``Collection.ingest``."""
    meta = _index_meta(col, index_item)
    delta = meta["delta_item"]
    # an all-known-lines batch yields an empty census; writing it
    # through the Spark time-partitioned path would commit a delta
    # item with ZERO parquet files, and every later read of that
    # husk item fails — skip instead (nothing to register anyway)
    if new_census.isEmpty():
        return
    if col.item_exists(delta):
        col.append(delta, new_census, duplicate_handling="keep_all")
    else:
        col.write(delta, new_census, index_col="added_at")


def refresh_line_index(col, index_item: str) -> dict:
    """Fold the delta tier into the sorted, zonemapped base (LSM
    merge, wired into ``Collection.maintain``). Same concurrency
    discipline as dedup_index.refresh_index: the fold pins the delta
    generations it reads and the trim removes exactly those, so lines
    appended mid-fold survive to the next fold."""
    from pystore_spark import dedup_index as DI

    meta = _index_meta(col, index_item)
    delta = meta["delta_item"]
    if not col.item_exists(delta):
        return {"lines_folded": 0}
    delta_it = col.item(delta)
    n = DI._item_frame(col, delta_it).count()
    if not n:
        return {"lines_folded": 0}
    base = DI._read_frame(col, index_item).select("lhp", "lh", "owner")
    latest = (
        DI._item_frame(col, delta_it)
        .select("lhp", "lh", "owner")
        .dropDuplicates(["lh"])
    )
    # BASE WINS on conflict (explicit anti-join, not a dropDuplicates
    # over the union whose arbitrary partition winner could flip a
    # line's recorded owner across folds — the same discipline as
    # dedup_index.refresh_index's upsert, with the opposite victor:
    # the census semantic is FIRST owner)
    merged = base.unionByName(
        latest.join(base.select("lh"), on="lh", how="left_anti")
    )
    col.write(
        index_item,
        merged,
        index_col="lhp",
        zonemap=["lhp"],
        overwrite=True,
        sidecar_extra={META_KEY: meta},
    )
    DI.trim_delta(col, delta, delta_it, "lh")
    return {"lines_folded": n}
