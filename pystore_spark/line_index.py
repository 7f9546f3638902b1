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
    """Full census build over a stored item (by name), a LIST of item
    names (multi-source corpus sharing one census — line ownership is
    global, so the census doesn't care which item owns a line; ids
    must be globally unique), or a DataFrame. One corpus pass; after
    this, ingests probe instead of re-censusing. Covered items are
    recorded in the sidecar (``source_items``) and grow with every
    ``ingest(line_index=...)`` target, so verify/repair audit the
    whole scope."""
    from pystore_spark import dedup_index as DI

    if not overwrite and col.item_exists(index_item):
        from pystore_spark.exceptions import ItemExistsError

        raise ItemExistsError(
            f"line index {index_item!r} already exists; use "
            "overwrite=True to rebuild"
        )
    source_items: list[str] = []
    if isinstance(source, str):
        source_items = [source]
        df = DI._read_frame(col, source)
    elif isinstance(source, (list, tuple)):
        source_items = list(dict.fromkeys(source))
        if not source_items:
            raise ValueError("source item list is empty")
        df = DI._read_frame(col, source_items[0])
        for nm in source_items[1:]:
            df = df.unionByName(DI._read_frame(col, nm))
    else:
        df = source
    census = _census(df, text_col, id_col).localCheckpoint(eager=True)
    meta = {
        "text_col": text_col,
        "id_col": id_col,
        "delta_item": f"{index_item}__delta",
        "source_item": source_items[0] if source_items else None,
        "source_items": source_items,
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


def strip_corpus_lines(
    col, index_item: str, df: DataFrame
) -> tuple[DataFrame, dict]:
    """Phase 1 of incremental line dedup: remove every line the stored
    census owns, leaving batch-internal duplicates INTACT. Returns
    ``(kept_lines, report)`` — the checkpointed surviving
    per-occurrence stream ``(<id_col>, _pos, _line, _lh)`` plus
    ``{n_batch_lines, broadcast_probe}``.

    Split from :func:`finalize_batch_lines` so ``Collection.ingest``
    can run the doc-level near-dedup probe BETWEEN the phases:
    batch-internal ownership must be resolved among the docs that
    actually survive the probe — resolving it first could hand a
    shared line to a doc the probe then drops, leaving the line
    stripped from its batch siblings yet stored nowhere."""
    meta = _index_meta(col, index_item)
    id_col, text_col = meta["id_col"], meta["text_col"]
    lines = df.select(
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
    broadcast_probe = n_batch_lines <= BROADCAST_LINES_MAX
    if broadcast_probe:
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
    else:  # cheap-gate fallback: plain shuffle joins. Checkpoint the
        # hit set here too — `kept` feeds several consumers, and left
        # lazy each would re-scan the full stored census (the
        # expensive side at exactly the batch sizes taking this path)
        hits = stored.join(
            batch_lh, on="lh", how="leftsemi"
        ).localCheckpoint(eager=True)
        kept = lines.join(
            hits.withColumnRenamed("lh", "_lh"),
            on="_lh",
            how="left_anti",
        )
    # blank lines (_lh NULL) never match the anti-join key, so they
    # pass through to the rebuild untouched
    kept = kept.localCheckpoint(eager=True)
    report = {
        "n_batch_lines": n_batch_lines,
        "n_new_lines": 0,
        "broadcast_probe": broadcast_probe,
    }
    return kept, report


def corpus_stripped_frame(
    col, index_item: str, df: DataFrame, kept_lines: DataFrame
) -> DataFrame:
    """Rebuild ``df`` with its corpus-owned lines removed (batch
    duplicates intact) — the frame the doc-level probe judges, per the
    C4 posture: a doc assembled mostly from corpus-owned boilerplate
    is evaluated on its novel remainder."""
    meta = _index_meta(col, index_item)
    return X.rebuild_from_lines(
        df, kept_lines, meta["id_col"], meta["text_col"]
    ).localCheckpoint(eager=True)


def finalize_batch_lines(
    col,
    index_item: str,
    df: DataFrame,
    kept_lines: DataFrame,
    min_docs: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Phase 2: keep-one-owner batch-internal line dedup over the
    given docs' surviving lines, rebuild their text, and build the
    registration census. ``df`` / ``kept_lines`` must already be
    restricted to the docs that will actually be stored (probe
    survivors in the ingest path). Returns ``(final_df, new_census,
    n_hot)`` — frames checkpointed, ``n_hot`` the count of batch-
    shared lines this phase stripped (0 ⇒ the text is unchanged from
    phase 1); the census owner is the minimum surviving id — exactly
    the doc that retains each shared line."""
    meta = _index_meta(col, index_item)
    id_col, text_col = meta["id_col"], meta["text_col"]
    claims = kept_lines.filter(F.col("_lh").isNotNull())
    hot = (
        claims.groupBy("_lh")
        .agg(
            F.count_distinct(id_col).alias("_nd"),
            F.min(id_col).alias("_owner"),
        )
        .filter(F.col("_nd") >= min_docs)
        .localCheckpoint(eager=True)
    )
    # batch-bounded count, returned so callers can tell whether any
    # text actually changed in this phase: when 0, the final text
    # equals the phase-1 output for every doc, and e.g. ingest can
    # reuse the probe-frame features instead of re-hashing survivors
    n_hot = hot.count()
    tagged = kept_lines.join(hot, "_lh", "left")
    final_kept = tagged.filter(
        F.col("_nd").isNull() | (F.col(id_col) == F.col("_owner"))
    )
    final_df = X.rebuild_from_lines(
        df, final_kept, id_col, text_col
    ).localCheckpoint(eager=True)
    new_census = (
        claims.groupBy(F.col("_lh").alias("lh"))
        .agg(F.min(id_col).alias("owner"))
        .select(
            F.current_timestamp().alias("added_at"),
            _lhp(F.col("lh")).alias("lhp"),
            "lh",
            "owner",
        )
        .localCheckpoint(eager=True)
    )
    return final_df, new_census, n_hot


def dedup_lines_incremental(
    col,
    index_item: str,
    df: DataFrame,
    update_index: bool = True,
) -> tuple[DataFrame, dict]:
    """Keep-one-owner line dedup against the STORED corpus, O(batch):

    1. every line the census already contains is removed (the stored
       corpus owns it) — :func:`strip_corpus_lines`;
    2. batch-internal pass — lines shared within the batch keep one
       owner — :func:`finalize_batch_lines` (phase order is
       observationally identical to running the batch pass first:
       corpus removal is per-line-hash, so it never changes which
       docs claim a non-corpus line);
    3. the batch's genuinely-new lines register in the delta tier
       (``update_index=True``) so the NEXT batch loses them.

    ``update_index=False`` DEFERS registration: the report carries the
    materialized new-line census under ``"_new_census"`` for
    :func:`register_new_lines` — so a failed append can never orphan
    lines in the census (lines owned by nothing stored would be
    silently stripped from every future batch).

    Returns ``(cleaned_df, report)``; intermediate frames are
    materialized (eager localCheckpoint) because several downstream
    actions consume them."""
    kept_lines, report = strip_corpus_lines(col, index_item, df)
    out, new_census, _ = finalize_batch_lines(
        col, index_item, df, kept_lines
    )
    report["n_new_lines"] = new_census.count()
    if update_index:
        register_new_lines(col, index_item, new_census)
    else:
        report["_new_census"] = new_census
    return out, report


def register_new_lines(
    col, index_item: str, new_census: DataFrame,
    marker: tuple | None = None,
) -> None:
    """Append a batch's new-line census rows to the delta tier —
    called inside :func:`dedup_lines_incremental` for the standalone
    path, or AFTER a successful append (restricted to surviving
    owners) by ``Collection.ingest``. ``marker`` is the streaming
    exactly-once stamp (see dedup_index._marker_current): a replayed
    batch whose census already registered is skipped, one that
    crashed before registering is repaired."""
    from pystore_spark import dedup_index as DI

    from pystore_spark import utils

    meta = _index_meta(col, index_item)
    delta = meta["delta_item"]
    if DI._marker_current(col, delta, marker):
        return
    sidecar = DI._marker_sidecar(marker)
    # an all-known-lines batch yields an empty census; writing it
    # through the Spark time-partitioned path would commit a delta
    # item with ZERO parquet files, and every later read of that
    # husk item fails — skip the write, but still advance the replay
    # marker when the delta exists so a replayed empty registration
    # stays on the sinks' metadata-only fast path
    if new_census.isEmpty():
        if sidecar and col.item_exists(delta):
            key, bid = marker

            def stamp(m: dict) -> dict:
                from pystore_spark.streaming import COMMITS_KEY

                commits = dict(m.get(COMMITS_KEY) or {})
                commits[key] = max(int(commits.get(key, -1)), int(bid))
                m[COMMITS_KEY] = commits
                return m

            utils.update_metadata_cas(col._item_path(delta), stamp)
            col.clear_metadata_cache(delta)
        return
    if col.item_exists(delta):
        col.append(
            delta, new_census, duplicate_handling="keep_all",
            sidecar_extra=sidecar,
        )
    else:
        from pystore_spark.exceptions import (
            ConcurrentCommitError,
            ItemExistsError,
        )

        try:
            col.write(
                delta, new_census, index_col="added_at",
                sidecar_extra=sidecar,
            )
        except (ConcurrentCommitError, ItemExistsError):
            # cross-item ingests sharing one census race to CREATE
            # the delta tier — the loser appends instead of failing
            # a committed batch's registration (same fix as
            # dedup_index._index_delta_append)
            col.clear_metadata_cache(delta)
            col.append(
                delta, new_census, duplicate_handling="keep_all",
                sidecar_extra=sidecar,
            )


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


def _corpus_frame(col, meta: dict, item, cols: list[str]):
    """(items, union of the needed COLUMNS across the corpus items) —
    ``item`` is a name, a list, or None (= the sidecar's recorded
    ``source_items``). Column-pruned per item before the union, so
    heterogeneous extra columns across sources don't break it."""
    from pystore_spark import dedup_index as DI

    items = DI._resolve_corpus_items(col, meta, item)
    df = col.item(items[0]).data.select(*cols)
    for nm in items[1:]:
        df = df.unionByName(col.item(nm).data.select(*cols))
    return items, df


def verify_index(
    col, item, index_item: str, deep: bool = False,
    sample: int = 20,
) -> dict:
    """Consistency audit between a corpus item and its line census —
    the orphan check for the invariant every census fix in this module
    defends: EVERY census line is owned by a document that (a) still
    exists and (b) actually contains the line. An orphan is silent
    data damage: the line is stripped from every future batch while
    no stored document carries it.

    * ``orphan_owner`` (cheap, id-space join): census rows whose owner
      id is absent from the corpus.
    * ``orphan_line`` (``deep=True`` — one explode over the corpus
      text, O(corpus)): census rows whose owner exists but whose
      stored text no longer contains the line (e.g. the item was
      rewritten out-of-band).

    ``item`` is a corpus item name, a LIST of names, or None — None
    audits every item the sidecar records (build sources plus every
    ``ingest(line_index=...)`` target): a census owner is an orphan
    only when NO scoped item holds it.

    Read-only; repair is ``build_line_index(overwrite=True)``."""
    meta = _index_meta(col, index_item)
    id_col, text_col = meta["id_col"], meta["text_col"]
    # checkpoint: census feeds the orphan join, its count, and (deep)
    # the ghost join; corpus ids feed one or two joins — left lazy,
    # every action replays the full scans
    census = _union_tiers_lines(col, index_item, meta).localCheckpoint(
        eager=True
    )
    items, corpus = _corpus_frame(
        col, meta, item, [id_col] if not deep else [id_col, text_col]
    )
    corpus_ids = (
        corpus.select(F.col(id_col).alias("owner"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    orphans = census.join(corpus_ids, "owner", "left_anti")
    orows = orphans.limit(sample + 1).collect()
    n_orphan = orphans.count()
    report = {
        "items": items,
        "n_census_lines": census.count(),
        "n_orphan_owner": n_orphan,
        "orphan_owner_sample": sorted(
            (r["owner"], r["lh"]) for r in orows[:sample]
        ),
    }
    if deep:
        owned = corpus.select(
            F.col(id_col).alias("owner"),
            F.explode(X.split_lines(text_col)).alias("_line"),
        ).filter(F.trim("_line") != "").select(
            "owner", F.md5(F.trim("_line")).alias("lh")
        ).distinct()
        ghost = census.join(owned, ["owner", "lh"], "left_anti")
        grows = ghost.limit(sample + 1).collect()
        report["n_orphan_line"] = ghost.count()
        report["orphan_line_sample"] = sorted(
            (r["owner"], r["lh"]) for r in grows[:sample]
        )
    report["ok"] = not (
        report["n_orphan_owner"] or report.get("n_orphan_line", 0)
    )
    return report


def _union_tiers_lines(col, index_item: str, meta: dict):
    """Census rows ``(lh, owner)`` across base + delta tiers."""
    from pystore_spark import dedup_index as DI

    return DI._union_tiers(
        col, index_item, meta["delta_item"], ["lh", "owner"]
    )


def repair_index(col, item, index_item: str) -> dict:
    """Drop census rows owned by documents no longer in the corpus —
    the id-space repair of :func:`verify_index`'s ``orphan_owner``
    drift (each such row silently strips a line every future batch
    carries, while no stored document owns it). O(census + corpus
    ids); never reads text. ``item`` accepts a name, a list, or None
    (= the sidecar's recorded scope) like :func:`verify_index`.

    Deep drift — ghost lines after an out-of-band rewrite, or corpus
    lines missing from the census — costs a full corpus text pass to
    even enumerate, which is the same pass a rebuild does: repair
    those with ``build_line_index(overwrite=True)``. Serialize with
    concurrent ingests (the tier rewrites are whole-item replaces).
    Returns ``{n_removed, tiers_rewritten}``."""
    from pystore_spark import dedup_index as DI

    meta = _index_meta(col, index_item)
    id_col = meta["id_col"]
    _, corpus = _corpus_frame(col, meta, item, [id_col])
    corpus_owners = (
        corpus.select(F.col(id_col).alias("owner"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # orphan census rows = rows whose owner is NOT a corpus id; the
    # shared rewrite drops rows JOINING the bad frame, so hand it the
    # orphan owners (per-tier) via an anti-derived frame
    n_before = 0
    for name in (index_item, meta["delta_item"]):
        if col.item_exists(name):
            n_before += DI._read_frame(col, name).count()
    bad_owners = (
        _union_census_owners(col, index_item, meta)
        .join(corpus_owners, "owner", "left_anti")
        .distinct()
        .localCheckpoint(eager=True)
    )
    rewritten = DI.rewrite_tiers_dropping(
        col,
        (
            (index_item, "lhp", ["lhp"], {META_KEY: meta}),
            (meta["delta_item"], "added_at", None, None),
        ),
        bad_owners, "owner",
        base_items={index_item},
        rebuild_hint="build_line_index(overwrite=True)",
    )
    n_after = 0
    for name in (index_item, meta["delta_item"]):
        if col.item_exists(name):
            n_after += DI._read_frame(col, name).count()
    return {
        "n_removed": int(n_before - n_after),
        "tiers_rewritten": rewritten,
    }


def _union_census_owners(col, index_item: str, meta: dict):
    """Distinct owner ids across base + delta census tiers."""
    from pystore_spark import dedup_index as DI

    return DI._union_tiers(
        col, index_item, meta["delta_item"], ["owner"]
    ).distinct()
