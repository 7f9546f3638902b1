"""Persistent incremental gram-census index — exact substring dedup
ACROSS TIME (the LSM sibling of dedup_index.py / line_index.py for
the Lee-et-al operator).

`functions/text.dedup_substrings` cuts duplicated ≥k-token passages in
one batch pass — but a daily ingest into a 100 TB curated item would
re-explode and re-shuffle O(corpus) grams every day to keep the rule.
This module persists the gram census the same way line_index.py
persists the line census:

* **base tier** — one row per distinct ``k``-token gram of the STORED
  corpus text: ``(ghp BIGINT, gh CHAR(32), owner)``; ``gh`` is the
  md5 of the space-joined gram (exact membership at any census size),
  ``ghp`` its first-14-hex bigint prefix — the sort/zonemap key for
  the fold's ordered rewrite (probes span the uniform hash space and
  SCAN the census in parallel; they never shuffle it).
* **delta tier** — time-indexed on ``added_at``; each ingest appends
  its genuinely-new grams there in O(batch).

Probe shape (:func:`dedup_substrings_incremental`): the batch's
distinct gram hashes BROADCAST against one streaming scan of
base ∪ delta (semi join — the census never shuffles); the hit set is
batch-bounded and broadcasts back into the batch's positional gram
stream; stored-census hits UNION with the batch-internal min-owner
hits and cut ONCE through the shared span machinery
(functions/text._cut_spans) on the ORIGINAL text. Because the union
is cut in one pass, when batch ids follow the stored ids (the normal
append-only ingest) each batch doc's cleaned text is IDENTICAL to
running the batch operator ``dedup_substrings`` over corpus ∪ batch —
the equivalence class tests/test_substring_index.py pins.

Semantics note: a gram the stored corpus owns is cut from every batch
occurrence regardless of id ordering (temporal-first ownership — the
same posture as the line census: storage came first). Registration
censuses the batch's **cleaned** stored text, so every census gram is
carried by at least one stored document — a gram owned by nothing
stored would silently strip novel content from every future batch
(:func:`verify_index` audits exactly that invariant; repair is
owner-space or a rebuild).

No reference counterpart (pystore has no text surface); extends
SURVEY §2.13's incremental family.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pystore_spark.exceptions import StorageError
from pystore_spark.functions import text as X

META_KEY = "_substring_index"

#: above this many distinct batch grams the probe abandons the forced
#: broadcast (32-char hash per gram — 2M ≈ 64 MB) for a shuffle join
BROADCAST_GRAMS_MAX = 2_000_000


def _ghp(gh_col) -> Any:
    """First-14-hex bigint prefix of an md5 column — the base tier's
    sort/zonemap key (same recipe as line_index.lhp)."""
    return F.conv(F.substring(gh_col, 1, 14), 16, 10).cast("bigint")


def _gram_stream(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """Positional gram hashes ``(<id_col>, s, gh)`` — derived from the
    batch operator's own tokenizer and gram builder
    (functions/text.tokens/_pos_grams) so hashing semantics can never
    diverge between the persistent index and the batch path it claims
    equivalence with."""
    t = X.tokens(text_col)
    return df.select(
        F.col(id_col), F.explode(X._pos_grams(t, k)).alias("p")
    ).select(
        id_col,
        F.col("p.s").alias("s"),
        F.md5(F.col("p.g")).alias("gh"),
    )


def _census(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(ghp, gh, owner) — distinct grams with their first owner."""
    return (
        _gram_stream(df, text_col, id_col, k)
        .groupBy("gh")
        .agg(F.min(id_col).alias("owner"))
        .select(_ghp(F.col("gh")).alias("ghp"), "gh", "owner")
    )


def build_substring_index(
    col,
    index_item: str,
    source,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    overwrite: bool = False,
) -> dict:
    """Full gram census over a stored item (by name), a LIST of item
    names (one census across a multi-item corpus; ids must be globally
    unique), or a DataFrame. One corpus pass (the same explode +
    map-side-combinable min the batch operator pays ONCE); after this,
    ingests probe instead of re-censusing. ``k`` is pinned in the
    sidecar — probes and registration reuse it."""
    from pystore_spark import dedup_index as DI

    if not overwrite and col.item_exists(index_item):
        from pystore_spark.exceptions import ItemExistsError

        raise ItemExistsError(
            f"substring index {index_item!r} already exists; use "
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
    census = _census(df, text_col, id_col, int(k)).localCheckpoint(
        eager=True
    )
    meta = {
        "text_col": text_col,
        "id_col": id_col,
        "k": int(k),
        "delta_item": f"{index_item}__delta",
        "source_item": source_items[0] if source_items else None,
        "source_items": source_items,
    }
    col.write(
        index_item,
        census,
        index_col="ghp",
        zonemap=["ghp"],
        overwrite=overwrite,
        sidecar_extra={META_KEY: meta},
    )
    if col.item_exists(meta["delta_item"]):
        col.delete_item(meta["delta_item"])
    return {"index_item": index_item, "n_grams": census.count()}


def _index_meta(col, index_item: str) -> dict:
    meta = (col.get_item_metadata(index_item) or {}).get(META_KEY)
    if not meta:
        raise StorageError(
            f"item {index_item!r} is not a substring index "
            "(build_substring_index creates one)"
        )
    return meta


def _stored_grams(col, index_item: str, meta: dict) -> DataFrame:
    from pystore_spark import dedup_index as DI

    return DI._union_tiers(
        col, index_item, meta["delta_item"], ["gh"]
    )


def dedup_substrings_incremental(
    col,
    index_item: str,
    df: DataFrame,
    update_index: bool = True,
) -> tuple[DataFrame, dict]:
    """Exact substring dedup against the STORED corpus, O(batch):

    1. every ``k``-token window whose gram the census owns is a hit
       (the stored corpus keeps its copy);
    2. batch-internal pass — windows whose gram a lower-id batch doc
       carries are hits too (computed over the ORIGINAL batch text,
       so the union cuts exactly like the batch operator would);
    3. both hit sets merge into maximal spans and cut ONCE
       (functions/text._cut_spans — overlapping stored/batch hits
       collapse into one removed span);
    4. the batch's genuinely-new grams — censused from the CLEANED
       text, so the census only ever owns stored bytes — register in
       the delta tier (``update_index=True``) so the NEXT batch loses
       them.

    ``update_index=False`` DEFERS registration: the report carries
    the materialized new-gram census under ``"_new_census"`` for
    :func:`register_new_grams` — so a failed append can never orphan
    grams in the census.

    Returns ``(cleaned_df, report)`` — ``cleaned_df`` has the INPUT
    schema with ``text_col`` rewritten in place (checkpointed; it
    feeds the registration census and the caller's append).

    PRECONDITION: ids unique and totally ordered (the batch
    operator's contract — see functions/text._cut_spans)."""
    meta = _index_meta(col, index_item)
    id_col, text_col = meta["id_col"], meta["text_col"]
    k = int(meta["k"])
    grams = _gram_stream(df, text_col, id_col, k)
    batch_gh = (
        grams.select("gh").distinct().localCheckpoint(eager=True)
    )
    n_batch_grams = batch_gh.count()
    stored = _stored_grams(col, index_item, meta)
    broadcast_probe = n_batch_grams <= BROADCAST_GRAMS_MAX
    if broadcast_probe:
        # census scans in parallel and never shuffles; the batch-
        # bounded hit set broadcasts back into the gram stream
        hits_gh = stored.join(
            F.broadcast(batch_gh), on="gh", how="leftsemi"
        ).localCheckpoint(eager=True)
        stored_hits = grams.join(
            F.broadcast(hits_gh), on="gh", how="leftsemi"
        ).select(id_col, "s")
    else:  # cheap-gate fallback: plain shuffle joins
        hits_gh = stored.join(
            batch_gh, on="gh", how="leftsemi"
        ).localCheckpoint(eager=True)
        stored_hits = grams.join(
            hits_gh, on="gh", how="leftsemi"
        ).select(id_col, "s")
    own = grams.groupBy("gh").agg(F.min(id_col).alias("_own"))
    batch_hits = (
        grams.join(own, "gh")
        .filter(F.col(id_col) > F.col("_own"))
        .select(id_col, "s")
    )
    hits = stored_hits.unionByName(batch_hits)
    t = X.tokens(text_col)
    out = (
        X._cut_spans(df, hits, id_col, t, k, text_col)
        .withColumn(text_col, F.col("cleaned_text"))
        .drop("cleaned_text", "n_spans_removed", "n_tokens_removed")
        .localCheckpoint(eager=True)
    )
    new_census = (
        _census(out, text_col, id_col, k)
        .join(stored, on="gh", how="left_anti")
        .select(
            F.current_timestamp().alias("added_at"),
            "ghp",
            "gh",
            "owner",
        )
        .localCheckpoint(eager=True)
    )
    report = {
        "n_batch_grams": n_batch_grams,
        "n_new_grams": new_census.count(),
        "broadcast_probe": broadcast_probe,
    }
    if update_index:
        register_new_grams(col, index_item, new_census)
    else:
        report["_new_census"] = new_census
    return out, report


def survivors_census(col, index_item: str, meta: dict, surv_df) -> DataFrame:
    """Delta-tier census rows for a frame of SURVIVING batch docs
    (cleaned stored text): their grams minus everything the tiers
    already own. Checkpointed — callers count it, emptiness-check it
    and write it (the uncached plan used to re-execute the explode +
    anti-join up to three times)."""
    return (
        _census(
            surv_df, meta["text_col"], meta["id_col"], int(meta["k"])
        )
        .join(
            _stored_grams(col, index_item, meta),
            on="gh",
            how="left_anti",
        )
        .select(
            F.current_timestamp().alias("added_at"),
            "ghp",
            "gh",
            "owner",
        )
        .localCheckpoint(eager=True)
    )


def register_new_grams(
    col, index_item: str, new_census: DataFrame,
    marker: tuple | None = None,
) -> None:
    """Append a batch's new-gram census rows to the delta tier —
    inside :func:`dedup_substrings_incremental` for the standalone
    path, or AFTER a successful append (restricted to surviving docs'
    stored text) by ``Collection.ingest``. ``marker`` is the streaming
    exactly-once stamp (dedup_index._marker_current)."""
    from pystore_spark import dedup_index as DI
    from pystore_spark import utils

    meta = _index_meta(col, index_item)
    delta = meta["delta_item"]
    if DI._marker_current(col, delta, marker):
        return
    sidecar = DI._marker_sidecar(marker)
    # an all-known-grams batch yields an empty census — skip the
    # write (a zero-file husk item breaks later reads), but still
    # advance the replay marker when the delta exists (line_index's
    # empty-registration discipline)
    if new_census.isEmpty():
        if sidecar and col.item_exists(delta):
            key, bid = marker

            def stamp(m: dict) -> dict:
                from pystore_spark.streaming import COMMITS_KEY

                commits = dict(m.get(COMMITS_KEY) or {})
                commits[key] = max(
                    int(commits.get(key, -1)), int(bid)
                )
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
            # the delta tier — the loser appends
            col.clear_metadata_cache(delta)
            col.append(
                delta, new_census, duplicate_handling="keep_all",
                sidecar_extra=sidecar,
            )


def refresh_substring_index(col, index_item: str) -> dict:
    """Fold the delta tier into the sorted, zonemapped base (LSM
    merge, wired into ``Collection.maintain``). Same generation-pinned
    trim as dedup_index.refresh_index — rows landing mid-fold survive
    to the next fold; BASE WINS on gh conflict (first owner is the
    census semantic, exactly line_index's fold discipline)."""
    from pystore_spark import dedup_index as DI

    meta = _index_meta(col, index_item)
    delta = meta["delta_item"]
    if not col.item_exists(delta):
        return {"grams_folded": 0}
    delta_it = col.item(delta)
    n = DI._item_frame(col, delta_it).count()
    if not n:
        return {"grams_folded": 0}
    base = DI._read_frame(col, index_item).select(
        "ghp", "gh", "owner"
    )
    latest = (
        DI._item_frame(col, delta_it)
        .select("ghp", "gh", "owner")
        .dropDuplicates(["gh"])
    )
    merged = base.unionByName(
        latest.join(base.select("gh"), on="gh", how="left_anti")
    )
    col.write(
        index_item,
        merged,
        index_col="ghp",
        zonemap=["ghp"],
        overwrite=True,
        sidecar_extra={META_KEY: meta},
    )
    DI.trim_delta(col, delta, delta_it, "gh")
    return {"grams_folded": n}


def verify_index(
    col, item, index_item: str, deep: bool = False,
    sample: int = 20,
) -> dict:
    """Consistency audit between a corpus item and its gram census —
    the orphan check for the census ⊆ stored-text invariant: EVERY
    census gram is owned by a document that (a) still exists and
    (b, ``deep=True``) still carries the gram. An orphan silently
    strips novel content from every future batch.

    ``item`` is a name, a LIST, or None (= the sidecar's recorded
    scope). Read-only; owner-space repair is :func:`repair_index`,
    deep drift repairs with ``build_substring_index(overwrite=True)``.
    """
    from pystore_spark import dedup_index as DI

    meta = _index_meta(col, index_item)
    id_col, text_col = meta["id_col"], meta["text_col"]
    k = int(meta["k"])
    census = DI._union_tiers(
        col, index_item, meta["delta_item"], ["gh", "owner"]
    ).localCheckpoint(eager=True)
    from pystore_spark.line_index import _corpus_frame

    items, corpus = _corpus_frame(
        col, meta, item,
        [id_col] if not deep else [id_col, text_col],
    )
    corpus_ids = (
        corpus.select(F.col(id_col).alias("owner"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    orphans = census.join(corpus_ids, "owner", "left_anti")
    orows = orphans.limit(sample + 1).collect()
    report = {
        "items": items,
        "n_census_grams": census.count(),
        "n_orphan_owner": orphans.count(),
        "orphan_owner_sample": sorted(
            (r["owner"], r["gh"]) for r in orows[:sample]
        ),
    }
    if deep:
        owned = (
            _gram_stream(
                corpus.withColumnRenamed(id_col, "owner"),
                text_col, "owner", k,
            )
            .select("owner", "gh")
            .distinct()
        )
        ghost = census.join(owned, ["owner", "gh"], "left_anti")
        grows = ghost.limit(sample + 1).collect()
        report["n_orphan_gram"] = ghost.count()
        report["orphan_gram_sample"] = sorted(
            (r["owner"], r["gh"]) for r in grows[:sample]
        )
    report["ok"] = not (
        report["n_orphan_owner"] or report.get("n_orphan_gram", 0)
    )
    return report


def repair_index(col, item, index_item: str) -> dict:
    """Drop census rows owned by documents no longer in the corpus
    (the owner-space drift of :func:`verify_index`). O(census +
    corpus ids); never reads text. Deep drift (ghost grams after an
    out-of-band rewrite) costs the same pass a rebuild does — repair
    those with ``build_substring_index(overwrite=True)``."""
    from pystore_spark import dedup_index as DI

    meta = _index_meta(col, index_item)
    id_col = meta["id_col"]
    from pystore_spark.line_index import _corpus_frame

    _, corpus = _corpus_frame(col, meta, item, [id_col])
    corpus_owners = (
        corpus.select(F.col(id_col).alias("owner"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_before = 0
    for name in (index_item, meta["delta_item"]):
        if col.item_exists(name):
            n_before += DI._read_frame(col, name).count()
    bad_owners = (
        DI._union_tiers(
            col, index_item, meta["delta_item"], ["owner"]
        )
        .distinct()
        .join(corpus_owners, "owner", "left_anti")
        .distinct()
        .localCheckpoint(eager=True)
    )
    rewritten = DI.rewrite_tiers_dropping(
        col,
        (
            (index_item, "ghp", ["ghp"], {META_KEY: meta}),
            (meta["delta_item"], "added_at", None, None),
        ),
        bad_owners, "owner",
        base_items={index_item},
        rebuild_hint="build_substring_index(overwrite=True)",
    )
    n_after = 0
    for name in (index_item, meta["delta_item"]):
        if col.item_exists(name):
            n_after += DI._read_frame(col, name).count()
    return {
        "n_removed": int(n_before - n_after),
        "tiers_rewritten": rewritten,
    }
