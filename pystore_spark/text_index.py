"""Persistent inverted text index — BM25 retrieval in O(query), not
O(corpus).

``functions/text.bm25_topk`` scores a query bag in one corpus pass:
fine for a batch job, wrong for a retrieval workload — every query
re-explodes and re-shuffles O(corpus) tokens. This module persists the
postings the way the MinHash/line/gram censuses persist their state
(the LSM base+delta pattern of dedup_index.py / line_index.py /
substring_index.py):

* **base tier** — one row per distinct ``(term, doc)`` pair of the
  stored corpus: ``(tp BIGINT, term, doc_id, tf BIGINT, dl BIGINT)``,
  sorted and zonemapped on ``tp`` — the term's 14-hex md5-prefix key
  (parquet string footer stats are truncated/unreliable, so the
  manifest zonemap is numeric-only; same recipe as lhp/ghp). A
  query's ``("tp", "in", [...])`` filter prunes base FILES by the
  manifest min/max (an exact term filter behind it guards prefix
  collisions), so a search reads ONLY the query terms' postings —
  cost scales with the postings of the query bag, never the corpus.
  ``dl`` (document token length) is denormalized onto every posting
  so scoring needs no second lookup.
* **corpus statistics** — ``n_docs`` / ``total_dl`` live in the base
  item's sidecar as EXACT integers, bumped by each registration via
  the manifest-CAS metadata update (a concurrent bump can never lose
  an increment). ``avgdl = total_dl / n_docs`` is one exact integer
  division at query time — byte-identical to what the batch operator
  computes from a corpus pass.
* **delta tier** — time-indexed on ``added_at``; each ingest appends
  its new docs' postings in O(batch). ``refresh_text_index`` (wired
  into ``Collection.maintain``) folds delta → base with the same
  generation-pinned trim as the sibling indexes.

Search shape (``search_bm25``): term-pruned scan of base ∪ delta →
per-term document frequencies (≤|query| rows, broadcast) → the SHARED
``functions/text.bm25_rank`` scoring core (identical float-op order to
the batch operator by construction) → TakeOrdered top-k. A stopword
query term reads a corpus-sized postings slice, but scoring aggregates
by doc — distributed, never one reducer.

Exactly-once registration carries TWO marker stamps: the delta
append's sidecar marker (dedup_index._marker_current) and a stats
marker inside the base sidecar meta — a crash between the postings
append and the stats bump is repaired on replay by redoing only the
missing half.

No reference counterpart (pystore has no retrieval surface); this
extends the persistent-index family with the classic sparse-retrieval
kernel (Robertson/Sparck-Jones BM25, Lucene idf).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pystore_spark.exceptions import StorageError
from pystore_spark.functions import text as X

META_KEY = "_text_index"


def _tp(term_col) -> Any:
    """First-14-hex bigint prefix of the term's md5 — the base tier's
    sort/zonemap key. Parquet footer stats for STRING columns are
    truncated/unreliable, so the manifest zonemap records numeric
    columns only (manifest.gather_file_stats); the hash-prefix key is
    the same recipe the line/gram censuses use (lhp/ghp). Prefix
    collisions are handled by an exact term filter after the scan."""
    return F.conv(F.substring(F.md5(term_col), 1, 14), 16, 10).cast(
        "bigint"
    )


def term_prefix(term: str) -> int:
    """Driver-side twin of :func:`_tp` (md5 is md5 — the Spark and
    hashlib digests are identical), used to build the pruning filter
    for a query bag."""
    import hashlib

    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:14], 16)


def _postings(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(tp, term, doc_id, tf, dl) — one row per distinct (term, doc)
    of the lowercased whitespace token stream (the bm25_topk
    tokenization, so index and batch operator can never diverge).
    One explode + one map-side-combinable (term, doc) groupBy; ``dl``
    is a per-row expression carried through the explode, no join."""
    toks = X.tokens(F.lower(F.col(text_col)))
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.size(toks).alias("dl"),
            F.explode(toks).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
        .select(
            _tp(F.col("term")).alias("tp"),
            "term",
            "doc_id",
            "tf",
            "dl",
        )
    )


def _doc_stats(df: DataFrame, text_col: str) -> tuple[int, int]:
    """(n_docs, total_dl) of a frame — exact integers, one
    aggregation. Zero-token docs count toward ``n_docs`` (they are
    corpus members with dl 0) even though they carry no postings."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(X.tokens(F.lower(F.col(text_col))))).alias("t"),
    ).collect()[0]
    return int(row["n"] or 0), int(row["t"] or 0)


def build_text_index(
    col,
    index_item: str,
    source,
    text_col: str = "text",
    id_col: str = "doc_id",
    overwrite: bool = False,
    npartitions: int | None = None,
) -> dict:
    """Full postings build over a stored item (by name), a LIST of
    item names (one index across a multi-item corpus; ids must be
    globally unique), or a DataFrame. One corpus pass (the explode +
    (term, doc) groupBy the batch operator pays PER QUERY); after
    this, searches read only the query terms' postings."""
    from pystore_spark import dedup_index as DI

    if not overwrite and col.item_exists(index_item):
        from pystore_spark.exceptions import ItemExistsError

        raise ItemExistsError(
            f"text index {index_item!r} already exists; use "
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
    posts = _postings(df, text_col, id_col).localCheckpoint(eager=True)
    n_docs, total_dl = _doc_stats(df, text_col)
    meta = {
        "text_col": text_col,
        "id_col": id_col,
        "delta_item": f"{index_item}__delta",
        "source_item": source_items[0] if source_items else None,
        "source_items": source_items,
        "n_docs": n_docs,
        "total_dl": total_dl,
    }
    col.write(
        index_item,
        posts,
        index_col="tp",
        zonemap=["tp"],
        overwrite=overwrite,
        sidecar_extra={META_KEY: meta},
        **({"npartitions": npartitions} if npartitions else {}),
    )
    if col.item_exists(meta["delta_item"]):
        col.delete_item(meta["delta_item"])
    return {
        "index_item": index_item,
        "n_postings": posts.count(),
        "n_docs": n_docs,
    }


def _index_meta(col, index_item: str) -> dict:
    meta = (col.get_item_metadata(index_item) or {}).get(META_KEY)
    if not meta:
        raise StorageError(
            f"item {index_item!r} is not a text index "
            "(build_text_index creates one)"
        )
    return meta


def search_bm25(
    col,
    index_item: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """BM25 top-k against the PERSISTENT index: identical results to
    ``functions/text.bm25_topk`` over the indexed corpus (the scoring
    core is shared — bm25_rank), at O(query-term postings) cost — the
    ``("term", "in", ...)`` filter prunes base files via the term
    zonemap and reaches the delta's parquet row groups."""
    if not query_terms:
        raise ValueError("query_terms is empty")
    from pystore_spark import dedup_index as DI

    meta = _index_meta(col, index_item)
    n_docs = int(meta.get("n_docs") or 0)
    if n_docs == 0:
        # empty top-k with the INDEXED id type (an index built over
        # an empty corpus still round-trips the postings schema)
        id_t = (
            col.item(index_item)
            .data.schema["doc_id"]
            .dataType.simpleString()
        )
        return col.spark.createDataFrame(
            [], f"doc_id {id_t}, bm25 double"
        )
    avgdl = float(meta["total_dl"]) / float(n_docs)
    terms = sorted(set(query_terms))
    flt = [("tp", "in", [term_prefix(t) for t in terms])]
    hits = (
        DI._union_tiers(
            col,
            index_item,
            meta["delta_item"],
            ["term", "doc_id", "tf", "dl"],
            filters=flt,
        )
        .filter(F.col("term").isin(terms))
        # a fold crash (or a read landing between the fold's base
        # overwrite and its delta trim) can expose a posting in BOTH
        # tiers; duplicate (term, doc) rows are byte-identical, so
        # one query-postings-sized dedup keeps scoring exact under
        # that window instead of double-counting tf and df
        .dropDuplicates(["term", "doc_id"])
    )
    return X.bm25_rank(
        hits, n_docs, avgdl, id_col="doc_id", k1=k1, b=b, top_k=top_k
    )


def search_bm25_many(
    col,
    index_item: str,
    queries: DataFrame,
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """BM25 top-k for MANY query bags in one pass — the batch face of
    :func:`search_bm25` (retrieval-based decontamination or quality
    mining runs thousands of eval queries, not one). ``queries`` is
    ``(query_id, array<string> terms)``; returns ``(query_id, doc_id,
    bm25, rank)`` with ``rank ≤ top_k`` per query — each query's rows
    EXACTLY equal to its single-query search (BM25 contributions are
    query-independent, so one contribution pass over the union
    vocabulary's postings serves every bag; the per-(query, doc)
    fold then sums each bag's own terms).

    Scale shape: the postings read is pruned to the UNION of the
    query vocabularies (tp zonemap); contributions are computed once;
    the (query_id → term) map is broadcast (query-set-sized); one
    (query, doc) shuffle of contribution rows; per-query top-k is a
    rank window (WindowGroupLimit keeps map-side state at k rows).
    PRECONDITION: query_id unique per bag."""
    from pyspark.sql import Window

    from pystore_spark import dedup_index as DI

    meta = _index_meta(col, index_item)
    n_docs = int(meta.get("n_docs") or 0)
    qterms = queries.select(
        F.col(query_id_col), F.explode(F.col(terms_col)).alias("term")
    ).distinct()
    terms = sorted(
        r["term"] for r in qterms.select("term").distinct().collect()
    )
    if not terms:
        raise ValueError("queries contribute no terms")
    if n_docs == 0:
        id_t = (
            col.item(index_item)
            .data.schema["doc_id"]
            .dataType.simpleString()
        )
        q_t = queries.schema[query_id_col].dataType.simpleString()
        return col.spark.createDataFrame(
            [],
            f"{query_id_col} {q_t}, doc_id {id_t}, bm25 double, "
            "rank int",
        )
    avgdl = float(meta["total_dl"]) / float(n_docs)
    flt = [("tp", "in", [term_prefix(t) for t in terms])]
    hits = (
        DI._union_tiers(
            col,
            index_item,
            meta["delta_item"],
            ["term", "doc_id", "tf", "dl"],
            filters=flt,
        )
        .filter(F.col("term").isin(terms))
        .dropDuplicates(["term", "doc_id"])
    )
    contribs = X.bm25_contributions(
        hits, n_docs, avgdl, id_col="doc_id", k1=k1, b=b
    )
    scored = (
        contribs.join(F.broadcast(qterms), "term")
        .groupBy(query_id_col, "doc_id")
        .agg(X._bm25_fold())
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("bm25").desc(), F.col("doc_id")
    )
    return scored.withColumn(
        "rank", F.row_number().over(w)
    ).filter(F.col("rank") <= top_k)


def register_docs(
    col,
    index_item: str,
    df: DataFrame,
    marker: tuple | None = None,
) -> dict:
    """Index a batch of NEW docs in O(batch): postings append to the
    delta tier, corpus stats bump in the base sidecar via the
    manifest CAS. Exactly-once in both halves independently
    (``marker``): the delta append carries the usual sidecar marker;
    the stats bump records its own marker INSIDE the updated metadata
    (one atomic CAS covers both), so a crash between the two halves
    is repaired on replay without double-counting.

    PRECONDITION: the batch's ids are not already indexed (the ingest
    path guarantees it — only probe survivors of a NEW batch arrive
    here). Re-sending an indexed id without a marker double-counts."""
    from pystore_spark import dedup_index as DI
    from pystore_spark import utils

    meta = _index_meta(col, index_item)
    delta = meta["delta_item"]
    text_col, id_col = meta["text_col"], meta["id_col"]
    # marker checks FIRST — a fully-landed replay pays no Spark job,
    # a delta-landed one pays only the cheap stats aggregation
    # (_stats_commits only grows, so a cached "current" is safe; a
    # stale "behind" just falls into the idempotent CAS below)
    delta_current = DI._marker_current(col, delta, marker)
    stats_current = marker is not None and int(
        (meta.get("_stats_commits") or {}).get(marker[0], -1)
    ) >= int(marker[1])
    if delta_current and stats_current:
        return {"n_docs_indexed": 0, "n_postings": 0,
                "replayed": True}
    bn, bdl = _doc_stats(df, text_col)
    n_postings = 0
    if not delta_current:
        posts = (
            _postings(df, text_col, id_col)
            .select(
                F.current_timestamp().alias("added_at"),
                "tp",
                "term",
                "doc_id",
                "tf",
                "dl",
            )
            .localCheckpoint(eager=True)
        )
        n_postings = posts.count()
        sidecar = DI._marker_sidecar(marker)
        if not n_postings:
            # token-free batch: no postings, but advance the replay
            # marker when the delta exists (the line_index empty-
            # registration discipline — a husk write would poison
            # later reads)
            if sidecar and col.item_exists(delta):
                key, bid = marker

                def stamp_delta(m: dict) -> dict:
                    from pystore_spark.streaming import COMMITS_KEY

                    commits = dict(m.get(COMMITS_KEY) or {})
                    commits[key] = max(
                        int(commits.get(key, -1)), int(bid)
                    )
                    m[COMMITS_KEY] = commits
                    return m

                utils.update_metadata_cas(
                    col._item_path(delta), stamp_delta
                )
                col.clear_metadata_cache(delta)
        elif col.item_exists(delta):
            col.append(
                delta, posts, duplicate_handling="keep_all",
                sidecar_extra=sidecar,
            )
        else:
            from pystore_spark.exceptions import (
                ConcurrentCommitError,
                ItemExistsError,
            )

            try:
                col.write(
                    delta, posts, index_col="added_at",
                    sidecar_extra=sidecar,
                )
            except (ConcurrentCommitError, ItemExistsError):
                # cross-item ingests sharing one index race to
                # CREATE the delta tier — the loser appends
                col.clear_metadata_cache(delta)
                col.append(
                    delta, posts, duplicate_handling="keep_all",
                    sidecar_extra=sidecar,
                )

    # stats half: CAS on the base sidecar, marker recorded inside the
    # same atomic update
    def bump(m: dict) -> dict:
        mk = dict(m.get(META_KEY) or {})
        commits = dict(mk.get("_stats_commits") or {})
        if marker is not None:
            key, bid = marker
            if commits.get(key, -1) >= int(bid):
                return m  # replay: already counted
            commits[key] = int(bid)
            mk["_stats_commits"] = commits
        mk["n_docs"] = int(mk.get("n_docs") or 0) + bn
        mk["total_dl"] = int(mk.get("total_dl") or 0) + bdl
        m[META_KEY] = mk
        return m

    utils.update_metadata_cas(col._item_path(index_item), bump)
    col.clear_metadata_cache(index_item)
    return {"n_docs_indexed": bn, "n_postings": n_postings}


def refresh_text_index(col, index_item: str) -> dict:
    """Fold the delta tier into the sorted, term-zonemapped base (LSM
    merge, wired into ``Collection.maintain``). Same concurrency
    discipline as the sibling indexes: the fold pins the delta
    generations it reads and the trim removes exactly those (postings
    appended mid-fold survive to the next fold), and the merge is
    BASE WINS on (term, doc) — a crash between the base overwrite and
    the delta trim leaves folded rows in both tiers, and a plain
    union would re-fold them into permanent duplicates on the next
    run (search dedups its hit rows, so even the crash window itself
    never double-counts)."""
    from pystore_spark import dedup_index as DI

    meta = _index_meta(col, index_item)
    delta = meta["delta_item"]
    if not col.item_exists(delta):
        return {"postings_folded": 0}
    delta_it = col.item(delta)
    n = DI._item_frame(col, delta_it).count()
    if not n:
        return {"postings_folded": 0}
    base = DI._read_frame(col, index_item).select(
        "tp", "term", "doc_id", "tf", "dl"
    )
    latest = DI._item_frame(col, delta_it).select(
        "tp", "term", "doc_id", "tf", "dl"
    ).dropDuplicates(["term", "doc_id"])
    merged = base.unionByName(
        latest.join(
            base.select("term", "doc_id"),
            on=["term", "doc_id"],
            how="left_anti",
        ).select("tp", "term", "doc_id", "tf", "dl")
    )
    # stats live in the sidecar — re-read meta CACHE-FRESH right
    # before the write so a registration's counter bump landing
    # during the fold's data jobs is carried (the 300s metadata TTL
    # would otherwise serve a pre-fold snapshot); the residual
    # read-to-write window is the maintain() serialization discipline
    # shared by every fold (CollectionLock), and repair_index resets
    # stats to corpus truth if it is ever lost
    fresh = (
        col.get_item_metadata(index_item, use_cache=False) or {}
    ).get(META_KEY) or meta
    col.write(
        index_item,
        merged,
        index_col="tp",
        zonemap=["tp"],
        overwrite=True,
        sidecar_extra={META_KEY: fresh},
    )
    DI.trim_delta(col, delta, delta_it, "doc_id")
    return {"postings_folded": n}


def verify_index(col, item, index_item: str) -> dict:
    """fsck between the corpus and the postings: docs with ≥1 token
    missing from the index (invisible to search), orphan postings of
    deleted docs (phantom results), and stats drift (``n_docs`` /
    ``total_dl`` vs the stored corpus — exact integers, so any
    mismatch is real). Read-only, column-pruned scans."""
    from pystore_spark import line_index as LI

    meta = _index_meta(col, index_item)
    id_col, text_col = meta["id_col"], meta["text_col"]
    items, corpus = LI._corpus_frame(
        col, meta, item, [id_col, text_col]
    )
    from pystore_spark import dedup_index as DI

    posting_ids = DI._union_tiers(
        col, index_item, meta["delta_item"], ["doc_id"]
    ).distinct()
    corpus_ids = corpus.select(F.col(id_col).alias("doc_id"))
    tokened = corpus.filter(
        F.size(X.tokens(F.lower(F.col(text_col)))) > 0
    ).select(F.col(id_col).alias("doc_id"))
    n_missing = tokened.join(
        posting_ids, "doc_id", "left_anti"
    ).count()
    n_orphans = posting_ids.join(
        corpus_ids, "doc_id", "left_anti"
    ).count()
    n_docs, total_dl = _doc_stats(corpus, text_col)
    stats_ok = n_docs == int(meta.get("n_docs") or 0) and (
        total_dl == int(meta.get("total_dl") or 0)
    )
    ok = n_missing == 0 and n_orphans == 0 and stats_ok
    return {
        "ok": ok,
        "items": items,
        "n_missing": n_missing,
        "n_orphans": n_orphans,
        "stats_ok": stats_ok,
        "corpus_n_docs": n_docs,
        "corpus_total_dl": total_dl,
        "meta_n_docs": int(meta.get("n_docs") or 0),
        "meta_total_dl": int(meta.get("total_dl") or 0),
    }


def repair_index(col, item, index_item: str) -> dict:
    """O(drift) repair: index missing docs (reads only the drift
    ids), drop orphan postings, and reset the stats to the stored
    corpus truth. Same posture as the sibling repairs — rebuild-free
    for the common drift classes."""
    from pystore_spark import dedup_index as DI
    from pystore_spark import line_index as LI
    from pystore_spark import utils

    meta = _index_meta(col, index_item)
    id_col, text_col = meta["id_col"], meta["text_col"]
    items, corpus = LI._corpus_frame(
        col, meta, item, [id_col, text_col]
    )
    posting_ids = DI._union_tiers(
        col, index_item, meta["delta_item"], ["doc_id"]
    ).distinct()
    corpus_ids = corpus.select(F.col(id_col).alias("doc_id"))
    missing = [
        r["doc_id"]
        for r in corpus.filter(
            F.size(X.tokens(F.lower(F.col(text_col)))) > 0
        )
        .select(F.col(id_col).alias("doc_id"))
        .join(posting_ids, "doc_id", "left_anti")
        .collect()
    ]
    orphans = [
        r["doc_id"]
        for r in posting_ids.join(
            corpus_ids, "doc_id", "left_anti"
        ).collect()
    ]
    if missing:
        batch = corpus.filter(F.col(id_col).isin(missing))
        posts = (
            _postings(batch, text_col, id_col)
            .select(
                F.current_timestamp().alias("added_at"),
                "tp", "term", "doc_id", "tf", "dl",
            )
        )
        delta = meta["delta_item"]
        if col.item_exists(delta):
            col.append(delta, posts, duplicate_handling="keep_all")
        else:
            col.write(delta, posts, index_col="added_at")
    if orphans:
        for name in (index_item, meta["delta_item"]):
            if col.item_exists(name):
                try:
                    col.delete_where(
                        name, [("doc_id", "in", orphans)]
                    )
                except StorageError:
                    pass  # predicate matched nothing in this tier
    # stats reset to corpus truth (exact)
    n_docs, total_dl = _doc_stats(corpus, text_col)

    def reset(m: dict) -> dict:
        mk = dict(m.get(META_KEY) or {})
        mk["n_docs"] = n_docs
        mk["total_dl"] = total_dl
        m[META_KEY] = mk
        return m

    utils.update_metadata_cas(col._item_path(index_item), reset)
    col.clear_metadata_cache(index_item)
    return {
        "n_indexed": len(missing),
        "n_orphans_dropped": len(orphans),
        "items": items,
    }
