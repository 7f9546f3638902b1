"""Structured Streaming ingest.

The reference's ``append_stream`` is chunked *batch* (SURVEY §2.11);
the Spark-native ingest path models a true stream: ``readStream`` →
``foreachBatch`` → the same keyed merge the batch append uses, so
late/duplicate data is deduplicated per micro-batch against the
stored item. ``with_dedup_watermark`` exposes the watermark +
``dropDuplicates`` formulation for keep-first semantics inside a
single stream.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


COMMITS_KEY = "_streaming_commits"


def _last_applied(collection, item: str, key: str) -> int:
    """Last applied batch id for ``key`` recorded in ``item``'s
    sidecar — the ONE replay-guard read every sink uses (-1 when the
    item doesn't exist yet)."""
    if not collection.item_exists(item):
        return -1
    commits = dict(
        collection.get_item_metadata(item, use_cache=False).get(
            COMMITS_KEY
        )
        or {}
    )
    return int(commits.get(key, -1))


def merge_sink(
    collection,
    item: str,
    duplicate_handling: str = "keep_last",
    validate_schema: bool = True,
    sink_key: str | None = None,
    refresh_rollups: bool = False,
    refresh_matviews: bool = False,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function: upsert each micro-batch into the
    item (creates it on the first batch).

    Exactly-once under replay: Structured Streaming re-delivers the
    last micro-batch when a crash lands between storage commit and
    checkpoint commit. The last applied ``batch_id`` is recorded in
    the item sidecar *in the same sidecar write that commits the data*
    (``sidecar_extra``), and replayed ids are skipped — so even
    ``keep_all``/``error`` strategies, where the merge itself is not
    idempotent, survive replays. ``sink_key`` namespaces the counter
    when several independent streams feed one item.

    ``refresh_rollups=True`` brings every materialized rollup of the
    item up to date after each committed batch — the continuous-
    aggregate pattern: each refresh is O(buckets the batch touched)
    via the manifest file-list diff (collection.refresh_rollups). A
    replayed batch refreshes at most once because the data commit is
    skipped first. ``refresh_matviews=True`` does the same for
    materialized query views (matview.py) — streaming materialized
    views: an algebraic matview with an ``incremental`` spec folds
    each micro-batch's delta files in O(batch); others rebuild.
    Both refresh paths are idempotent and O(1) when already fresh,
    so the crash-between-commit-and-refresh window self-heals on
    replay."""
    key = sink_key or "default"

    def _refresh() -> None:
        if refresh_rollups:
            collection.refresh_rollups(item)
        if refresh_matviews:
            for m in collection.matviews_of(item):
                collection.refresh_matview(m)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not collection.item_exists(item):
            collection.write(
                item, batch_df,
                sidecar_extra={COMMITS_KEY: {key: int(batch_id)}},
            )
            _refresh()
            return
        if _last_applied(collection, item, key) >= int(batch_id):
            # replayed micro-batch — data already committed. Still
            # refresh: a crash BETWEEN the data commit and the refresh
            # would otherwise leave rollups/matviews stale forever
            # (refresh is idempotent and O(1) when already fresh)
            _refresh()
            return
        # send ONLY this sink's counter: the append-side dict-aware
        # sidecar merge (utils.merge_sidecar) folds it into the live
        # map, so a commit retry cannot regress another sink's counter
        collection.append(
            item,
            batch_df,
            duplicate_handling=duplicate_handling,
            validate_schema=validate_schema,
            sidecar_extra={COMMITS_KEY: {key: int(batch_id)}},
        )
        _refresh()

    return sink


def cdc_merge_sink(
    collection,
    item: str,
    on: str | list[str],
    op_col: str = "op",
    delete_op: str = "D",
    sink_key: str | None = None,
    order_col: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` CDC apply: each micro-batch carries an
    ``op_col`` of upserts and tombstones (e.g. Debezium-style
    ``I``/``U``/``D``) and lands as ONE :meth:`Collection.merge_into`:
    matched tombstones DELETE, other matches update_all, unmatched
    non-tombstones insert, unmatched tombstones are dropped (the
    ``not_matched_condition`` gate — a delete for a never-seen key
    must not resurrect it). The op column never reaches storage (the
    merge projects the target schema).

    A batch may carry several changes per key; they collapse to the
    LAST change first (merge.dedup_within — pass ``order_col``, e.g.
    the CDC log sequence number, to pin which change is last; see the
    order_col determinism note there), because MERGE requires a
    key-unique source.

    Exactly-once under replay exactly as :func:`merge_sink`: the
    applied ``batch_id`` rides the merge's OWN manifest commit
    (``sidecar_extra``) and replayed ids are skipped — required here
    because a CDC merge is not idempotent (a replayed delete after an
    insert of the same key would flip the outcome)."""
    from pystore_spark.merge import dedup_within

    keys = [on] if isinstance(on, str) else list(on)
    key = sink_key or "default"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if _last_applied(collection, item, key) >= int(batch_id):
            return  # replayed micro-batch — already applied
        batch = dedup_within(
            batch_df, keys, keep="last", order_col=order_col
        )
        if not collection.item_exists(item):
            first = batch.filter(
                F.col(op_col) != F.lit(delete_op)
            ).drop(op_col)
            if first.isEmpty():
                # all tombstones against an empty target: a no-op —
                # don't create the item (a replay re-delivers, and
                # there is nowhere to record the batch id yet)
                return
            collection.write(
                item, first,
                sidecar_extra={COMMITS_KEY: {key: int(batch_id)}},
            )
            return
        collection.merge_into(
            item, batch, on=keys,
            when_matched="update_all",
            when_matched_delete=f"s.{op_col} = '{delete_op}'",
            when_not_matched="insert_all",
            not_matched_condition=f"s.{op_col} <> '{delete_op}'",
            sidecar_extra={COMMITS_KEY: {key: int(batch_id)}},
        )

    return sink


def dedup_merge_sink(
    collection,
    item: str,
    index_item: str,
    sink_key: str | None = None,
    within_batch: bool = False,
    **append_kwargs: Any,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function: near-dedup each micro-batch against
    the STORED corpus via the persistent MinHash index
    (Collection.append_dedup — O(batch), never re-signing the corpus)
    before appending; survivors are indexed into the delta tier so
    later batches dedup against them too. The streaming face of the
    daily-pipeline operation.

    Exactly-once in BOTH directions: the last applied batch id rides
    in the data commit's sidecar (a re-delivered micro-batch is never
    re-appended), and each index-delta append carries its own marker —
    a replayed batch whose data committed but whose indexing crashed
    re-runs the probe deterministically and repairs only the missing
    index appends (without this, those documents would stay invisible
    to every future probe)."""
    key = sink_key or "default"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        replayed = _last_applied(collection, item, key) >= int(batch_id)
        collection.append_dedup(
            item,
            batch_df,
            index_item,
            within_batch=within_batch,
            create_missing=True,  # first batch creates the item
            sidecar_extra={COMMITS_KEY: {key: int(batch_id)}},
            replay_marker=(key, int(batch_id)),
            data_committed=replayed,
            **append_kwargs,
        )

    return sink


def semantic_dedup_sink(
    collection,
    item: str,
    index_item: str,
    threshold: float = 0.95,
    nprobe: int = 1,
    sink_key: str | None = None,
    index_survivors: bool = True,
    within_batch: bool = False,
    **append_kwargs: Any,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function: SemDeDup each micro-batch against
    the stored corpus via the persistent VECTOR index
    (Collection.semantic_dedup_probe — O(batch), cell-pruned reads,
    never a corpus rescan): batch rows whose nearest stored neighbor
    clears the cosine ``threshold`` drop, survivors append to
    ``item``, and (``index_survivors=True``) the survivors'
    ``(id, vector)`` rows land in the index's delta tier so LATER
    batches dedup against them too — the embedding analogue of
    :func:`dedup_merge_sink`.

    Exactly-once: the data append and the index-delta append each
    carry their own batch-id marker in their target's sidecar
    (written atomically with the commit), so a replayed micro-batch
    skips whichever side already committed and re-runs only the
    other. The probe itself reads only the INDEX, so recomputing it
    on replay is deterministic regardless of the data commit.
    Ordering: data first — a crash between the two appends leaves
    committed docs briefly invisible to future probes (duplicates
    may slip through until the replay repairs the index), never the
    reverse, where ghost index entries would suppress docs that were
    never stored.

    ``within_batch=True`` additionally collapses near-dups INSIDE
    each micro-batch before the stored-corpus probe: the batch is
    cell-assigned with the index's PERSISTED centroids (no training
    job), pairs are cluster-local within the batch, and the smaller
    id of each pair wins — so a micro-batch carrying its own
    duplicates lands deduplicated. Off by default: it adds a
    batch-local pair join per micro-batch, and upstream
    exactly-once ingest often guarantees unique rows already."""
    key = sink_key or "default"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bid = int(batch_id)
        meta = (
            collection.get_item_metadata(index_item) or {}
        ).get("_vector_index")
        if not meta:
            raise ValueError(
                f"item {index_item!r} is not a vector index "
                "(build_vector_index creates one)"
            )
        idc = meta["id_col"]
        if within_batch:
            from pystore_spark.functions import similarity as S

            vec_col = meta["vec_col"]
            cents = [
                [float(x) for x in c] for c in meta["centroids"]
            ]
            assigned = S._assign_cells(
                batch_df.select(idc, vec_col), vec_col, cents
            )
            intra = S.cosine_dedup_pairs(
                assigned, vec_col, idc, block_col="cell",
                threshold=threshold,
            ).select(F.col("id_j").alias(idc))
            # pinned: the intra-deduped batch feeds the probe, the
            # survivors checkpoint, and (PQ tier) the LUT collect —
            # without this the batch-local pair join re-runs per
            # action (review r12)
            batch_df = batch_df.join(
                intra, idc, "left_anti"
            ).localCheckpoint(eager=True)
        hits = collection.semantic_dedup_probe(
            index_item, batch_df, threshold=threshold, nprobe=nprobe
        )
        # pinned once: survivors feed up to three actions (empty
        # check, data append, index append) — without the checkpoint
        # each would re-run the probe
        survivors = batch_df.join(
            hits.select(idc), idc, "left_anti"
        ).localCheckpoint(eager=True)
        if survivors.isEmpty():
            return
        if not collection.item_exists(item):
            collection.write(
                item, survivors,
                sidecar_extra={COMMITS_KEY: {key: bid}},
            )
        elif _last_applied(collection, item, key) < bid:
            collection.append(
                item,
                survivors,
                sidecar_extra={COMMITS_KEY: {key: bid}},
                **append_kwargs,
            )
        if index_survivors:
            delta = f"{index_item}__delta"
            if _last_applied(collection, delta, key) < bid:
                # the full survivor rows, not just (id, vector): the
                # index base carries the source's payload columns and
                # probes union base ∪ delta by the base's column set
                collection.append_vector_index(
                    index_item,
                    survivors,
                    sidecar_extra={COMMITS_KEY: {key: bid}},
                )

    return sink


def ingest_stream(
    collection,
    item: str,
    stream_df: DataFrame,
    checkpoint_dir: str,
    duplicate_handling: str = "keep_last",
    trigger: dict[str, Any] | None = None,
    query_name: str | None = None,
) -> StreamingQuery:
    """Start a streaming ingest into ``collection/item``.

    ``trigger`` defaults to ``availableNow`` (drain-what-exists) —
    pass e.g. ``{"processingTime": "10 seconds"}`` for continuous
    micro-batching.
    """
    name = query_name or f"ingest_{item}"
    writer = (
        stream_df.writeStream.foreachBatch(
            merge_sink(collection, item, duplicate_handling, sink_key=name)
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName(name)
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def with_dedup_watermark(
    stream_df: DataFrame,
    key_cols: list[str],
    event_time_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Keep-first dedup inside one stream: watermark bounds the dedup
    state so it's droppable at scale; duplicates of a key arriving
    within the delay window are suppressed."""
    return stream_df.withWatermark(event_time_col, delay).dropDuplicates(
        key_cols
    )


def running_count_per_key(
    stream_df: DataFrame,
    key_col: str,
    timeout_minutes: int = 30,
) -> DataFrame:
    """Custom stateful streaming operator via
    ``applyInPandasWithState``: a per-key running event count that
    survives across micro-batches (the template for bespoke state
    machines the built-in windowed aggs can't express).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "key long, n long"
    state_schema = "n long"

    def update(key, pdfs, state):
        count = state.get[0] if state.exists else 0
        for pdf in pdfs:
            count += len(pdf)
        state.update((count,))
        yield pd.DataFrame({"key": [key[0]], "n": [count]})

    return (
        stream_df.withColumn("key", F.col(key_col))
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_time: str,
    right_time: str,
    delay: str = "10 minutes",
    lookback: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join: each left event joins
    right events with the same key whose timestamp falls in
    ``[left_time - lookback, left_time]``.

    The time bound + both-side watermarks make the join state
    droppable: Spark evicts right-side rows once the left watermark
    passes ``right_time + lookback`` (unbounded stream-stream joins
    would accumulate state forever — the classic 100 TB streaming
    failure mode). Outer variants additionally need the watermark to
    know when an unmatched row can be emitted.

    Works identically on batch frames (watermarks become no-ops), so
    the join logic is testable offline against the same assertion.
    """
    l_wm = left.withWatermark(left_time, delay) if left.isStreaming else left
    r_wm = (
        right.withWatermark(right_time, delay)
        if right.isStreaming
        else right
    )
    lhs, rhs = l_wm.alias("l"), r_wm.alias("r")
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (
            F.col(f"r.{right_time}")
            >= F.col(f"l.{left_time}") - F.expr(f"INTERVAL {lookback}")
        )
        & (F.col(f"r.{right_time}") <= F.col(f"l.{left_time}"))
    )
    return lhs.join(rhs, cond, how).select(
        F.col(f"l.{key_col}").alias(key_col),
        F.col(f"l.{left_time}").alias(left_time),
        F.col(f"r.{right_time}").alias(right_time),
        *[
            F.col(f"l.{c}").alias(c)
            for c in left.columns
            if c not in (key_col, left_time)
        ],
        *[
            F.col(f"r.{c}").alias(f"r_{c}")
            for c in right.columns
            if c not in (key_col, right_time)
        ],
    )


def windowed_counts(
    stream_df: DataFrame,
    event_time_col: str,
    window_duration: str = "1 hour",
    slide: str | None = None,
    delay: str = "10 minutes",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Watermarked event-time windowed aggregation — the canonical
    late-data pattern: counts per (tumbling or sliding) window, state
    dropped once the watermark passes the window end. Works identically
    on batch DataFrames (no watermark state, same results) so the
    logic is testable offline."""
    keys = [
        F.window(F.col(event_time_col), window_duration, slide or window_duration)
    ] + [F.col(c) for c in (extra_keys or [])]
    wm = stream_df
    if stream_df.isStreaming:
        wm = stream_df.withWatermark(event_time_col, delay)
    return wm.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events")
    ).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[F.col(c) for c in (extra_keys or [])],
        "n_events",
    )


def session_windows(
    stream_df: DataFrame,
    event_time_col: str,
    key_col: str,
    gap: str = "30 minutes",
    delay: str = "10 minutes",
) -> DataFrame:
    """Session-window aggregation (native ``session_window`` — gap
    -based sessions, the streaming cousin of the batch sessionization
    query): events per key grouped into sessions that close after
    ``gap`` of inactivity."""
    wm = stream_df
    if stream_df.isStreaming:
        wm = stream_df.withWatermark(event_time_col, delay)
    return wm.groupBy(
        F.session_window(F.col(event_time_col), gap), F.col(key_col)
    ).agg(F.count(F.lit(1)).alias("n_events")).select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        F.col(key_col),
        "n_events",
    )


def curated_ingest_sink(
    collection,
    item: str,
    pipeline: Any = None,
    dedup_index: str | None = None,
    line_index: str | None = None,
    substring_index: str | None = None,
    text_index: str | None = None,
    sink_key: str | None = None,
    within_batch: bool = False,
    record_funnel: bool = False,
    **ingest_kwargs: Any,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function running the FULL daily ingest per
    micro-batch (Collection.ingest): pipeline stages (including
    global ones — the micro-batch is a plain frame inside
    foreachBatch), corpus-owned line or k-gram span removal via the
    persistent line/gram census (``line_index`` / ``substring_index``,
    mutually exclusive per ingest), near-dedup probe via the
    persistent MinHash index, append — all O(batch). The streaming face of the complete curation
    operation; :func:`dedup_merge_sink` is the dedup-only subset.

    Exactly-once in both directions (same machinery as
    :func:`dedup_merge_sink`): the DATA commit's sidecar marker stops
    re-appends, and per-index-item markers let a replayed batch repair
    index/census appends the crashed run never made — the pipeline
    stages and probe re-run deterministically, the data append is
    skipped. ``record_funnel`` defaults False here: the per-batch
    funnel accounting and metadata stamp are extra jobs a
    low-latency stream usually skips (the replay marker is
    independent of it). A benchmark-registry scrub rides through
    ``ingest_kwargs`` (``decontam_registry=...``): it reads stored
    grams and writes nothing back, so it needs no replay repair —
    a replayed batch re-cuts deterministically."""
    key = sink_key or "default"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        replayed = _last_applied(collection, item, key) >= int(batch_id)
        if replayed:
            if (
                dedup_index is None
                and line_index is None
                and substring_index is None
                and text_index is None
            ):
                return  # no index steps to repair — data landed
            # metadata-only fast path: when every index tier already
            # recorded this batch's marker, only the stream checkpoint
            # write crashed — skip the pipeline re-run entirely
            from pystore_spark import dedup_index as DI

            marker = (key, int(batch_id))
            names = []
            if dedup_index is not None:
                m = DI._index_meta(collection, dedup_index)
                names += [m["bands_delta"], m["docs_delta"]]
            if line_index is not None:
                from pystore_spark import line_index as LI

                names.append(
                    LI._index_meta(collection, line_index)[
                        "delta_item"
                    ]
                )
            if substring_index is not None:
                from pystore_spark import substring_index as SI

                names.append(
                    SI._index_meta(collection, substring_index)[
                        "delta_item"
                    ]
                )
            text_current = True
            if text_index is not None:
                from pystore_spark import text_index as TI

                meta_ti = TI._index_meta(collection, text_index)
                names.append(meta_ti["delta_item"])
                # the postings index carries a SECOND marker for its
                # stats bump, recorded inside the base sidecar meta —
                # both halves must be current for the fast path
                commits = meta_ti.get("_stats_commits") or {}
                text_current = commits.get(key, -1) >= int(batch_id)
            if text_current and all(
                DI._marker_current(collection, n, marker)
                for n in names
            ):
                return
        collection.ingest(
            item,
            batch_df,
            pipeline=pipeline,
            dedup_index=dedup_index,
            line_index=line_index,
            substring_index=substring_index,
            text_index=text_index,
            within_batch=within_batch,
            create_missing=True,
            record_funnel=record_funnel,
            sidecar_extra={COMMITS_KEY: {key: int(batch_id)}},
            replay_marker=(key, int(batch_id)),
            data_committed=replayed,
            **ingest_kwargs,
        )

    return sink
