"""Persistent benchmark registry for span-level decontamination.

``decontaminate_spans`` (functions/text.py) is the GPT-3/PaLM n-gram
scrub — but as a batch operator it takes the benchmark FRAME on every
call, so a daily ingest has to re-tokenize and re-shingle every
registered eval set every day, and the set of benchmarks a pipeline
must scrub against lives outside the store. This module makes the
benchmark gram sets first-class stored state, the way the MinHash/
line/gram censuses already are for dedup:

* :func:`register_benchmark` shingles an eval set ONCE and appends its
  distinct fixed-length ``n``-grams to a registry item
  ``(bench, g)``, indexed by ``bench`` so a probe reading a subset of
  benchmarks prunes files by the manifest min/max. ``n`` is pinned in
  the registry sidecar — every benchmark in one registry shares it
  (mixed-n scrubs are two registries).
* :func:`decontaminate_against` cuts every registered (or a named
  subset of) benchmark's spans from an incoming frame —
  ``text_col`` rewritten in place, GPT-3/PaLM semantics via the
  shared ``_cut_spans`` machinery.
* ``Collection.ingest(decontam_registry=...)`` runs the scrub as the
  FIRST text-surgery step of the daily ingest (before the substring/
  line census strip and the doc probe — eval content must never
  influence what the corpus judges as novel).

Scale shape: registries are benchmark-sized (bounded by eval-set
construction, never corpus-scaled), so the gram set always
broadcasts; the corpus side pays one positional-gram explode and a
map-side hash join — hit rows only reach the single doc-keyed
gaps-and-islands shuffle (see decontaminate_spans). Registration is
a read-only dependency of ingest — no census-registration write-back,
hence no replay-marker machinery: replayed ingest batches re-run the
scrub deterministically against the same stored grams.

Parity note: the reference engine (ranaroussi/pystore) has no
decontamination surface; this extends the persistent-index family
(dedup_index.py, line_index.py, substring_index.py) to external eval
sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pystore_spark.exceptions import StorageError
from pystore_spark.functions import text as X

META_KEY = "_benchmark_registry"  # sidecar key (the index-family
# underscore convention — describe()/maintain() dispatch on it)


def _registry_meta(col, registry: str) -> dict:
    meta = (col.get_item_metadata(registry) or {}).get(META_KEY)
    if not meta:
        raise StorageError(
            f"item {registry!r} is not a benchmark registry "
            "(register_benchmark creates one)"
        )
    return meta


def _bench_grams(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """Distinct fixed-length ``n``-grams of an eval frame — EXACTLY
    the gram derivation of functions/text.decontaminate_spans (sub-n
    whole-doc fallback shingles dropped), so a registry probe cuts
    byte-identically to the batch operator."""
    return (
        df.select(F.explode(X.shingles(text_col, n)).alias("g"))
        .filter(F.size(F.split(F.col("g"), " ")) == n)
        .distinct()
    )


def register_benchmark(
    col,
    registry: str,
    bench: str,
    df: DataFrame,
    text_col: str = "text",
    n: int = 13,
    replace: bool = False,
) -> dict:
    """Shingle an eval set and store its distinct ``n``-grams under
    ``bench`` in the registry item (created on first call; ``n`` is
    pinned then — later registrations must match). ``replace=True``
    re-registers an existing name (its old grams are deleted first);
    without it a duplicate name raises.

    One benchmark-sized job; the registry write is an ordinary item
    append (crash-safe via the manifest CAS like any append)."""
    if not bench:
        raise ValueError("benchmark name is empty")
    rows = _bench_grams(df, text_col, int(n)).select(
        F.lit(bench).alias("bench"), "g"
    )
    exists = col.item_exists(registry)
    if exists:
        meta = _registry_meta(col, registry)
        if int(meta["n"]) != int(n):
            raise ValueError(
                f"registry {registry!r} pins n={meta['n']}; "
                f"got n={n} — use a second registry for a different "
                "gram length"
            )
        names = {r["bench"] for r in registered_benchmarks(col, registry)}
        if bench in names and not replace:
            raise ValueError(
                f"benchmark {bench!r} already registered in "
                f"{registry!r}; pass replace=True to re-register"
            )
    else:
        names = set()
    # validate the REPLACEMENT before touching the existing state —
    # a zero-gram frame must fail without destroying the old grams
    rows = rows.localCheckpoint(eager=True)
    n_grams = rows.count()
    if n_grams == 0:
        raise ValueError(
            f"benchmark {bench!r} contributes no {n}-grams (every "
            "doc shorter than n tokens?) — registering it would be a "
            "silent no-op scrub"
        )
    if bench in names:
        unregister_benchmark(col, registry, bench)
        if not col.item_exists(registry):
            exists = False  # it was the only benchmark
    if exists:
        col.append(registry, rows, duplicate_handling="keep_all")
    else:
        col.write(
            registry,
            rows,
            index_col="bench",
            sidecar_extra={META_KEY: {"n": int(n)}},
        )
    return {"bench": bench, "n_grams": n_grams}


def registered_benchmarks(col, registry: str) -> list[dict]:
    """``[{"bench", "n_grams"}, ...]`` — one aggregation over the
    (benchmark-sized) registry item."""
    _registry_meta(col, registry)
    rows = (
        col.item(registry)
        .data.groupBy("bench")
        .agg(F.count(F.lit(1)).alias("n_grams"))
        .orderBy("bench")
        .collect()
    )
    return [
        {"bench": r["bench"], "n_grams": r["n_grams"]} for r in rows
    ]


def unregister_benchmark(col, registry: str, bench: str) -> dict:
    """Remove one benchmark's grams. Removing the LAST benchmark
    deletes the registry item itself (delete_where refuses to empty an
    item by design; an empty registry carries no state worth keeping —
    the next register_benchmark recreates it)."""
    names = {r["bench"] for r in registered_benchmarks(col, registry)}
    if bench not in names:
        raise ValueError(
            f"benchmark {bench!r} is not registered in {registry!r}"
        )
    if names == {bench}:
        col.delete_item(registry)
        return {"bench": bench, "registry_deleted": True}
    col.delete_where(registry, [("bench", "==", bench)])
    return {"bench": bench, "registry_deleted": False}


def decontaminate_against(
    col,
    registry: str,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmarks: list[str] | None = None,
) -> tuple[DataFrame, dict]:
    """Cut every registered benchmark's spans from ``docs`` —
    ``text_col`` rewritten in place (GPT-3/PaLM semantics, shared
    ``_cut_spans`` machinery; PRECONDITION: ``id_col`` unique).

    ``benchmarks`` restricts the scrub to named eval sets (the
    ``bench``-indexed layout prunes registry files by manifest
    min/max). Returns ``(cleaned_df, report)``; the cleaned frame is
    checkpointed (it feeds an append), and the report counts come
    from that same materialization."""
    meta = _registry_meta(col, registry)
    n = int(meta["n"])
    filters = None
    if benchmarks is not None:
        if not benchmarks:
            raise ValueError("benchmarks list is empty")
        missing = set(benchmarks) - {
            r["bench"] for r in registered_benchmarks(col, registry)
        }
        if missing:
            raise ValueError(
                f"benchmarks not registered in {registry!r}: "
                f"{sorted(missing)}"
            )
        filters = [("bench", "in", list(benchmarks))]
    grams = (
        col.item(registry, filters=filters, columns=["g"])
        .data.select("g")
        .distinct()
    )
    cut = X.decontaminate_spans_with_grams(
        docs, grams, text_col=text_col, id_col=id_col, n=n
    ).localCheckpoint(eager=True)
    agg = cut.agg(
        F.sum((F.col("n_spans_removed") > 0).cast("bigint")).alias(
            "docs"
        ),
        F.sum("n_spans_removed").alias("spans"),
        F.sum("n_tokens_removed").alias("toks"),
    ).collect()[0]
    out = cut.withColumn(text_col, F.col("cleaned_text")).drop(
        "cleaned_text", "n_spans_removed", "n_tokens_removed"
    )
    return out, {
        "n": n,
        "benchmarks": benchmarks,
        "n_docs_cleaned": int(agg["docs"] or 0),
        "n_spans_removed": int(agg["spans"] or 0),
        "n_tokens_removed": int(agg["toks"] or 0),
    }
