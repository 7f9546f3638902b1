"""Composable corpus-curation pipeline for LLM training data.

``CurationPipeline`` chains the engine's curation operators — quality
/ language / length filters, PII scrubbing, exact / near / chunk
dedup, benchmark decontamination — into ONE lazy DataFrame plan with
per-stage survival accounting, the funnel every pretraining data
report is built around.

Execution model (the 100 TB contract):

* **Row-local stages** (filters, scrubbing) are pure Catalyst column
  expressions folded into the running plan — no shuffle, no action,
  and consecutive filters collapse into a single scan pass under
  whole-stage codegen.
* **Global stages** (dedup, decontamination) contribute their own
  shuffles exactly as the underlying operators do
  (functions/dedup.py); the pipeline adds nothing on top.
* :meth:`funnel` counts survivors with one conditional-count
  aggregation per *contiguous block* of row-local stages (the
  quality_funnel pattern — k filters cost ONE pass, not k) plus one
  count per global stage, never a count per row-local stage.

The reference has no pipeline surface; this composes the operator
inventory SURVEY §2 catalogs into the workflow those operators exist
for.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pystore_spark.functions import dedup as D
from pystore_spark.functions import text as X

# stage kinds
_LOCAL = "local"  # predicate Column over the current frame (filter)
_TRANSFORM = "transform"  # row-local rewrite (no cardinality change)
_GLOBAL = "global"  # DataFrame -> DataFrame (shuffling operator)


def _plan_shuffles(df: DataFrame) -> bool:
    """True when the frame's physical plan contains an Exchange —
    the cheap planning-only probe _execute uses to decide whether a
    TRANSFORM stage is worth an eager checkpoint (pure projections
    fold into the next stage for free; shuffling transforms like
    dedup_lines would otherwise re-run at append time)."""
    try:
        return "Exchange" in (
            df._jdf.queryExecution().executedPlan().toString()
        )
    except Exception:  # Connect / plan-introspection unavailable
        return True  # conservative: keep the re-execution guarantee


class CurationPipeline:
    """Lazily-composed curation pipeline over a documents DataFrame.

    >>> p = (CurationPipeline(docs)
    ...      .filter_min_chars(100)
    ...      .filter_tokens(min_tokens=20)
    ...      .filter_quality(0.5)
    ...      .scrub_pii()
    ...      .dedup_exact()
    ...      .decontaminate(eval_docs))
    >>> clean = p.dataframe()   # one lazy plan
    >>> p.funnel().show()       # survival per stage
    """

    def __init__(
        self, df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ):
        self._input = df
        self.id_col = id_col
        self.text_col = text_col
        # (name, kind, payload): payload is a Column factory for local
        # stages (re-evaluated against the running frame so transforms
        # upstream are respected), a df->df for transform/global
        self._stages: list[tuple[str, str, Callable]] = []

    # ------------------------------------------------------------------
    # row-local filters (pure Catalyst, fused into one pass)
    # ------------------------------------------------------------------
    def filter(self, name: str, predicate: Callable[[], Column] | Column):
        """Keep rows matching ``predicate`` (a Column, or a thunk
        returning one — use a thunk when the predicate should see
        upstream transforms such as scrubbing)."""
        payload = predicate if callable(predicate) else (lambda: predicate)
        self._stages.append((name, _LOCAL, payload))
        return self

    def filter_min_chars(self, n: int):
        return self.filter(
            f"min_chars>={n}", F.length(self.text_col) >= n
        )

    def filter_tokens(
        self, min_tokens: int = 0, max_tokens: int | None = None
    ):
        c = X.token_count(self.text_col)
        cond = c >= min_tokens
        if max_tokens is not None:
            cond = cond & (c <= max_tokens)
        return self.filter(f"tokens[{min_tokens},{max_tokens}]", cond)

    def filter_bpe_tokens(
        self, min_tokens: int = 0, max_tokens: int | None = None,
        merges=None,
    ):
        """Budget gate on REAL BPE token counts (functions/bpe.py —
        the merge loop over the shipped public-format merges file),
        not the whitespace proxy: documents outside
        ``[min_tokens, max_tokens]`` true tokens drop.

        Batch frames take the distinct-vocabulary plan
        (:func:`bpe.bpe_token_counts` — one JVM regex explode, the
        Python merge loop confined to the Zipf-bounded vocab, counts
        back via a broadcastable join), keyed on a null-safe text hash
        so duplicate/null doc ids neither multiply nor drop rows —
        the same rewrite the shard-export path uses. Streaming
        micro-batches, where a corpus-wide vocabulary join is
        impossible, fall back to the Arrow-batched per-word-cached
        UDF (bpe_count_udf) inside :meth:`apply`; both paths depend
        on the text alone, so the kept set is identical."""
        from pystore_spark.functions.bpe import (
            bpe_count_udf,
            bpe_token_counts,
        )

        text_col = self.text_col

        def batch(df: DataFrame) -> DataFrame:
            if "_bpe_tkey" in df.columns:
                raise ValueError(
                    "column '_bpe_tkey' collides with "
                    "filter_bpe_tokens's working column — rename it"
                )
            tkey = F.md5(F.coalesce(F.col(text_col), F.lit("")))
            keyed = df.withColumn("_bpe_tkey", tkey)
            counts = bpe_token_counts(
                keyed.select("_bpe_tkey", text_col)
                .dropDuplicates(["_bpe_tkey"]),
                text_col=text_col,
                id_col="_bpe_tkey",
                merges=merges,
            )
            cond = F.col("n_bpe_tokens") >= min_tokens
            if max_tokens is not None:
                cond = cond & (F.col("n_bpe_tokens") <= max_tokens)
            keep = counts.filter(cond).select("_bpe_tkey")
            return keyed.join(
                keep, "_bpe_tkey", "left_semi"
            ).drop("_bpe_tkey")

        def stream_cond():
            c = bpe_count_udf(merges)(F.col(text_col))
            out = c >= min_tokens
            if max_tokens is not None:
                out = out & (c <= max_tokens)
            return out

        batch.streaming_fallback = stream_cond
        self._stages.append(
            (f"bpe_tokens[{min_tokens},{max_tokens}]", _GLOBAL, batch)
        )
        return self

    def filter_quality(self, min_score: float):
        return self.filter(
            f"quality>={min_score}",
            X.quality_score(self.text_col) >= min_score,
        )

    def filter_language(self, langs: Sequence[str]):
        return self.filter(
            f"lang in {sorted(langs)}",
            X.detect_language(self.text_col).isin(*langs),
        )

    def filter_gopher(self):
        """Published Gopher shape gates (word-count / mean-word-length
        bounds, alphabetic-word ratio; functions/text.gopher_flags)."""
        return self.filter(
            "gopher_rules",
            lambda: X.gopher_flags(self.text_col)["gopher_pass"],
        )

    def filter_c4(self):
        """C4-style cleanup (lorem-ipsum / curly-brace red flags,
        terminal-punctuation line ratio; functions/text.c4_flags)."""
        return self.filter(
            "c4_rules", lambda: X.c4_flags(self.text_col)["c4_pass"]
        )

    def filter_encoding(self):
        """Drop documents with encoding damage — mojibake sequences,
        U+FFFD replacement chars, stray C0 controls
        (functions/text.encoding_flags). The detect-and-drop stand-in
        for the ftfy repair step."""
        return self.filter(
            "encoding_clean",
            lambda: X.encoding_flags(self.text_col)["encoding_clean"],
        )

    def filter_max_pii(self, max_hits: int = 0):
        """Drop documents with more than ``max_hits`` PII matches
        across all categories."""
        total = None
        for c in X.pii_counts(self.text_col).values():
            total = c if total is None else total + c
        return self.filter(f"pii<={max_hits}", total <= max_hits)

    def filter_decodable(
        self,
        media_col: str = "payload",
        decoder: str = "real",
        kinds: "Sequence[str] | None" = None,
    ):
        """Gate multimodal rows on container decodability of a binary
        ``media_col``: a row whose payload fails the header decode —
        or decodes to a kind outside ``kinds`` — drops before any
        downstream stage wastes work on it. The decode kernel is the
        same ``DECODERS`` entry :func:`multimodal.extract_features`
        uses (``"real"`` = the pure-Python PNG/JPEG/GIF/WAV header
        parsers; full pixel/sample decode needs codec libraries and
        stays out of scope — functions/multimodal.py). Runs as an
        Arrow-batched ``mapInPandas`` over the full row: schema
        unchanged, no shuffle, and the Python cost is one header
        parse per row, not a pixel decode."""
        from pystore_spark.functions import multimodal as M

        decode = M.DECODERS[decoder]
        want = set(kinds) if kinds is not None else None
        col = media_col

        def g(df: DataFrame) -> DataFrame:
            schema = df.schema

            def run(batches):
                for pdf in batches:
                    if len(pdf) == 0:
                        yield pdf
                        continue

                    def ok(payload) -> bool:
                        if payload is None:
                            return False
                        try:
                            d = decode(bytes(payload))
                        except Exception:
                            return False
                        return want is None or d["kind"] in want

                    yield pdf[pdf[col].map(ok)]

            return df.mapInPandas(run, schema)

        name = "decodable[" + decoder + (
            "," + ",".join(sorted(want)) if want else ""
        ) + "]"
        self._stages.append((name, _GLOBAL, g))
        return self

    def filter_image_content(
        self,
        media_col: str = "payload",
        min_entropy: float = 0.0,
        min_width: int = 0,
        min_height: int = 0,
        drop_undecodable: bool = False,
    ):
        """Gate image rows on PIXEL CONTENT, not just container
        headers: blank/near-constant images (entropy below
        ``min_entropy`` bits) and sub-threshold dimensions drop — the
        image-side analog of the text quality gates, possible because
        PNG payloads fully decode in-process
        (functions/multimodal.decode_png_pixels). Payloads that need
        a codec library (JPEG entropy data, ...) PASS by default —
        content unknown is not content bad; set
        ``drop_undecodable=True`` for a PNG-only corpus. Arrow-batched
        ``mapInPandas``, schema unchanged, no shuffle."""
        from pystore_spark.functions import multimodal as M

        col = media_col

        def g(df: DataFrame) -> DataFrame:
            schema = df.schema

            def run(batches):
                for pdf in batches:
                    if len(pdf) == 0:
                        yield pdf
                        continue

                    def ok(payload) -> bool:
                        if payload is None:
                            # content unknown, like codec-bound bytes
                            return not drop_undecodable
                        try:
                            px = M.decode_png_pixels(bytes(payload))
                        except Exception:
                            return not drop_undecodable
                        h, w, _ = px.shape
                        if w < min_width or h < min_height:
                            return False
                        st = M._content_stats(px)
                        return st["entropy"] >= min_entropy

                    yield pdf[pdf[col].map(ok)]

            return df.mapInPandas(run, schema)

        name = (
            f"image_content[entropy>={min_entropy},"
            f"{min_width}x{min_height}]"
        )
        self._stages.append((name, _GLOBAL, g))
        return self

    # ------------------------------------------------------------------
    # row-local transforms
    # ------------------------------------------------------------------
    def scrub_pii(self, replacement: str = "[REDACTED]"):
        """Redact PII in-place in the text column (cardinality
        unchanged — never counted as a funnel drop)."""
        txt = self.text_col

        def tf(df: DataFrame) -> DataFrame:
            return df.withColumn(txt, X.scrub_pii(txt, replacement))

        self._stages.append(("scrub_pii", _TRANSFORM, tf))
        return self

    def transform(self, name: str, fn: Callable[[DataFrame], DataFrame]):
        self._stages.append((name, _TRANSFORM, fn))
        return self

    def filter_classifier(
        self,
        min_prob: float = 0.5,
        weights: dict[str, float] | None = None,
        intercept: float | None = None,
    ):
        """Model-based quality gate (functions/classifier.py): sigmoid
        linear classifier over bounded lexical features, evaluated as
        pure Column expressions with the weights as plan literals —
        pass learned weights from ``train_quality_classifier`` or ship
        the defaults. Fuses into the local-filter block like the other
        published filters."""
        from pystore_spark.functions.classifier import classifier_score

        return self.filter(
            f"classifier>={min_prob}",
            lambda: classifier_score(
                self.text_col, weights, intercept
            )
            >= min_prob,
        )

    def dedup_lines(self, min_docs: int = 2):
        """C4-style repeated-line removal (functions/text.dedup_lines):
        a non-blank line occurring in ``min_docs``+ distinct documents
        survives only in the lowest-id owner document. Cardinality is
        unchanged — documents keep their identity and line order,
        duplicated lines vanish from non-owner copies — so this is a
        TRANSFORM for funnel accounting, though it shuffles (line
        census + md5-key join + per-doc rebuild)."""
        id_col, txt = self.id_col, self.text_col

        def tf(df: DataFrame) -> DataFrame:
            return X.dedup_lines(df, id_col, txt, min_docs)

        self._stages.append(
            (f"dedup_lines>={min_docs}", _TRANSFORM, tf)
        )
        return self

    # ------------------------------------------------------------------
    # global (shuffling) stages
    # ------------------------------------------------------------------
    def dedup_exact(self):
        """Keep one document per normalized-text fingerprint (min id
        wins — deterministic)."""
        id_col, txt = self.id_col, self.text_col

        def g(df: DataFrame) -> DataFrame:
            return D.exact_dedup_survivors(df, txt, id_col)

        self._stages.append(("dedup_exact", _GLOBAL, g))
        return self

    def dedup_near(
        self,
        threshold: float = 0.8,
        num_hashes: int = 8,
        bands: int = 4,
        shingle_n: int = 3,
    ):
        """MinHash-LSH near-dedup (exact-dedup survivors → candidate
        pairs → Jaccard verify → connected components → keep min id
        per cluster). Subsumes :meth:`dedup_exact`."""
        id_col, txt = self.id_col, self.text_col

        def g(df: DataFrame) -> DataFrame:
            return D.near_dedup(
                df, txt, id_col, threshold, num_hashes, bands, shingle_n
            )

        self._stages.append(
            (f"dedup_near@{threshold}", _GLOBAL, g)
        )
        return self

    def dedup_chunks(self, max_dup_ratio: float = 0.5, chunk_tokens: int = 10):
        """Drop documents more than ``max_dup_ratio`` of whose
        ``chunk_tokens``-token chunks also occur in other documents
        (sub-document boilerplate / mirrored-passage dedup)."""
        id_col, txt = self.id_col, self.text_col

        def g(df: DataFrame) -> DataFrame:
            toks = X.tokens(txt)
            t = df.withColumn("_toks", toks).filter(F.size("_toks") > 0)
            ch = t.select(
                F.col(id_col).alias("_cid"),
                F.explode(
                    X.chunk_hashes("_toks", chunk_tokens)
                ).alias("_h"),
            )
            byc = ch.groupBy("_h").agg(
                F.countDistinct("_cid").alias("_nd")
            )
            ratio = ch.join(byc, "_h").groupBy("_cid").agg(
                (
                    F.sum(F.when(F.col("_nd") >= 2, 1).otherwise(0)).cast(
                        "double"
                    )
                    / F.count(F.lit(1))
                ).alias("_r")
            )
            # anti-join on the DROP set, not semi-join on the keep set:
            # documents with zero tokens (no chunks, hence absent from
            # `ratio`) have no duplicate chunks by definition and must
            # pass through unchanged — a semi-join would silently drop
            # them, an unannounced cardinality change unrelated to the
            # stage's purpose
            drop = ratio.filter(F.col("_r") > max_dup_ratio).select(
                F.col("_cid").alias(id_col)
            )
            return df.join(drop, id_col, "left_anti")

        self._stages.append(
            (f"dedup_chunks<= {max_dup_ratio}", _GLOBAL, g)
        )
        return self

    def dedup_embedding(
        self,
        vec_col: str,
        threshold: float = 0.95,
        dim: int | None = None,
        n_planes: int = 16,
        band_bits: int = 4,
        method: str = "lsh",
        n_cells: int = 64,
        n_iters: int = 2,
        prefer_col: str | None = None,
    ):
        """Semantic dedup on an embedding column: candidate pairs →
        exact cosine verify at ``threshold`` → drop every document
        that has a verified smaller-id duplicate (the standard greedy
        keep-min rule — deterministic; unlike the connected-components
        variant it never chains A~B~C into one cluster, which for
        semantic dedup is usually the wanted behavior). Nothing
        scores all pairs.

        ``method`` picks the candidate generator:

        - ``"lsh"`` (default): sign-LSH band buckets — quadratic only
          within bands, recall tunable via ``n_planes``/``band_bits``.
        - ``"kmeans"``: SemDeDup proper (Abbas et al. 2023,
          similarity.semdedup_kept) — deterministic KMeans with
          ``n_cells``/``n_iters`` as the blocking key, quadratic only
          within each learned cluster. Prefer it when near-dups are
          paraphrase-distance (LSH sign bits miss them) and scale
          ``n_cells`` with the corpus so cluster sizes stay bounded.
          ``prefer_col`` keeps the highest-scoring member of each
          duplicate group instead of the smallest id (kmeans method
          only — see similarity.semdedup_kept)."""
        if method not in ("lsh", "kmeans"):
            raise ValueError("method must be 'lsh' or 'kmeans'")
        id_col = self.id_col

        if prefer_col is not None and method != "kmeans":
            raise ValueError(
                "prefer_col needs method='kmeans' (the LSH method "
                "keeps the smallest id)"
            )

        def g_kmeans(df: DataFrame) -> DataFrame:
            from pystore_spark.functions import similarity as S

            cols = [F.col(id_col), F.col(vec_col)] + (
                [F.col(prefer_col)] if prefer_col else []
            )
            kept = S.semdedup_kept(
                df.select(*cols),
                vec_col, id_col,
                n_cells=n_cells, n_iters=n_iters,
                threshold=float(threshold),
                prefer_col=prefer_col,
            ).select(id_col)
            return df.join(kept, id_col, "left_semi")

        if method == "kmeans":
            self._stages.append(
                (f"dedup_embedding[kmeans]@{threshold}", _GLOBAL,
                 g_kmeans)
            )
            return self

        def g(df: DataFrame) -> DataFrame:
            from pystore_spark.functions import similarity as S

            d = dim
            if d is None:
                first = df.select(vec_col).first()
                if first is None:
                    return df
                d = len(first[0])
            cand = S.signlsh_candidate_pairs(
                df, vec_col, id_col, dim=d,
                n_planes=n_planes, band_bits=band_bits,
            )
            slim = df.select(F.col(id_col), F.col(vec_col))
            verified = (
                cand.join(
                    slim.selectExpr(
                        f"{id_col} AS id_i", f"{vec_col} AS _vi"
                    ),
                    "id_i",
                )
                .join(
                    slim.selectExpr(
                        f"{id_col} AS id_j", f"{vec_col} AS _vj"
                    ),
                    "id_j",
                )
                .filter(
                    S.cosine(F.col("_vi"), F.col("_vj"))
                    >= F.lit(float(threshold))
                )
                .select(F.col("id_j").alias(id_col))
                .distinct()
            )
            return df.join(verified, id_col, "left_anti")

        self._stages.append(
            (f"dedup_embedding@{threshold}", _GLOBAL, g)
        )
        return self

    def decontaminate(
        self,
        eval_df: DataFrame,
        eval_text_col: str = "text",
        shingle_n: int = 3,
        min_shared: int = 3,
    ):
        """Remove documents sharing ≥ ``min_shared`` word
        ``shingle_n``-grams with the (broadcast) evaluation set —
        benchmark-contamination removal."""
        id_col, txt = self.id_col, self.text_col
        bench = (
            eval_df.select(
                F.explode(
                    X.shingles(eval_text_col, shingle_n)
                ).alias("_g")
            )
            .distinct()
        )

        def g(df: DataFrame) -> DataFrame:
            hits = (
                df.select(
                    F.col(id_col).alias("_did"),
                    F.explode(X.shingles(txt, shingle_n)).alias("_g"),
                )
                .join(F.broadcast(bench), "_g")
                .groupBy("_did")
                .agg(F.count(F.lit(1)).alias("_n"))
                .filter(F.col("_n") >= min_shared)
                .select(F.col("_did").alias(id_col))
            )
            return df.join(hits, id_col, "left_anti")

        self._stages.append(
            (f"decontaminate>={min_shared}", _GLOBAL, g)
        )
        return self

    def decontaminate_spans(
        self,
        eval_df: DataFrame,
        eval_text_col: str = "text",
        shingle_n: int = 3,
    ):
        """SPAN-level decontamination (functions.text
        .decontaminate_spans): instead of dropping a contaminated
        document, REMOVE exactly the token spans matching a benchmark
        ``shingle_n``-gram and keep the clean remainder — cardinality
        unchanged, the text column rewritten in place. The gentler
        sibling of :meth:`decontaminate` for corpora too valuable to
        drop whole documents from."""
        id_col, txt = self.id_col, self.text_col

        def g(df: DataFrame) -> DataFrame:
            out = X.decontaminate_spans(
                df,
                eval_df,
                text_col=txt,
                id_col=id_col,
                bench_text_col=eval_text_col,
                n=shingle_n,
            )
            return out.withColumn(
                txt, F.col("cleaned_text")
            ).drop(
                "cleaned_text", "n_spans_removed", "n_tokens_removed"
            )

        # GLOBAL, not TRANSFORM: the hit-merge window shuffles, and
        # funnel() must not re-run it per count
        self._stages.append(
            (f"decontaminate_spans(n={shingle_n})", _GLOBAL, g)
        )
        return self

    def dedup_substrings(self, k: int = 20):
        """WITHIN-corpus exact substring dedup (functions.text
        .dedup_substrings, Lee et al. semantics): every ``k``-token
        window also present in a lower-id doc is cut from the
        higher-id one — first owner keeps its copy, cardinality
        unchanged, the text column rewritten in place."""
        id_col, txt = self.id_col, self.text_col

        def g(df: DataFrame) -> DataFrame:
            out = X.dedup_substrings(
                df, text_col=txt, id_col=id_col, k=k
            )
            return out.withColumn(
                txt, F.col("cleaned_text")
            ).drop(
                "cleaned_text", "n_spans_removed", "n_tokens_removed"
            )

        self._stages.append(
            (f"dedup_substrings(k={k})", _GLOBAL, g)
        )
        return self

    def dedup_repeats(self, k: int = 10):
        """WITHIN-document repetition trimming (functions.text
        .dedup_repeats): repeated ``k``-token spans collapse to their
        first in-doc occurrence — the cleaning counterpart of the
        Gopher repetition flags. Cardinality unchanged."""
        id_col, txt = self.id_col, self.text_col

        def g(df: DataFrame) -> DataFrame:
            out = X.dedup_repeats(
                df, text_col=txt, id_col=id_col, k=k
            )
            return out.withColumn(
                txt, F.col("cleaned_text")
            ).drop(
                "cleaned_text", "n_spans_removed", "n_tokens_removed"
            )

        self._stages.append((f"dedup_repeats(k={k})", _GLOBAL, g))
        return self

    # ------------------------------------------------------------------
    # execution
    # ------------------------------------------------------------------
    def dataframe(self) -> DataFrame:
        """The composed lazy plan: input → every stage, in order."""
        return self.apply(self._input)

    def apply(self, df: DataFrame) -> DataFrame:
        """Apply the pipeline's stages to an arbitrary DataFrame —
        including a STREAMING one: row-local filters and transforms
        are stateless projections, so the same pipeline object that
        curates a batch corpus drops into
        ``readStream → pipeline.apply → writeStream`` unchanged.
        Global stages (dedup, decontamination) need corpus-wide state
        and raise on a streaming input — run them in the periodic
        batch compaction pass instead (the standard lambda-curation
        split)."""
        streaming = getattr(df, "isStreaming", False)
        for name, kind, payload in self._stages:
            if kind == _LOCAL:
                df = df.filter(payload())
            elif kind == _TRANSFORM:
                df = payload(df)
            else:
                if streaming:
                    # stages whose batch plan needs corpus-wide state
                    # but whose PREDICATE is row-local (the BPE budget
                    # gate) carry a streaming fallback Column — same
                    # kept set, per-row UDF instead of the vocab join
                    fb = getattr(payload, "streaming_fallback", None)
                    if fb is not None:
                        df = df.filter(fb())
                        continue
                    raise ValueError(
                        f"stage {name!r} is corpus-global and cannot "
                        "run on a streaming DataFrame; apply it in a "
                        "batch pass"
                    )
                df = payload(df)
        return df

    def report(self) -> dict:
        """:meth:`funnel` as a plain dict ``{stage: n_surviving}``
        (insertion-ordered), plus ``survival_rate`` — the notebook/
        logging-friendly form."""
        rows = self.funnel().collect()
        out = {r["stage"]: int(r["n_surviving"]) for r in rows}
        first = next(iter(out.values()), 0)
        last = list(out.values())[-1] if out else 0
        return {
            "stages": out,
            "survival_rate": round(last / first, 6) if first else None,
        }

    def _execute(
        self, df: DataFrame, checkpoint: bool = False
    ) -> tuple[list[tuple[str, int]], DataFrame]:
        """Shared accounting walk: apply every stage in order,
        counting survivors with one conditional-count aggregation per
        contiguous row-local block + one count per shuffling stage.

        ``checkpoint=True`` additionally materializes each shuffling
        stage's output (eager localCheckpoint) before counting it, so
        the RETURNED frame reads materialized partitions instead of
        re-running the stage — the ingest path appends that frame and
        must not pay dedup/decontaminate twice. Every _GLOBAL stage
        shuffles by definition; a _TRANSFORM is checkpointed only when
        its output plan actually introduces an Exchange (dedup_lines
        does, scrub_pii is a free projection that folds into the next
        stage — snapshotting it would cost a full batch write for
        nothing). Batch-sized inputs only under checkpointing: the
        snapshots live on executor storage."""
        rows: list[tuple[str, int]] = []
        i = 0
        stages = self._stages
        first = True
        while i <= len(stages):
            # collect the next contiguous block of local/transform
            block: list[tuple[str, Column]] = []
            while i < len(stages) and stages[i][1] != _GLOBAL:
                name, kind, payload = stages[i]
                if kind == _TRANSFORM:
                    # transforms change values, not cardinality; they
                    # must apply before later predicates evaluate, so
                    # flush any pending block first
                    if block:
                        break
                    df = payload(df)
                    if checkpoint and _plan_shuffles(df):
                        df = df.localCheckpoint(eager=True)
                else:
                    block.append((name, payload()))
                i += 1
            if block or first:
                aggs = [F.count(F.lit(1)).alias("_n0")]
                cum = None
                for j, (_name, pred) in enumerate(block):
                    cum = pred if cum is None else cum & pred
                    aggs.append(F.count_if(cum).alias(f"_n{j + 1}"))
                res = df.agg(*aggs).collect()[0]
                if first:
                    rows.append(("input", int(res[0])))
                    first = False
                for j, (name, _pred) in enumerate(block):
                    rows.append((name, int(res[j + 1])))
                # materialize the block's filters into the plan
                for _name, pred in block:
                    df = df.filter(pred)
            if i < len(stages) and stages[i][1] == _GLOBAL:
                name, _kind, payload = stages[i]
                df = payload(df)
                if checkpoint:
                    df = df.localCheckpoint(eager=True)
                rows.append((name, df.count()))
                i += 1
            elif i >= len(stages):
                break
        return rows, df

    def funnel(self, df: DataFrame | None = None) -> DataFrame:
        """Survivor counts after every cardinality-changing stage,
        as a small DataFrame ``(stage, n_surviving)`` (first row:
        ``input``). Cost: one conditional-count aggregation per
        contiguous row-local block + one count per global stage —
        NOT one pass per filter.

        Pass ``df`` to account an ARBITRARY batch through the same
        stages instead of the pipeline's own input frame."""
        if df is None:
            df = self._input
        spark = df.sparkSession
        rows, _ = self._execute(df)
        return spark.createDataFrame(rows, "stage string, n_surviving long")

    def run(
        self, df: DataFrame | None = None
    ) -> tuple[list[tuple[str, int]], DataFrame]:
        """Execute AND account in one pass: returns ``(funnel_rows,
        curated_frame)`` where every shuffling stage ran exactly once
        (outputs checkpointed — see :meth:`_execute`). This is what
        :meth:`~pystore_spark.collection.Collection.ingest` calls;
        prefer :meth:`dataframe` when no accounting is needed (fully
        lazy, no checkpoints)."""
        return self._execute(
            self._input if df is None else df, checkpoint=True
        )
