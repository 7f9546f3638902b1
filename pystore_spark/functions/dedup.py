"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard — the LLM-training-data staples, expressed relationally so
they distribute (no driver materialization, no Python UDFs).

Hash design: every hash is built from ``md5`` (bit-identical across
engines). MinHash uses the *lexicographic minimum of seeded md5
hex strings* — min-hashing only needs a uniform hash with a total
order, and hex strings give one that an ANSI-SQL oracle can
reproduce exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pystore_spark.functions.text import (
    fingerprint,
    shingles,
    widen_parallelism,
)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def exact_dedup(
    df: DataFrame, key_cols: list[str], id_col: str
) -> DataFrame:
    """Keep the minimum-id row per duplicate group — a hash groupBy
    (partial+final agg), not a window, so it map-side combines."""
    keep = df.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))
    return df.join(keep, on=key_cols + [id_col], how="left_semi")


def duplicate_groups(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Fingerprint → group stats (keep_id, n_copies).

    No ``widen_parallelism`` here: the md5 fingerprint is cheap and the
    groupBy's own shuffle redistributes — an up-front exchange cost
    35% on the round-2 bench without saving anything."""
    return (
        df
        .select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def minhash_signature(
    shingle_col: Column, num_hashes: int = 8
) -> Column:
    """Array of ``num_hashes`` int64 minhash values.

    One md5 per shingle; the hash family is Kirsch-Mitzenmacher double
    hashing ``h_i = h1 + i*h2`` with h1/h2 = two 14-hex-digit halves
    of the digest (< 2^56, so ``h1 + 7*h2`` can't overflow int64).
    ~8× less hashing than seeded-md5-per-hash, and numeric mins beat
    string mins. Bit-identical in the SQL oracle via
    ``CAST('0x'||substr(md5(s),...) AS BIGINT)``.
    """
    # h1 + i*h2 with h2 < 2^56 stays inside int64 only for i <= 127;
    # beyond that the arithmetic silently wraps and corrupts signatures
    if not 1 <= num_hashes <= 128:
        raise ValueError(
            f"num_hashes must be in [1, 128] (int64 headroom for "
            f"h1 + i*h2 double hashing), got {num_hashes}"
        )
    # nested transform so each shingle is digested ONCE: higher-order
    # lambdas evaluate interpreted (no codegen CSE), so putting two
    # F.md5(s) substrings in one lambda would hash every shingle twice
    halves = F.transform(
        F.transform(shingle_col, lambda s: F.md5(s)),
        lambda d: F.struct(
            F.conv(F.substring(d, 1, 14), 16, 10)
            .cast("bigint")
            .alias("h1"),
            F.conv(F.substring(d, 17, 14), 16, 10)
            .cast("bigint")
            .alias("h2"),
        ),
    )
    # single fold over the shingles: acc[i] = min(acc[i], h1 + i*h2).
    # (N seeded array_min passes would re-inline the md5 transform N
    # times after projection collapse — one aggregate keeps it to one
    # digest per shingle.)
    seeds = F.sequence(F.lit(0).cast("bigint"), F.lit(num_hashes - 1))
    max_long = F.lit(9223372036854775807).cast("bigint")
    return F.aggregate(
        halves,
        F.array_repeat(max_long, num_hashes),
        lambda acc, x: F.zip_with(
            acc, seeds, lambda a, i: F.least(a, x["h1"] + i * x["h2"])
        ),
    )


def lsh_band_keys(sig_col: Column, bands: int, rows: int) -> Column:
    """Band the signature: md5 of each contiguous ``rows``-slice
    (int64 minhashes rendered as strings for the digest)."""
    as_str = F.transform(sig_col, lambda x: x.cast("string"))
    return F.array(
        *[
            F.md5(F.concat_ws("|", F.slice(as_str, b * rows + 1, rows)))
            for b in range(bands)
        ]
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """id → signature array + concatenated signature string."""
    df = widen_parallelism(df)
    sig = minhash_signature(shingles(text_col, shingle_n), num_hashes)
    return df.select(
        F.col(id_col),
        sig.alias("sig"),
        F.concat_ws("|", F.transform(sig, lambda x: x.cast("string"))).alias(
            "sig_str"
        ),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Distinct candidate pairs (i < j) sharing ≥1 LSH band bucket.

    Plan shape: linear signature pass → explode bands → salted
    per-bucket self-join. The quadratic term is within-bucket; a hot
    bucket (one band key holding a large fraction of docs — template
    boilerplate at corpus scale) would serialize its whole pair
    enumeration onto one task. AQE skew-join splitting CANNOT fix
    that: a self-join's hot partition is skewed on BOTH sides, which
    Spark's OptimizeSkewedJoin skips (it only splits one side and
    duplicates the other; verified empirically on this build). So the
    split is explicit: each bucket member gets a deterministic salt
    group in [0, G) with G = ceil(bucket_n / max_bucket_size), and the
    join key becomes (band, key, g_left, g_right) — every unordered
    group pair is one task-sized unit, so per-task pair work is
    bounded by ~max_bucket_size² regardless of bucket skew. Uniform
    buckets have G = 1 and degenerate to the plain join; only hot
    buckets pay the ~G/2 row replication, which is negligible next to
    the quadratic pair output they generate anyway.
    """
    if bands < 1 or num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be a positive multiple of "
            f"bands ({bands})"
        )
    rows = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(lsh_band_keys(F.col("sig"), bands, rows)).alias(
            "band_idx", "band_key"
        ),
    )
    # materialize the narrow (id, band) frame once: a self-join would
    # otherwise recompute the md5-over-shingles signature pass — the
    # expensive stage — on BOTH sides. The checkpoint is tiny
    # (id + band key per band) next to what it saves; swap for a
    # reliable checkpoint if executor loss matters more than speed.
    banded = banded.localCheckpoint(eager=True)
    # size-gated probe (r12, the COSINE_SKEW_GATE discipline): below
    # LSH_SKEW_GATE_MIN_BYTES even a bucket holding every doc is a
    # bounded cheap self-join, so the max-count job costs more than
    # the skew it guards — take the plain join without probing.
    # Identical pair set either way (salted ≡ plain parity-pinned).
    from pystore_spark import config as _cfg
    from pystore_spark.partition import estimate_size_bytes

    # distrust_filters (ADVICE r12): see estimate_size_bytes — never
    # skip the skew probe on a post-filter/join estimate
    est = estimate_size_bytes(df, distrust_filters=True)
    small = est is not None and est < _cfg.LSH_SKEW_GATE_MIN_BYTES
    if not small:
        counts = banded.groupBy("band_idx", "band_key").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        # cheap gate (one agg job over the already-materialized
        # narrow frame): when no bucket exceeds the cap — the common
        # case — the plain self-join needs no salting and skips two
        # shuffles
        max_bn = (
            counts.agg(F.max("_bn").alias("m")).first()["m"] or 0
        )
    if small or max_bn <= max_bucket_size:
        a = banded.alias("a")
        b = banded.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_i"),
                F.col(f"b.{id_col}").alias("id_j"),
            )
            .distinct()
        )
    # one-sided join (tiny counts row per bucket vs member rows) — AQE
    # CAN skew-split this one, unlike the self-join
    salted = banded.join(counts, ["band_idx", "band_key"]).select(
        F.col(id_col),
        "band_idx",
        "band_key",
        F.greatest(
            F.ceil(F.col("_bn") / max_bucket_size).cast("int"), F.lit(1)
        ).alias("_g"),
        F.pmod(F.xxhash64(F.col(id_col)), F.greatest(
            F.ceil(F.col("_bn") / max_bucket_size).cast("int"), F.lit(1)
        )).cast("int").alias("_s"),
    )
    # row with salt s joins as LEFT in group-pairs (s, t) for t ≥ s and
    # as RIGHT in (t, s) for t ≤ s → every unordered member pair is
    # covered exactly once (the id ordering below kills mirror dups)
    left = salted.select(
        F.col(id_col), "band_idx", "band_key",
        F.col("_s").alias("_g1"),
        F.explode(F.sequence(F.col("_s"), F.col("_g") - 1)).alias("_g2"),
    )
    right = salted.select(
        F.col(id_col), "band_idx", "band_key",
        F.explode(F.sequence(F.lit(0), F.col("_s"))).alias("_g1"),
        F.col("_s").alias("_g2"),
    )
    a = left.alias("a")
    b = right.alias("b")
    # roles are fixed by salt (the lower-salt member is always the
    # "left" row), so the canonical id ordering must come AFTER the
    # join via least/greatest — an a.id < b.id join condition would
    # drop pairs whose lower-salt member has the higher id
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a._g1") == F.col("b._g1"))
            & (F.col("a._g2") == F.col("b._g2"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_i"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias(
                "id_j"
            ),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------
def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two (distinct-element) arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: list[str],
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Blocked all-pairs n-gram Jaccard: pairs only within the same
    block (e.g. source + length bucket), then exact verification.
    Blocking bounds the quadratic term; the join shuffles once on the
    block key."""
    df = widen_parallelism(df)
    sh = df.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        shingles(text_col, shingle_n).alias("sh"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_i"),
            F.col(f"b.{id_col}").alias("id_j"),
            F.round(jaccard(F.col("a.sh"), F.col("b.sh")), 6).alias("jac"),
        )
        .filter(F.col("jac") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash16(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """16-bit SimHash per document.

    Token hash = first 4 md5 hex digits → int (identical in the SQL
    oracle via CAST('0x…')). Per bit: sum(+1/-1) over token
    occurrences (explode → groupBy id, 16 conditional sums — one
    shuffle, map-side combined), then sign-bit assembly.
    """
    from pystore_spark.functions.text import tokens

    df = widen_parallelism(df)
    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("tok")
    ).withColumn(
        "h",
        F.conv(F.substring(F.md5(F.col("tok")), 1, 4), 16, 10).cast("int"),
    )
    bit_sums = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, 1)
                .otherwise(-1)
            ).alias(f"s{b}")
            for b in range(16)
        ]
    )
    sim = None
    for b in range(16):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else (sim + term)
    return bit_sums.select(F.col(id_col), sim.alias("simhash"))


def hamming16(a: Column, b: Column) -> Column:
    """Popcount of xor for 16-bit simhashes (bit_count is native)."""
    return F.bit_count(a.bitwiseXOR(b))


# ---------------------------------------------------------------------------
# end-to-end near-dedup pipeline
# ---------------------------------------------------------------------------
def connected_components(
    edges: DataFrame,
    ids: DataFrame,
    id_col: str,
    max_iterations: int = 10,
) -> DataFrame:
    """Min-label propagation over an undirected edge list
    ``(id_i, id_j)`` → ``(id, component)`` where component = min id
    reachable. Iterates alternating join+min-agg rounds until the
    label assignment stops changing (duplicate clusters have tiny
    diameter, so this converges in 2-3 rounds in practice).

    Driver only orchestrates the loop; each round is one shuffle.
    """
    sym = (
        edges.selectExpr(f"id_i AS {id_col}", "id_j AS nbr")
        .unionByName(edges.selectExpr(f"id_j AS {id_col}", "id_i AS nbr"))
    )
    labels = ids.select(F.col(id_col), F.col(id_col).alias("component"))
    for _ in range(max_iterations):
        nbr_min = (
            sym.join(labels, on=id_col)
            .groupBy("nbr")
            .agg(F.min("component").alias("nbr_component"))
            .withColumnRenamed("nbr", id_col)
        )
        # the old component is in hand while the new one is computed,
        # so the convergence flag rides the SAME pass (labels only
        # ever decrease, so changed ⇔ new < old) — the check below
        # then scans the checkpoint instead of re-joining old vs new
        # labels every round (r12 optimization: one shuffle per
        # iteration, not two)
        new_comp = F.least(
            F.col("component"),
            F.coalesce(F.col("nbr_component"), F.col("component")),
        )
        updated = (
            labels.join(nbr_min, on=id_col, how="left")
            .select(
                F.col(id_col),
                new_comp.alias("component"),
                (new_comp < F.col("component")).alias("_chg"),
            )
        )
        updated = updated.localCheckpoint(eager=True)  # cut lineage growth
        changed = updated.filter("_chg").limit(1).count()
        labels = updated.drop("_chg")
        if changed == 0:
            break
    return labels


def exact_dedup_survivors(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Stage 1 of :func:`near_dedup`: keep the minimum id per
    normalized-text fingerprint (hash groupBy + semi join)."""
    fp = df.select(F.col(id_col), fingerprint(text_col).alias("_fp"))
    exact_keep = fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return df.join(exact_keep.select(id_col), on=id_col, how="left_semi")


def near_dedup_verified_pairs(
    survivors: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Stages 2-3 of :func:`near_dedup`: MinHash-LSH candidate pairs
    then exact shingle-Jaccard verification — the (id_i, id_j) edges
    the pipeline will merge. Exposed separately so the pipeline's
    recall can be audited against blocked-exact truth
    (queries_ext.near_dedup_recall_audit)."""
    candidates = lsh_candidate_pairs(
        survivors, text_col, id_col, num_hashes, bands, shingle_n
    )
    sh = survivors.select(
        F.col(id_col), shingles(text_col, shingle_n).alias("_sh")
    )
    return (
        candidates.join(
            sh.selectExpr(f"{id_col} AS id_i", "_sh AS _sh_i"), on="id_i"
        )
        .join(sh.selectExpr(f"{id_col} AS id_j", "_sh AS _sh_j"), on="id_j")
        .filter(jaccard(F.col("_sh_i"), F.col("_sh_j")) >= threshold)
        .select("id_i", "id_j")
    )


def near_dedup_clusters(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Cluster ASSIGNMENTS instead of survivors: ``(id, cluster_id,
    cluster_size)`` for every exact-dedup survivor with at least one
    verified near-dup edge (``cluster_id`` = min reachable id — the
    same label :func:`near_dedup` keeps). The inspection surface for
    dedup decisions: sample a cluster, eyeball its members, tune the
    threshold — where :func:`near_dedup` only shows the aftermath.

    Same cost shape as the pipeline it mirrors: LSH-bounded candidate
    generation, verified-edge-only label propagation (touching the
    tiny edge-bearing fraction of the corpus), plus ONE extra
    component-keyed aggregation for the sizes."""
    survivors = exact_dedup_survivors(df, text_col, id_col)
    verified = near_dedup_verified_pairs(
        survivors, text_col, id_col, threshold, num_hashes, bands, shingle_n
    )
    edge_nodes = (
        verified.selectExpr(f"id_i AS {id_col}")
        .unionByName(verified.selectExpr(f"id_j AS {id_col}"))
        .distinct()
    )
    comps = connected_components(verified, edge_nodes, id_col)
    sizes = comps.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return comps.join(sizes, on="component").select(
        F.col(id_col),
        F.col("component").alias("cluster_id"),
        F.col("cluster_size"),
    )


def near_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """The canonical training-data near-dedup pipeline:

    1. exact dedup on normalized-text fingerprint (hash groupBy);
    2. MinHash-LSH candidate pairs among survivors;
    3. shingle-Jaccard verification at ``threshold``;
    4. connected components over verified pairs;
    5. keep the minimum id per duplicate cluster.

    Returns the deduplicated DataFrame (same schema as input). Every
    stage is joins/aggregations — no driver materialization; the only
    quadratic term lives inside LSH buckets.
    """
    survivors = exact_dedup_survivors(df, text_col, id_col)
    verified = near_dedup_verified_pairs(
        survivors, text_col, id_col, threshold, num_hashes, bands, shingle_n
    )
    # propagate labels only over nodes that have at least one verified
    # edge — the overwhelming majority of documents have none, so the
    # iterative rounds touch a tiny fraction of the corpus
    edge_nodes = (
        verified.selectExpr(f"id_i AS {id_col}")
        .unionByName(verified.selectExpr(f"id_j AS {id_col}"))
        .distinct()
    )
    components = connected_components(verified, edge_nodes, id_col)
    drop = components.filter(F.col("component") != F.col(id_col)).select(
        id_col
    )
    return survivors.join(drop, on=id_col, how="left_anti")
