"""Embedding similarity search: brute-force cosine top-k and an
IVF-style partitioned variant.

Dot products/norms are sequential left folds over the vector
(``F.aggregate`` over ``zip_with``) in double precision — bit-exact
reproducible in the DuckDB oracle (``list_reduce`` folds in the same
order), so scores hash-match without tolerance hacks.

Scale path: the query set is broadcast (it's small by construction);
candidates stream through a single projection — no shuffle at all for
brute force. The IVF variant prunes candidates to the query's cell
(here: the ``label`` column as coarse quantizer), turning full scans
into partition-pruned scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm2(a) * norm2(b))


def brute_force_topk(
    candidates: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    query_id_col: str | None = None,
) -> DataFrame:
    """Top-k cosine neighbors per query vector (excluding self).

    ``queries`` is broadcast; ranking uses a window per query id with
    a deterministic (score desc, id) order.
    """
    qid = query_id_col or f"q_{id_col}"
    q = queries.select(
        F.col(id_col).alias(qid), F.col(vec_col).alias("_qvec")
    )
    scored = candidates.join(F.broadcast(q), F.col(id_col) != F.col(qid)).select(
        F.col(qid),
        F.col(id_col),
        F.round(cosine(F.col("_qvec"), F.col(vec_col)), 6).alias("score"),
    )
    w = Window.partitionBy(qid).orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def ivf_topk(
    candidates: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    cell_col: str,
    k: int = 5,
    query_id_col: str | None = None,
) -> DataFrame:
    """IVF-style search: candidates restricted to the query's coarse
    cell (``cell_col``) before scoring — the scan is pruned by the
    cell predicate instead of scoring the full corpus."""
    qid = query_id_col or f"q_{id_col}"
    q = queries.select(
        F.col(id_col).alias(qid),
        F.col(vec_col).alias("_qvec"),
        F.col(cell_col).alias("_qcell"),
    )
    scored = candidates.join(
        F.broadcast(q),
        (F.col(cell_col) == F.col("_qcell")) & (F.col(id_col) != F.col(qid)),
    ).select(
        F.col(qid),
        F.col(id_col),
        F.round(cosine(F.col("_qvec"), F.col(vec_col)), 6).alias("score"),
    )
    w = Window.partitionBy(qid).orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def cosine_dedup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    block_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding near-duplicate pairs above a cosine threshold,
    blocked by ``block_col`` (quadratic only within blocks)."""
    slim = df.select(F.col(id_col), F.col(block_col), F.col(vec_col))
    a, b = slim.alias("a"), slim.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_i"),
            F.col(f"b.{id_col}").alias("id_j"),
            F.round(
                cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6
            ).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
