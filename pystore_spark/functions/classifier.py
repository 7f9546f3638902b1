"""Model-based quality classification (the fastText-filter stage).

Published pretraining pipelines gate documents with a small supervised
quality classifier — GPT-3's LR-over-features filter against a
WebText-positive class, LLaMA/CCNet's fastText linear model,
FineWeb-Edu's regression head. The pattern is always the same: cheap
per-document features, a LINEAR model, a sigmoid score, a threshold.

This module keeps the two halves separate so each runs where it
belongs at 100 TB:

* **Scoring** (`quality_features` / `classifier_score`) is a pure
  Column projection: the features are lexical signals Catalyst
  evaluates JVM-side, and the weights are plan LITERALS — scoring the
  full corpus is a single scan with no shuffle, no Python, no
  broadcast, nothing to fit in memory. This is the hot path and it is
  UDF-free by construction.
* **Training** (`train_quality_classifier`) fits those weights with
  ``pyspark.ml`` LogisticRegression on a LABELED SAMPLE (training
  data for the filter is always tiny next to the corpus). The learned
  weights feed straight back into the Column-expression scorer, so
  the trained model deploys without MLlib on the scoring path.

The reference engine (pystore) has no model surface at all; this is a
beyond-reference capability of the training-data family (SURVEY
§2.13), sharing the determinism discipline of functions/text.py:
contributions round before the sigmoid so Spark and the DuckDB oracle
agree bit-for-bit after the final 6-decimal round.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pystore_spark.functions.text import (
    STOPWORDS,
    avg_token_length,
    token_count,
    tokens,
    unique_token_count,
)

#: Feature order is part of the model contract — weights are stored
#: and applied by name, but the assembler and the oracle SQL both
#: enumerate in this order.
QUALITY_FEATURES: tuple[str, ...] = (
    "len_score",        # min(n_tokens / 100, 1) — enough text to judge
    "diversity",        # unique / total tokens — boilerplate collapses
    "mean_word_len",    # min(avg token len / 10, 1) — garbage skews
    "stopword_ratio",   # function-word density — fluent English prose
    "alpha_ratio",      # tokens containing a letter — markup/number soup
)

#: Hand-set default weights in the spirit of the published filters
#: (positive on fluency signals, the intercept placing an "average"
#: web document near the 0.5 decision point). `quality_classifier_scores`
#: ships these; `train_quality_classifier` learns a replacement.
DEFAULT_WEIGHTS: dict[str, float] = {
    "len_score": 1.5,
    "diversity": 1.0,
    "mean_word_len": 2.0,
    "stopword_ratio": 4.0,
    "alpha_ratio": 2.0,
}
DEFAULT_INTERCEPT: float = -4.0


def quality_features(col: str | Column) -> dict[str, Column]:
    """The five scoring features as Column expressions, all bounded to
    [0, 1] so a linear model over them is well-conditioned and the
    learned weights are comparable across features."""
    c = F.col(col) if isinstance(col, str) else col
    t = tokens(c)
    n = token_count(c).cast("double")
    nz = n > 0
    awl = F.coalesce(avg_token_length(c), F.lit(0.0))
    return {
        "len_score": F.least(n / F.lit(100.0), F.lit(1.0)),
        "diversity": F.when(
            nz, unique_token_count(c).cast("double") / n
        ).otherwise(F.lit(0.0)),
        "mean_word_len": F.least(awl / F.lit(10.0), F.lit(1.0)),
        "stopword_ratio": F.when(
            nz,
            F.size(
                F.filter(t, lambda x: F.lower(x).isin(*STOPWORDS["en"]))
            ).cast("double")
            / n,
        ).otherwise(F.lit(0.0)),
        "alpha_ratio": F.when(
            nz,
            F.size(F.filter(t, lambda x: x.rlike("[A-Za-z]"))).cast(
                "double"
            )
            / n,
        ).otherwise(F.lit(0.0)),
    }


def classifier_score(
    col: str | Column,
    weights: dict[str, float] | None = None,
    intercept: float | None = None,
) -> Column:
    """Sigmoid(w · features + b), rounded to 6 decimals.

    The logit rounds to 12 decimals BEFORE the sigmoid — the usual
    engine-portability discipline (functions/text.py): the dot product
    is a literal-weighted sum whose float evaluation order is fixed by
    the expression tree, and the pre-sigmoid round absorbs any last-ulp
    divergence between the JVM's and the oracle's ``exp``.
    """
    w = DEFAULT_WEIGHTS if weights is None else weights
    b = DEFAULT_INTERCEPT if intercept is None else intercept
    feats = quality_features(col)
    z: Column = F.lit(float(b))
    for name in QUALITY_FEATURES:
        z = z + F.lit(float(w[name])) * feats[name]
    z = F.round(z, 12)
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


def classifier_score_sql(
    weights: dict[str, float] | None = None,
    intercept: float | None = None,
    toks_expr: str = (
        "list_filter(string_split_regex(text, '\\s+'), t -> t != '')"
    ),
) -> str:
    """DuckDB scalar expression mirroring :func:`classifier_score` —
    generated from the SAME weights dict so the oracle can never drift
    from the shipped model. Expects a relation exposing ``text``."""
    w = DEFAULT_WEIGHTS if weights is None else weights
    b = DEFAULT_INTERCEPT if intercept is None else intercept
    stop = ",".join(f"'{s}'" for s in STOPWORDS["en"])
    feats = {
        "len_score": "LEAST(n / 100.0, 1.0)",
        "diversity": "(CASE WHEN n > 0 THEN uniq / n ELSE 0.0 END)",
        "mean_word_len": "LEAST(awl / 10.0, 1.0)",
        "stopword_ratio": (
            "(CASE WHEN n > 0 THEN nstop / n ELSE 0.0 END)"
        ),
        "alpha_ratio": "(CASE WHEN n > 0 THEN nalpha / n ELSE 0.0 END)",
    }
    z = " + ".join(
        [repr(float(b))]
        + [f"{float(w[k])!r} * {feats[k]}" for k in QUALITY_FEATURES]
    )
    return f"""
    WITH t AS (SELECT doc_id, {toks_expr} AS toks FROM documents),
    s AS (
      SELECT doc_id,
        len(toks)::DOUBLE AS n,
        len(list_distinct(toks))::DOUBLE AS uniq,
        CASE WHEN len(toks) > 0 THEN
          list_reduce(list_transform(toks, x -> len(x)::DOUBLE),
                      (a,b) -> a+b) / len(toks)
        ELSE 0.0 END AS awl,
        len(list_filter(toks, x -> lower(x) IN ({stop})))::DOUBLE
          AS nstop,
        len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
          AS nalpha
      FROM t)
    SELECT doc_id,
      ROUND(1.0 / (1.0 + exp(-ROUND({z}, 12))), 6) AS quality_prob
    FROM s
    """


def train_quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    reg_param: float = 0.01,
    max_iter: int = 100,
) -> tuple[dict[str, float], float]:
    """Fit the linear quality model on a labeled frame and return
    ``(weights, intercept)`` ready for :func:`classifier_score`.

    Uses ``pyspark.ml`` LogisticRegression (JVM L-BFGS — the driver
    holds only the 5-float coefficient vector; the feature matrix
    stays distributed). ``standardization=False`` keeps the learned
    weights in raw feature units so they transfer verbatim into the
    Column-expression scorer."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = quality_features(text_col)
    assembled = VectorAssembler(
        inputCols=list(QUALITY_FEATURES), outputCol="features"
    ).transform(
        df.select(
            F.col(label_col).cast("double").alias("label"),
            *[feats[name].alias(name) for name in QUALITY_FEATURES],
        )
    )
    model = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,
    ).fit(assembled)
    coef = model.coefficients.toArray()
    weights = {
        name: float(coef[i]) for i, name in enumerate(QUALITY_FEATURES)
    }
    return weights, float(model.intercept)
