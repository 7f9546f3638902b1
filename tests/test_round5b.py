"""Round-5 continuation surface: line-level dedup, training shards,
mixture planning, and the trainable quality classifier.

Reference parity note: none of these exist in the reference engine
(pystore is a storage layer); they extend the training-data-pipeline
family of SURVEY §2.13, with registry oracles in queries_ext.py
(line_dedup_stats / shard_manifest / mixture_plan /
quality_classifier_scores) covering the exact math.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pystore_spark.functions import sampling as SA
from pystore_spark.functions import text as X
from pystore_spark.functions.classifier import (
    DEFAULT_WEIGHTS,
    QUALITY_FEATURES,
    classifier_score,
    quality_features,
    train_quality_classifier,
)
from pystore_spark.pipeline import CurationPipeline


# ---------------------------------------------------------------------------
# dedup_lines
# ---------------------------------------------------------------------------
def test_dedup_lines_owner_keeps_others_lose(spark):
    shared = "this exact boilerplate footer appears everywhere"
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    f"unique one\n{shared}\ntail one",
                    f"{shared}\nunique two",
                    "all original\nno shared lines",
                ],
            }
        )
    )
    out = (
        X.dedup_lines(df, "doc_id", "text")
        .orderBy("doc_id")
        .toPandas()
    )
    # owner (lowest doc_id = 1) keeps the shared line, doc 2 loses it
    assert out.loc[0, "text"] == f"unique one\n{shared}\ntail one"
    assert out.loc[1, "text"] == "unique two"
    assert out.loc[2, "text"] == "all original\nno shared lines"


def test_dedup_lines_preserves_blank_lines_and_order(spark):
    shared = "duplicated middle"
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [10, 20],
                "text": [
                    f"a\n\n{shared}\n\nz",
                    f"first\n{shared}\nlast",
                ],
            }
        )
    )
    out = (
        X.dedup_lines(df, "doc_id", "text")
        .orderBy("doc_id")
        .toPandas()
    )
    # blanks survive removal untouched; owner doc intact
    assert out.loc[0, "text"] == f"a\n\n{shared}\n\nz"
    assert out.loc[1, "text"] == "first\nlast"


def test_dedup_lines_min_docs_threshold(spark):
    shared = "needs three docs to be hot"
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2], "text": [shared, shared]}
        )
    )
    out = (
        X.dedup_lines(df, "doc_id", "text", min_docs=3)
        .orderBy("doc_id")
        .toPandas()
    )
    assert out["text"].tolist() == [shared, shared]


def test_dedup_lines_pipeline_stage_keeps_cardinality(spark):
    shared = "shared line body text"
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [f"own\n{shared}", f"{shared}\nother"],
            }
        )
    )
    p = CurationPipeline(df).dedup_lines()
    fun = p.funnel().toPandas()
    # a transform stage: no funnel drop row, cardinality unchanged
    assert fun["stage"].tolist() == ["input"]
    assert fun["n_surviving"].tolist() == [2]
    out = p.dataframe().orderBy("doc_id").toPandas()
    assert len(out) == 2
    assert out.loc[1, "text"] == "other"


# ---------------------------------------------------------------------------
# assign_shards
# ---------------------------------------------------------------------------
def test_assign_shards_deterministic_across_layouts(spark):
    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    a = (
        SA.assign_shards(df, "doc_id", n_shards=8)
        .select("doc_id", "shard", "shard_pos")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        SA.assign_shards(df.repartition(13), "doc_id", n_shards=8)
        .select("doc_id", "shard", "shard_pos")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert a["shard"].between(0, 7).all()
    # roughly balanced: no empty shard at 500 keys over 8 shards
    assert a["shard"].nunique() == 8


def test_assign_shards_salt_reshuffles(spark):
    df = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    a = SA.assign_shards(df, "doc_id", 8).toPandas()
    b = SA.assign_shards(df, "doc_id", 8, salt="epoch2").toPandas()
    merged = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert (merged["shard_a"] != merged["shard_b"]).any()


def test_shard_export_is_order_stable(spark, tmp_path):
    """partitionBy('shard') export: within-shard shard_pos order is the
    same no matter the input partitioning — the byte-stable training
    shard claim."""
    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")

    def export(src, out):
        (
            SA.assign_shards(src, "doc_id", n_shards=4)
            .repartition(4, "shard")
            # key column tiebreaks 56-bit shard_pos collisions — the
            # documented byte-stable export recipe
            .sortWithinPartitions("shard", "shard_pos", "doc_id")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(str(out))
        )
        return (
            spark.read.parquet(str(out))
            .orderBy("shard", "shard_pos")
            .select("doc_id")
            .toPandas()["doc_id"]
            .tolist()
        )

    one = export(df, tmp_path / "a")
    two = export(df.repartition(17), tmp_path / "b")
    assert one == two


# ---------------------------------------------------------------------------
# mixture_plan
# ---------------------------------------------------------------------------
@pytest.fixture()
def sized_corpus(spark):
    rows = (
        [("big", 1000)] * 8 + [("mid", 500)] * 4 + [("small", 100)] * 2
    )
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "source": [s for s, _ in rows],
                "n_tokens": [n for _, n in rows],
            }
        )
    )


def test_mixture_plan_weights_sum_to_one(sized_corpus):
    out = SA.mixture_plan(
        sized_corpus, "source", "n_tokens", alpha=0.5
    ).toPandas()
    assert abs(out["raw_share"].sum() - 1.0) < 1e-5
    assert abs(out["mix_weight"].sum() - 1.0) < 1e-5


def test_mixture_plan_temperature_upweights_small(sized_corpus):
    out = (
        SA.mixture_plan(sized_corpus, "source", "n_tokens", alpha=0.5)
        .toPandas()
        .set_index("source")
    )
    # alpha < 1 compresses the spread: small gains share, big loses
    assert (
        out.loc["small", "mix_weight"] > out.loc["small", "raw_share"]
    )
    assert out.loc["big", "mix_weight"] < out.loc["big", "raw_share"]
    # epochs_needed: weight × budget ÷ own tokens; small source must
    # repeat (> 1 epoch) to fill its boosted share
    assert out.loc["small", "epochs_needed"] > 1.0


def test_mixture_plan_alpha_one_is_raw_share(sized_corpus):
    out = SA.mixture_plan(
        sized_corpus, "source", "n_tokens", alpha=1.0
    ).toPandas()
    assert (
        (out["mix_weight"] - out["raw_share"]).abs() < 1e-5
    ).all()


# ---------------------------------------------------------------------------
# quality classifier
# ---------------------------------------------------------------------------
def _labeled_corpus(spark, n=120):
    good = (
        "the quick brown fox jumps over the lazy dog and it runs on "
        "for a while with many varied common words in the sentence"
    )
    bad = "zzz 111 !!! @@@ ### $$$ %%% ^^^ &&& *** ((( )))"
    rows = []
    for i in range(n):
        if i % 2 == 0:
            rows.append((i, f"{good} variant {i}", 1))
        else:
            rows.append((i, f"{bad} {i}", 0))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "label"])
    )


def test_default_classifier_separates(spark):
    df = _labeled_corpus(spark)
    scored = df.select(
        "label", classifier_score("text").alias("p")
    ).toPandas()
    good_p = scored[scored["label"] == 1]["p"]
    bad_p = scored[scored["label"] == 0]["p"]
    assert good_p.min() > bad_p.max()


def test_features_are_bounded(spark):
    df = _labeled_corpus(spark)
    feats = quality_features("text")
    stats = df.select(
        *[feats[k].alias(k) for k in QUALITY_FEATURES]
    ).toPandas()
    assert (stats.min() >= 0.0).all() and (stats.max() <= 1.0).all()


def test_train_quality_classifier_learns_and_transfers(spark):
    df = _labeled_corpus(spark)
    weights, intercept = train_quality_classifier(df)
    assert set(weights) == set(QUALITY_FEATURES)
    # the learned weights drop into the Column-expression scorer and
    # classify the training frame correctly (clean separation task)
    scored = df.select(
        "label",
        (
            classifier_score("text", weights, intercept) >= 0.5
        ).alias("pred"),
    ).toPandas()
    acc = (scored["pred"].astype(int) == scored["label"]).mean()
    assert acc >= 0.95


def test_trained_scorer_matches_mllib_probability(spark):
    """The Column-expression scorer must agree with MLlib's own
    predictProbability for the learned model (same features, same
    weights) — the deploy-without-MLlib claim."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    df = _labeled_corpus(spark)
    weights, intercept = train_quality_classifier(df)
    feats = quality_features("text")
    assembled = VectorAssembler(
        inputCols=list(QUALITY_FEATURES), outputCol="features"
    ).transform(
        df.select(
            "doc_id",
            F.col("label").cast("double").alias("label"),
            *[feats[k].alias(k) for k in QUALITY_FEATURES],
        )
    )
    model = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=0.01,
        maxIter=100,
        standardization=False,
    ).fit(assembled)
    mllib = (
        model.transform(assembled)
        .select(
            "doc_id",
            F.element_at(
                vector_to_array(F.col("probability")), 2
            ).alias("p_ml"),
        )
        .toPandas()
    )
    ours = df.select(
        "doc_id", classifier_score("text", weights, intercept).alias("p")
    ).toPandas()
    merged = mllib.merge(ours, on="doc_id")
    assert (merged["p_ml"] - merged["p"]).abs().max() < 1e-4


def test_filter_classifier_pipeline_stage(spark):
    df = _labeled_corpus(spark, n=40)
    p = CurationPipeline(df).filter_classifier(min_prob=0.5)
    fun = p.funnel().toPandas().set_index("stage")
    assert fun.loc["input", "n_surviving"] == 40
    assert fun.loc["classifier>=0.5", "n_surviving"] == 20
    out = p.dataframe().toPandas()
    assert set(out["label"]) == {1}


def test_default_weights_cover_all_features():
    assert set(DEFAULT_WEIGHTS) == set(QUALITY_FEATURES)


def test_weighted_decimal_product_keeps_scale_12(spark):
    """Regression: lm_perplexity's cnt x contrib fold. A decimal(20,0)
    cnt overflows Spark's 38-digit budget (20+20+1=41) and the product
    silently truncates to scale 9; decimal(17,0) is the widest cast
    that keeps the full scale-12 contribution exact (17+20+1=38), and
    a huge cnt must NOT overflow to NULL there."""
    from decimal import Decimal

    df = spark.createDataFrame([(3, 10**8)], "cnt long, big long")
    contrib = F.lit(0.123456789012).cast("decimal(20,12)")
    row = df.select(
        (F.col("cnt").cast("decimal(17,0)") * contrib).alias("p"),
        (F.col("big").cast("decimal(17,0)") * contrib).alias("pb"),
        (F.col("cnt").cast("decimal(20,0)") * contrib).alias("bad"),
    ).collect()[0]
    assert row["p"] == Decimal("0.370370367036")
    assert row["pb"] == Decimal("12345678.901200000000")  # no NULL cliff
    assert row["bad"] != row["p"]  # the overflow this test guards against


def test_classifier_sql_oracle_handles_empty_docs():
    """Regression: the generated DuckDB oracle must not raise on
    zero-token documents (list_reduce on an empty list errors) and
    must agree with the Spark path's sigmoid(intercept)."""
    import duckdb

    from pystore_spark.functions.classifier import classifier_score_sql

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, ''), (2, '   '), (3, 'the quick fox')) t(doc_id, text)"
    )
    out = con.execute(classifier_score_sql()).fetchdf()
    assert len(out) == 3
    # sigmoid(DEFAULT_INTERCEPT) for token-less docs
    import math

    from pystore_spark.functions.classifier import DEFAULT_INTERCEPT

    expect = round(1.0 / (1.0 + math.exp(-DEFAULT_INTERCEPT)), 6)
    got = out.set_index("doc_id")["quality_prob"]
    assert got[1] == expect and got[2] == expect


def test_encoding_flags_detects_and_matches_oracle(spark):
    """Crafted mojibake/replacement/control rows: the Spark counts hit
    the expected values AND the generated DuckDB oracle agrees row for
    row (sf testdata is clean, so parity there never exercises a
    match; this does)."""
    import duckdb

    rows = [
        (1, "caf\u00c3\u00a9 normal"),            # 2-byte mojibake
        (2, "it\u00e2\u0080\u0099s here"),       # 3-byte mojibake
        (3, "nbsp\u00c2\u00a0gap"),               # nbsp mojibake
        (4, "bad\ufffddecode"),                    # replacement char
        (5, "ctl\u0007bell"),                      # C0 control
        (6, "clean text with tabs\tand\nnewlines"),
        (7, "r\u00e9sum\u00e9 na\u00efve"),      # real accents: clean
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    flags = X.encoding_flags("text")
    got = (
        df.select(
            "doc_id",
            flags["n_mojibake"].cast("bigint").alias("n_mojibake"),
            flags["n_replacement"].cast("bigint").alias("n_replacement"),
            flags["n_control"].cast("bigint").alias("n_control"),
            flags["encoding_clean"].alias("encoding_clean"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_mojibake"].tolist() == [1, 1, 1, 0, 0, 0, 0]
    assert got["n_replacement"].tolist() == [0, 0, 0, 1, 0, 0, 0]
    assert got["n_control"].tolist() == [0, 0, 0, 0, 1, 0, 0]
    assert got["encoding_clean"].tolist() == [
        False, False, False, False, False, True, True,
    ]

    from pystore_spark.queries import QUERIES

    con = duckdb.connect()
    con.register("documents", got[["doc_id"]].assign(
        text=[t for _, t in rows]
    ))
    oracle = (
        con.execute(QUERIES["encoding_quality_flags"].oracle_sql)
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert oracle["n_mojibake"].tolist() == got["n_mojibake"].tolist()
    assert oracle["n_replacement"].tolist() == got["n_replacement"].tolist()
    assert oracle["n_control"].tolist() == got["n_control"].tolist()
    assert (
        oracle["encoding_clean"].tolist() == got["encoding_clean"].tolist()
    )


# ---------------------------------------------------------------------------
# dedup_lines properties (hypothesis): idempotence, line conservation,
# owner invariance — over random corpora drawn from a small line
# alphabet so sharing is dense
# ---------------------------------------------------------------------------
from hypothesis import HealthCheck, given as h_given, settings as h_settings
from hypothesis import strategies as st

_LINE_ALPHABET = [
    "alpha line one", "beta line two", "gamma three", "delta four",
    "epsilon five", "", "  ",
]


@st.composite
def _corpus(draw):
    n_docs = draw(st.integers(2, 5))
    return [
        "\n".join(
            draw(
                st.lists(
                    st.sampled_from(_LINE_ALPHABET), min_size=0,
                    max_size=6,
                )
            )
        )
        for _ in range(n_docs)
    ]


@h_settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@h_given(_corpus())
def test_dedup_lines_properties(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = {
        r["doc_id"]: r["text"]
        for r in X.dedup_lines(df, "doc_id", "text").collect()
    }
    # idempotence: a second pass changes nothing
    again = {
        r["doc_id"]: r["text"]
        for r in X.dedup_lines(
            spark.createDataFrame(
                list(once.items()), "doc_id long, text string"
            ),
            "doc_id",
            "text",
        ).collect()
    }
    assert again == once
    # conservation: every distinct non-blank line survives somewhere
    def lines(texts_iter):
        out = set()
        for t in texts_iter:
            out.update(
                x.strip() for x in t.split("\n") if x.strip() != ""
            )
        return out

    assert lines(once.values()) == lines(texts)
    # owner invariance: doc 0 (global min id) owns every line it has
    assert once[0] == texts[0]
