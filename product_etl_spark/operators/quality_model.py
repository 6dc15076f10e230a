"""Model-based document quality scoring (pyspark.ml).

The heuristic filters (``functions/text.quality_score``, the Gopher
flags) are fixed rules; modern curation pipelines (CCNet, FineWeb,
Dolma) additionally train a lightweight CLASSIFIER on labeled
good/bad examples and filter by predicted probability. This module is
that stage, built on Spark MLlib's distributed LogisticRegression —
featurization is the same pure-Catalyst text functions the heuristic
filters use (no UDFs), training is MLlib's distributed L-BFGS, and
scoring is a map-only model transform.

Scale shape: the labeled training set is small (humans or an LLM
labeled it); the expensive parts — featurizing 100 TB of documents
and scoring them — are embarrassingly parallel column expressions
plus a per-row model apply. The fitted model is kilobytes of
coefficients broadcast by MLlib; ``save_model``/``load_model``
persist it so score-only runs skip training entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from product_etl_spark.functions import text as T

FEATURE_COLS = [
    "f_n_words",
    "f_mean_word_len",
    "f_stopword_ratio",
    "f_punct_ratio",
    "f_line_rep_ratio",
]


#: columns the MLlib pipeline itself adds during transform
_MODEL_COLS = {"_raw_features", "features", "rawPrediction", "probability",
               "prediction"}


def _check_column_conflicts(df: DataFrame) -> None:
    clash = set(df.columns) & (_MODEL_COLS | set(FEATURE_COLS))
    if clash:
        raise ValueError(
            f"quality_model: input columns {sorted(clash)} collide with "
            "the featurization/model output columns — rename them before "
            "scoring (silently overwriting them would corrupt passthrough "
            "data)"
        )


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Append the classifier's feature columns — all pure Catalyst
    expressions (one codegen'd projection, no UDF, no shuffle)."""
    _check_column_conflicts(df)
    return (
        df.withColumn("f_n_words", T.token_count(text_col).cast("double"))
        .withColumn("f_mean_word_len", T.mean_word_length(text_col))
        .withColumn("f_stopword_ratio", T.stopword_ratio(text_col))
        .withColumn("f_punct_ratio", T.punct_ratio(text_col))
        .withColumn("f_line_rep_ratio", T.line_repetition_ratio(text_col))
        .fillna(0.0, subset=FEATURE_COLS)
    )


def train_quality_classifier(
    labeled: DataFrame, text_col: str, label_col: str, max_iter: int = 50
):
    """Fit a logistic-regression quality model on labeled documents
    (label 1 = keep-quality, 0 = reject). Returns the fitted
    PipelineModel (assembler + scaler + LR), round-tripped through a
    save/load so it carries NO training lineage: a freshly-fit
    LogisticRegressionModel keeps its training summary, whose
    DataFrame pins the training plan and session state in any task
    closure that serializes the model — measured live as
    ``NotSerializableException: ObservationManager`` on transform
    once any ``df.observe`` had run in the session (the observe
    quality gate), and at scale it silently keeps the training
    frame's whole lineage reachable. The loaded model is coefficients
    only (kilobytes), which is what scoring needs."""
    import shutil
    import tempfile

    from pyspark.ml import Pipeline, PipelineModel
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    feats = quality_features(labeled, text_col)
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=FEATURE_COLS, outputCol="_raw_features"),
            StandardScaler(inputCol="_raw_features", outputCol="features",
                           withMean=True, withStd=True),
            LogisticRegression(featuresCol="features", labelCol=label_col,
                               maxIter=max_iter),
        ]
    )
    fitted = pipe.fit(feats)
    tmp = tempfile.mkdtemp(prefix="quality_model_")
    try:
        fitted.write().overwrite().save(tmp)
        return PipelineModel.load(tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def score_quality(model, df: DataFrame, text_col: str) -> DataFrame:
    """Append ``quality_prob`` (P(label=1)) and ``quality_pred`` to
    ``df``. Map-only: featurize + broadcast-coefficient transform."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(quality_features(df, text_col))
    prob_1 = F.element_at(vector_to_array(F.col("probability")), 2)
    keep = [c for c in df.columns]
    return scored.select(
        *keep,
        F.round(prob_1, 6).alias("quality_prob"),
        F.col("prediction").cast("int").alias("quality_pred"),
    )


def filter_by_quality(
    model, df: DataFrame, text_col: str, min_prob: float = 0.5
) -> DataFrame:
    """Keep documents the model scores at/above ``min_prob``."""
    scored = score_quality(model, df, text_col)
    return scored.filter(F.col("quality_prob") >= min_prob).drop(
        "quality_prob", "quality_pred"
    )


def save_model(model, path: str) -> None:
    model.write().overwrite().save(path)


def load_model(spark, path: str):
    from pyspark.ml import PipelineModel

    return PipelineModel.load(path)


def tandem_loops(
    df: DataFrame,
    text_col: str,
    id_col: str,
    period: int = 2,
) -> DataFrame:
    """Degenerate-repetition (tandem-loop) detector: the classic
    generation-failure mode where a fixed ``period``-token pattern
    repeats back-to-back ("the cat the cat the cat ...") — a
    WITHIN-document consecutive-repeat signal that the existing
    repetition family doesn't isolate (line_repetition_ratio wants
    duplicate LINES, dup_ngram_fraction counts non-consecutive
    re-occurrences anywhere in the doc).

    A position p >= period "continues a loop" when token[p] ==
    token[p - period] (case-folded). Maximal runs of continuing
    positions of length L cover a repeated region of L + period
    tokens (>= 2 full periods iff L >= period). Surface per doc:
    ``n_tokens``, ``max_loop_span`` (longest such region in tokens;
    0 when the doc has no run of >= 2 full periods) and ``n_loops``
    (count of maximal regions with >= 2 full periods) — integers,
    engine-exact.

    Scale shape: one posexplode + one per-doc lag window + one
    gaps-and-islands (both doc-bounded partitions) + one groupBy per
    doc; nothing cross-document, nothing corpus^2."""
    if period < 1:
        raise ValueError(f"tandem_loops: need period >= 1, got {period}")
    tok = df.select(
        F.col(id_col),
        F.posexplode(T.tokens(F.lower(F.col(text_col)))).alias("pos", "_tk"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    flagged = tok.withColumn(
        "_cont",
        (F.col("_tk") == F.lag("_tk", period).over(w)).cast("int"),
    ).withColumn(
        # island id: positions where the continue-flag turns on start
        # a new run; non-continuing rows get island NULL via _cont=0
        "_brk",
        F.when(
            (F.col("_cont") == 1)
            & (F.coalesce(F.lag("_cont", 1).over(w), F.lit(0)) == 0),
            1,
        ).otherwise(0),
    ).withColumn("_isl", F.sum("_brk").over(w))
    runs = (
        flagged.filter(F.col("_cont") == 1)
        .groupBy(id_col, "_isl")
        .agg(F.count(F.lit(1)).alias("_len"))
        .filter(F.col("_len") >= F.lit(period))  # >= 2 full periods
        .groupBy(id_col)
        .agg(
            F.max(F.col("_len") + F.lit(period)).alias("max_loop_span"),
            F.count(F.lit(1)).alias("n_loops"),
        )
    )
    sizes = df.select(
        F.col(id_col), T.token_count(F.col(text_col)).alias("n_tokens")
    )
    return (
        sizes.join(runs, id_col, "left")
        .select(
            id_col,
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.coalesce(F.col("max_loop_span"), F.lit(0))
            .cast("bigint")
            .alias("max_loop_span"),
            F.coalesce(F.col("n_loops"), F.lit(0))
            .cast("bigint")
            .alias("n_loops"),
        )
        .orderBy(id_col)
    )
