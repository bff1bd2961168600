"""GBT fare-prediction pipeline (ex05 parity, ``trainer.py:78-152``).

M1-M8: 6× StringIndexer → 6× OneHotEncoder → VectorAssembler →
GBTRegressor(maxDepth=6, maxIter=50, seed=42), evaluated with
RMSE/MAE/R². The encoder stack sits behind ``build_pipeline`` so a
hash/target encoder can replace OHE at 100-TB cardinalities
(SURVEY §7.4).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler
from pyspark.ml.regression import GBTRegressor
from pyspark.sql import DataFrame

from ..schema import ML_CATEGORICAL, ML_LABEL, ML_NUMERIC

SEED = 42
GBT_MAX_DEPTH = 6
GBT_MAX_ITER = 50


def build_pipeline(
    categorical: tuple[str, ...] = ML_CATEGORICAL,
    numeric: tuple[str, ...] = ML_NUMERIC,
    label: str = ML_LABEL,
    max_depth: int = GBT_MAX_DEPTH,
    max_iter: int = GBT_MAX_ITER,
) -> Pipeline:
    indexers = [
        StringIndexer(inputCol=c, outputCol=f"{c}_idx", handleInvalid="keep")
        for c in categorical
    ]
    encoders = [
        OneHotEncoder(inputCol=f"{c}_idx", outputCol=f"{c}_ohe") for c in categorical
    ]
    assembler = VectorAssembler(
        inputCols=[f"{c}_ohe" for c in categorical] + list(numeric),
        outputCol="features",
        handleInvalid="keep",
    )
    gbt = GBTRegressor(
        featuresCol="features",
        labelCol=label,
        maxDepth=max_depth,
        maxIter=max_iter,
        seed=SEED,
    )
    return Pipeline(stages=[*indexers, *encoders, assembler, gbt])


@dataclass
class TrainResult:
    model: PipelineModel
    metrics: dict[str, float]
    train_rows: int
    test_rows: int
    train_seconds: float


def evaluate(model: PipelineModel, test_df: DataFrame, label: str = ML_LABEL) -> dict[str, float]:
    """M8: rmse/mae/r2 evaluator passes (trainer.py:128-152)."""
    preds = model.transform(test_df).cache()
    try:
        out = {}
        for metric in ("rmse", "mae", "r2"):
            ev = RegressionEvaluator(
                labelCol=label, predictionCol="prediction", metricName=metric
            )
            out[metric] = ev.evaluate(preds)
        return out
    finally:
        preds.unpersist()


def train_and_evaluate(
    train_df: DataFrame,
    test_df: DataFrame,
    pipeline: Pipeline | None = None,
) -> TrainResult:
    """M5+M9: cache both splits, fit, evaluate (trainer.py:109,186-212)."""
    pipeline = pipeline or build_pipeline()
    train_df = train_df.cache()
    test_df = test_df.cache()
    try:
        train_rows = train_df.count()
        test_rows = test_df.count()
        t0 = time.perf_counter()
        model = pipeline.fit(train_df)
        train_seconds = time.perf_counter() - t0
        metrics = evaluate(model, test_df)
        return TrainResult(model, metrics, train_rows, test_rows, train_seconds)
    finally:
        train_df.unpersist()
        test_df.unpersist()
