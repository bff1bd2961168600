"""Prediction error analysis (ex05 parity, ``error_analysis.py``).

Residual columns, summary stats + approx percentiles, under/over split
as a single-pass conditional agg (improving on the reference's two
``filter().count()`` jobs — P12), price-bucket error table, top-N worst
predictions with rule-based cause tagging expressed as a ``when()``
chain so it runs distributed (the reference does it driver-side over 10
collected rows, ``error_analysis.py:101-159``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..schema import ML_LABEL

AIRPORT_ZONES = (132, 138, 1)  # JFK, LGA, EWR (error_analysis.py:117)


def with_residuals(preds: DataFrame, label: str = ML_LABEL) -> DataFrame:
    e = F.col("prediction") - F.col(label)
    return preds.withColumn("error", e).withColumn("abs_error", F.abs(e))


def error_summary(preds_with_residuals: DataFrame) -> DataFrame:
    """A11+A12+P12 in ONE aggregation pass."""
    return preds_with_residuals.agg(
        F.count("error").alias("n"),
        F.mean("error").alias("mean_error"),
        F.stddev("error").alias("std_error"),
        F.min("error").alias("min_error"),
        F.max("error").alias("max_error"),
        F.percentile_approx("error", [0.25, 0.5, 0.75, 0.95, 0.99]).alias("percentiles"),
        F.sum(F.when(F.col("error") < 0, 1).otherwise(0)).alias("n_under"),
        F.sum(F.when(F.col("error") > 0, 1).otherwise(0)).alias("n_over"),
    )


def bucket_errors(preds_with_residuals: DataFrame, label: str = ML_LABEL) -> DataFrame:
    """A13 price-bucket error table (error_analysis.py:229-243):
    RMSE = sqrt(mean(error²)) per bucket."""
    bucket = (
        F.when(F.col(label) < 10, "low")
        .when(F.col(label) < 30, "medium")
        .when(F.col(label) < 60, "high")
        .otherwise("very_high")
    )
    return (
        preds_with_residuals.withColumn("price_bucket", bucket)
        .groupBy("price_bucket")
        .agg(
            F.count("*").alias("n"),
            F.mean("abs_error").alias("mae"),
            F.sqrt(F.mean(F.pow(F.col("error"), 2))).alias("rmse"),
            F.percentile_approx("abs_error", 0.5).alias("median_abs_error"),
        )
    )


def likely_cause(label_col: str = ML_LABEL) -> F.Column:
    """Rule-based cause tags (error_analysis.py:101-159) as a when-chain
    — usable at full scale, not just on collected rows."""
    return (
        F.when(
            F.col("PULocationID").isin(*AIRPORT_ZONES)
            | F.col("DOLocationID").isin(*AIRPORT_ZONES),
            "airport_trip",
        )
        .when((F.col("payment_type") == 2) & (F.col(label_col) > 50), "cash_high_fare")
        .when(F.col("pickup_hour").between(0, 5), "night_hours")
        .when(F.col("trip_distance") > 20, "long_distance")
        .otherwise("other")
    )


def top_errors(preds_with_residuals: DataFrame, n: int = 10) -> DataFrame:
    """O3 top-N worst predictions, cause-tagged, deterministic order."""
    cols = preds_with_residuals.columns
    tagged = (
        preds_with_residuals.withColumn("likely_cause", likely_cause())
        if all(c in cols for c in ("PULocationID", "DOLocationID", "payment_type",
                                   "pickup_hour", "trip_distance"))
        else preds_with_residuals.withColumn("likely_cause", F.lit("other"))
    )
    order = [F.desc("abs_error")] + (
        [F.asc("tpep_pickup_datetime")] if "tpep_pickup_datetime" in cols else []
    )
    return tagged.orderBy(*order).limit(n)
