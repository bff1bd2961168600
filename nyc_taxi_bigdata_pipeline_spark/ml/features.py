"""ML feature engineering (ex05 parity, ``features.py:7-76``).

trips_clean → feature table: trip duration, pickup time components,
quality filters, anti-leakage column drop. All built-in Column
expressions — no UDFs (§2.11: the reference has zero Spark UDFs too).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..schema import ML_LEAKAGE_COLUMNS, ML_REQUIRED_TRAIN

PICKUP = "tpep_pickup_datetime"
DROPOFF = "tpep_dropoff_datetime"


def add_features(df: DataFrame) -> DataFrame:
    """Derived features (features.py:21-34): duration in minutes via
    unix_timestamp diff, hour/dayofweek/month of pickup."""
    dur = (F.unix_timestamp(DROPOFF) - F.unix_timestamp(PICKUP)) / 60.0
    return (
        df.withColumn("trip_duration_min", dur)
        .withColumn("pickup_hour", F.hour(PICKUP))
        .withColumn("pickup_dayofweek", F.dayofweek(PICKUP))
        .withColumn("pickup_month", F.month(PICKUP))
    )


def quality_filter_ml(df: DataFrame) -> DataFrame:
    """P6 (features.py:37-47): not-null timestamps, 0 < duration < 24h,
    non-negative distance/amount."""
    return df.filter(
        F.col(PICKUP).isNotNull()
        & F.col(DROPOFF).isNotNull()
        & (F.col("trip_duration_min") > 0)
        & (F.col("trip_duration_min") < 24 * 60)
        & (F.col("trip_distance") >= 0)
        & (F.col("total_amount") >= 0)
    )


def drop_feature_nulls(df: DataFrame) -> DataFrame:
    """P7 (features.py:50-64): dropna over the 13 ML columns."""
    present = [c for c in ML_REQUIRED_TRAIN if c in df.columns]
    return df.dropna(subset=present)


def drop_leakage(df: DataFrame) -> DataFrame:
    """P8 (features.py:67-76): drop monetary components of the label."""
    return df.drop(*[c for c in ML_LEAKAGE_COLUMNS if c in df.columns])


def build_feature_table(trips_clean: DataFrame) -> DataFrame:
    """Full ex05 feature chain: derive → filter → dropna → anti-leakage."""
    return drop_leakage(drop_feature_nulls(quality_filter_ml(add_features(trips_clean))))
