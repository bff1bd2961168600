"""Deterministic synthetic NYC-taxi fixtures per FIXTURES.md.

Generates trips_raw months with the documented dirty-row quota
(out-of-month pickups, NULL criticals, negative values, inverted /
over-long durations) so every ingest/ML filter is exercised, plus a
265-row zone lookup and a type-drift variant. Seed=42 throughout.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, SparkSession

from nyc_taxi_bigdata_pipeline_spark.schema import TRIPS_RAW_SCHEMA, ZONE_LOOKUP_SCHEMA

BOROUGHS = ["Manhattan", "Queens", "Brooklyn", "Bronx", "Staten Island", "EWR", "Unknown"]


def make_zone_lookup(spark: SparkSession) -> DataFrame:
    rows = []
    for i in range(1, 266):
        borough = BOROUGHS[i % len(BOROUGHS)]
        zone = None if i >= 264 else f"Zone {i:03d}"
        svc = "N/A" if i >= 264 else ("Airports" if i in (1, 132, 138) else "Boro Zone")
        rows.append((i, borough, zone, svc))
    return spark.createDataFrame(rows, ZONE_LOOKUP_SCHEMA)


def make_trips_month(
    spark: SparkSession, year: int, month: int, n: int = 2000, seed: int = 42
) -> DataFrame:
    """~n rows in (year, month) with ~6% dirty rows (clean ≥ 90% so the
    80%/90% retention gates pass — FIXTURES.md §1)."""
    rng = random.Random((seed, year, month).__hash__())
    start = dt.datetime(year, month, 1)
    nxt = dt.datetime(year + (month == 12), month % 12 + 1, 1)
    span = int((nxt - start).total_seconds())
    rows = []
    for i in range(n):
        pickup = start + dt.timedelta(seconds=rng.randrange(span))
        dirty = rng.random()
        if dirty < 0.01:  # out-of-month spill
            pickup = nxt + dt.timedelta(hours=rng.randrange(72))
        duration_min = rng.uniform(1, 90)
        if dirty >= 0.01 and dirty < 0.02:  # negative duration
            duration_min = -duration_min
        if 0.02 <= dirty < 0.025:  # >24h duration
            duration_min = 25 * 60
        dropoff = pickup + dt.timedelta(minutes=duration_min)
        dist = round(rng.lognormvariate(0.7, 0.8), 2)
        fare = round(3.0 + 2.5 * dist + 0.4 * duration_min, 2)
        tip = round(fare * rng.uniform(0.15, 0.25), 2) if rng.random() < 0.7 else 0.0
        total = round(fare + tip + 1.0 + 0.5, 2)
        passenger = rng.randint(1, 6)
        pu = rng.choice([161, 236, 237, 132, 138] + list(range(1, 266)))
        do = rng.randint(1, 265)
        row = {
            "VendorID": rng.choice([1, 1, 2, 2, 6, 7]),
            "tpep_pickup_datetime": pickup,
            "tpep_dropoff_datetime": dropoff,
            "passenger_count": passenger,
            "trip_distance": dist,
            "RatecodeID": rng.choice([1, 1, 1, 2, 3, 4, 5, 6, 99]),
            "store_and_fwd_flag": rng.choice(["Y", "N", "N", "N"]),
            "PULocationID": pu,
            "DOLocationID": do,
            "payment_type": rng.choice([1, 1, 1, 2, 2, 3, 4, 0]),
            "fare_amount": fare,
            "extra": rng.choice([0.0, 0.5, 1.0, 2.5]),
            "mta_tax": 0.5,
            "tip_amount": tip,
            "tolls_amount": rng.choice([0.0, 0.0, 0.0, 6.55]),
            "improvement_surcharge": 1.0,
            "total_amount": total,
            "congestion_surcharge": rng.choice([0.0, 2.5]),
            "airport_fee": rng.choice([0.0, 1.25, 1.75]),
        }
        if 0.025 <= dirty < 0.035:  # NULL criticals
            row[rng.choice(["tpep_pickup_datetime", "tpep_dropoff_datetime",
                            "PULocationID", "DOLocationID"])] = None
        if 0.035 <= dirty < 0.045:  # negative amounts/distance/passengers
            row[rng.choice(["trip_distance", "total_amount"])] = -abs(
                row["trip_distance"] if rng.random() < 0.5 else row["total_amount"]
            )
        if 0.045 <= dirty < 0.06:  # nullable-col nulls (~2.5% quota-ish)
            row[rng.choice(["passenger_count", "RatecodeID", "store_and_fwd_flag",
                            "congestion_surcharge", "airport_fee"])] = None
        rows.append(tuple(row[f.name] for f in TRIPS_RAW_SCHEMA.fields))
    return spark.createDataFrame(rows, TRIPS_RAW_SCHEMA)


def make_trips_month_drifted(spark: SparkSession, year: int, month: int, n: int = 500) -> DataFrame:
    """Type-drift variant (FIXTURES.md §1): airport_fee as int,
    passenger_count as double — exercises normalize_types."""
    base = make_trips_month(spark, year, month, n)
    return base.selectExpr(
        *[
            c if c not in ("airport_fee", "passenger_count")
            else (
                "CAST(FLOOR(airport_fee) AS INT) AS airport_fee"
                if c == "airport_fee"
                else "CAST(passenger_count AS DOUBLE) AS passenger_count"
            )
            for c in base.columns
        ]
    )
