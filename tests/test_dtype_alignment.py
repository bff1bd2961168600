"""Arrow-level dtype alignment between Spark results and DuckDB oracles.

The correctness driver records a schema check; the value-hash may
tolerate int-width differences but the schema comparison might not, so
every oracle-backed query must agree on column types up to the
engine-equivalent mapping below.
"""

from __future__ import annotations

import pytest

from nyc_taxi_bigdata_pipeline_spark.benchqueries import REGISTRY

DUCK_TO_SPARK = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP_NS": "timestamp",  # both ultimately event-time, µs-compared
    "FLOAT": "float",
}


@pytest.fixture(scope="module")
def duck(sf_dir):
    from .oracle_harness import duck_connection

    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", [n for n, q in REGISTRY.items() if q.oracle is not None]
)
def test_dtypes_align(name, spark, sf_dir, duck):
    q = REGISTRY[name]
    sd = dict(q.spark_fn(spark, sf_dir).dtypes)
    rel = duck.sql(q.oracle)
    od = dict(zip(rel.columns, [str(t) for t in rel.types]))
    assert set(sd) == set(od), f"column sets differ: {sorted(sd)} vs {sorted(od)}"
    diffs = []
    for c, st in sd.items():
        ot = od[c]
        want = DUCK_TO_SPARK.get(ot, ot.lower())
        if want != st.replace("timestamp_ntz", "timestamp"):
            diffs.append(f"{c}: spark={st} duck={ot}")
    assert not diffs, f"dtype drift: {diffs}"
