"""Bounded edit-distance similarity join (training-data ext): all
customer-name pairs within Levenshtein distance 1, found by the
PassJoin-style segment-blocked self-join (`operators/editdist`) and
oracle-pinned against a DuckDB brute-force scan.

The oracle IS the quadratic form (length band + exact levenshtein over
the c_custkey < c_custkey cross) — hash equality proves the segment
blocking lossless end-to-end on a corpus that is deliberately
adversarial for it: every ``Customer#`` name shares a constant 9-char
prefix, so the prefix segment matches everything and candidates
degenerate toward the length band (see the saturation note in the
operator docstring; `scripts/bench_r6_editdist.py` measures the
selective-corpus regime where blocking pays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.editdist import levenshtein_self_join
from ..sources.tables import load_table
from .registry import register

_K = 1

_LEV_ORACLE = f"""
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE abs(length(a.c_name) - length(b.c_name)) <= {_K}
  AND levenshtein(a.c_name, b.c_name) <= {_K}
ORDER BY id_a, id_b"""


@register(
    "fuzzy_join_levenshtein",
    _LEV_ORACLE,
    doc="training-data ext: bounded edit-distance self-join (PassJoin "
        "segment blocking + JVM levenshtein verify); oracle = brute-force "
        "all-pairs, so the hash gate proves the blocking lossless",
)
def fuzzy_join_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return levenshtein_self_join(cust, "c_custkey", "c_name", k=_K).orderBy(
        "id_a", "id_b"
    )
