"""Query registry plumbing shared by all benchquery modules."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: SparkQuery
    oracle: str | None  # DuckDB SQL over pre-registered views; None → rows-only check
    doc: str = ""       # SURVEY §2 operator ids this query covers
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = "", bench: bool = False):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name, fn, oracle, doc, bench)
        return fn

    return deco


def sx(fragment: str) -> Column:
    """'EXPR AS alias' shared-SQL fragment → aliased Spark Column."""
    expr, alias = fragment.rsplit(" AS ", 1)
    return F.expr(expr).alias(alias.strip())
