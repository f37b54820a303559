"""Catalog registry + shared conventions helpers."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # ANSI SQL for DuckDB; None => rows-only check
    description: str = ""
    tags: tuple[str, ...] = ()


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], description: str = "",
             tags: tuple[str, ...] = ()):
    """Decorator: add a query function to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name}")
        QUERIES[name] = QuerySpec(name, fn, oracle, description, tags)
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dec2(c: Column | str) -> Column:
    """Exact-money cast: distributed sum order can't change a decimal sum."""
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("decimal(18,2)")


def dec6(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("decimal(18,6)")


def dbl(c: Column) -> Column:
    return c.cast("double")
