"""Step dataflows mirroring the reference's CLI dispatch
(``Main.scala:13-31``): each step is a pure function
``dict[str, DataFrame] -> dict[str, DataFrame]`` wired between
``engine.io.read_from`` and ``engine.io.write_to``.
"""

from __future__ import annotations

from typing import Callable, Mapping

from pyspark.sql import DataFrame, SparkSession

from platform_etl_backend_spark.steps.reactome import reactome_step
from platform_etl_backend_spark.steps.go import go_step
from platform_etl_backend_spark.steps.otar import otar_step
from platform_etl_backend_spark.steps.search_ebi import search_ebi_step
from platform_etl_backend_spark.steps.expression import expression_step
from platform_etl_backend_spark.steps.interaction import interaction_step
from platform_etl_backend_spark.steps.openfda import openfda_step
from platform_etl_backend_spark.steps.search_facet import search_facet_step
from platform_etl_backend_spark.steps.literature import literature_step
from platform_etl_backend_spark.steps.search import search_step

from platform_etl_backend_spark.steps.target import target_step
from platform_etl_backend_spark.steps.embedding import embedding_step

STEPS: dict[str, Callable[..., Mapping[str, DataFrame]]] = {
    "embedding": embedding_step,
    "search": search_step,
    "target": target_step,
    "reactome": reactome_step,
    "go": go_step,
    "otar": otar_step,
    "search_ebi": search_ebi_step,
    "expression": expression_step,
    "interaction": interaction_step,
    "openfda": openfda_step,
    "search_facet": search_facet_step,
    "literature": literature_step,
}


def run_step(spark: SparkSession, name: str, inputs: Mapping[str, DataFrame], **params):
    """Dispatch like Main.scala:15-29; unknown step names raise."""
    if name not in STEPS:
        raise ValueError(f"unknown step '{name}'; known: {sorted(STEPS)}")
    return STEPS[name](spark, inputs, **params)
