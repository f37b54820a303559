"""Query catalog: every operator from SURVEY.md §2 (plus the LLM-pipeline
operators) exposed as a named query over the driver's TPC-H-ish tables,
each paired with an ANSI-SQL oracle that DuckDB can run.

Registry contract (consumed by ``__spark_entry__.py``):
- ``QUERIES[name].fn(spark, sf_dir) -> DataFrame``
- ``QUERIES[name].oracle`` — equivalent SQL, or None for non-SQL-expressible
  operators (the driver then records a weaker rows-only check).

Determinism conventions (both sides MUST follow them or value-hashes drift):
- money/measure sums go through ``decimal(18,2)``/``decimal(18,6)`` so
  distributed summation order cannot change results; final numeric columns
  are cast to DOUBLE (exact decimal→double, identical bits in both engines);
- outputs of transcendental functions (ln, log1p, …) are rounded to 6 d.p.;
- every array output is deterministically sorted;
- no raw TIMESTAMP outputs (cast to DATE or string);
- every ranking has a unique tiebreak key.
"""

from __future__ import annotations

from platform_etl_backend_spark.catalog.registry import QUERIES, QuerySpec, register

# Import for side effects: each module registers its queries.
from platform_etl_backend_spark.catalog import relational  # noqa: E402,F401
from platform_etl_backend_spark.catalog import events  # noqa: E402,F401
from platform_etl_backend_spark.catalog import graphs  # noqa: E402,F401
from platform_etl_backend_spark.catalog import olap  # noqa: E402,F401
from platform_etl_backend_spark.catalog import multimodal  # noqa: E402,F401
from platform_etl_backend_spark.catalog import text  # noqa: E402,F401
from platform_etl_backend_spark.catalog import vectors  # noqa: E402,F401

__all__ = ["QUERIES", "QuerySpec", "register"]
