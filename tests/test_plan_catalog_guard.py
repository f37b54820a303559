"""Catalog-wide physical-plan guard: NO query may plan a CartesianProduct.

PLAN_AUDIT.md documents plan shapes per round; this test makes the
invariant self-enforcing — a new or edited query that accidentally loses
its join keys (the classic silent 100TB killer) fails CI instead of
shipping. Plans are built, not executed, so the sweep stays cheap.
"""

from __future__ import annotations

from platform_etl_backend_spark.catalog import QUERIES
from platform_etl_backend_spark.plans import explain_str


def test_no_catalog_query_plans_a_cartesian_product(spark, sf_dir):
    offenders = {}
    for name, spec in QUERIES.items():
        try:
            plan = explain_str(spec.fn(spark, sf_dir), "simple")
        except Exception as e:  # planning itself must not fail either
            offenders[name] = f"plan error: {type(e).__name__}: {e}"
            continue
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
    assert not offenders, offenders
