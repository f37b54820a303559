"""Round-8 operator pins: approx-percentile accuracy envelope and the
classifier/allowlist hygiene companions."""

from __future__ import annotations


def test_approx_percentile_envelope_matches_python_rank_pick(spark, sf_dir):
    """Exact p50/p90 must equal the plain-python type-1 rank-pick per
    flag, and the GK estimates must sit inside the guaranteed rank band
    (the checked booleans the oracle pins to TRUE)."""
    from collections import defaultdict

    from platform_etl_backend_spark.catalog import QUERIES

    got = {
        r["l_returnflag"]: r
        for r in QUERIES["q_approx_percentile_envelope"].fn(spark, sf_dir).collect()
    }
    rows = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_quantity"
    ).collect()
    vals = defaultdict(list)
    for r in rows:
        vals[r["l_returnflag"]].append(int(r["l_quantity"]))
    assert set(got) == set(vals)
    for flag, v in vals.items():
        v.sort()
        n = len(v)
        p50 = v[-(-n // 2) - 1]          # ceil(n/2)-th smallest, 1-based
        p90 = v[-(-9 * n // 10) - 1]     # ceil(9n/10)-th
        g = got[flag]
        assert g["n"] == n
        assert g["p50_exact"] == p50, (flag, g["p50_exact"], p50)
        assert g["p90_exact"] == p90, (flag, g["p90_exact"], p90)
        # the GK guarantee the oracle pins as literal TRUE
        assert g["p50_within"] is True and g["p90_within"] is True
