"""Round-5 session-3 operators: Mann-Whitney U, two-sample KS, AMS F2
sketch, recursive CTE — each pinned against a plain-Python model."""

from __future__ import annotations

import hashlib
import math

import pytest

from platform_etl_backend_spark.catalog import QUERIES
from tests.conftest import load


def _cohort_values(spark, sf_dir):
    from platform_etl_backend_spark.catalog.events import events_table

    rows = events_table(spark, sf_dir).select(
        "event_type", "value", "user_id"
    ).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(
            (float(r.value), r.user_id % 2 == 0)
        )
    return by_type


def test_mann_whitney_matches_python(spark, sf_dir):
    by_type = _cohort_values(spark, sf_dir)
    got = {
        r.event_type: (r.n_a, r.n_b, r.u2_a, r.z)
        for r in QUERIES["q_mann_whitney"].fn(spark, sf_dir).collect()
    }
    for t, pairs in by_type.items():
        vals = sorted(pairs)
        n = len(vals)
        n_a = sum(1 for _, a in vals if a)
        n_b = n - n_a
        # midranks with ties: 2*rank is an exact integer
        two_ra = 0
        tie = 0
        i = 0
        while i < n:
            j = i
            while j < n and vals[j][0] == vals[i][0]:
                j += 1
            cnt = j - i
            two_rank = 2 * i + cnt + 1  # 2 * average rank (1-based)
            two_ra += two_rank * sum(1 for k in range(i, j) if vals[k][1])
            tie += cnt ** 3 - cnt
            i = j
        u2_a = two_ra - n_a * (n_a + 1)
        var = (n_a * n_b / 12.0) * ((n + 1) - tie / (n * (n - 1)))
        z = (u2_a - n_a * n_b) / (2.0 * math.sqrt(var))
        assert got[t][:3] == (n_a, n_b, u2_a), t
        assert abs(got[t][3] - z) < 1e-6, t


def test_ks_test_matches_python(spark, sf_dir):
    by_type = _cohort_values(spark, sf_dir)
    got = {
        r.event_type: (r.n_a, r.n_b, r.d_num, r.d_stat)
        for r in QUERIES["q_ks_test"].fn(spark, sf_dir).collect()
    }
    for t, pairs in by_type.items():
        vals = sorted(pairs)
        n_a = sum(1 for _, a in vals if a)
        n_b = len(vals) - n_a
        d_num = 0
        ca = cb = 0
        i = 0
        while i < len(vals):
            j = i
            while j < len(vals) and vals[j][0] == vals[i][0]:
                j += 1
            ca += sum(1 for k in range(i, j) if vals[k][1])
            cb += sum(1 for k in range(i, j) if not vals[k][1])
            d_num = max(d_num, abs(ca * n_b - cb * n_a))
            i = j
        assert got[t][:3] == (n_a, n_b, d_num), t
        assert got[t][3] == d_num / (n_a * n_b), t


def test_ams_sketch_matches_python(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select("l_partkey").collect()
    counts: dict[int, int] = {}
    for r in li:
        counts[r.l_partkey] = counts.get(r.l_partkey, 0) + 1

    def hv(k: int) -> int:
        return int(hashlib.md5(f"ams:{k}".encode()).hexdigest()[:12], 16)

    xs = [
        sum((1 - 2 * ((hv(k) >> i) % 2)) * c for k, c in counts.items())
        for i in range(16)
    ]
    gsums = sorted(
        (sum(x * x for x in xs[j * 4:(j + 1) * 4]), j) for j in range(4)
    )
    f2_est_x4 = gsums[2][0]  # upper median of the 4 group sums
    f2_exact = sum(c * c for c in counts.values())
    row = QUERIES["q_ams_sketch"].fn(spark, sf_dir).collect()[0]
    assert (row.f2_est_x4, row.f2_exact, row.n_keys) == (
        f2_est_x4, f2_exact, len(counts)
    )
    assert row.ratio == f2_est_x4 / (4.0 * f2_exact)
    # the median-of-means tug-of-war estimate is a real estimate, not noise
    assert 0.2 < row.ratio < 5.0


def test_recursive_cte_matches_python_walk(spark, sf_dir):
    sup = load(spark, sf_dir, "supplier").select("s_suppkey").collect()
    want: dict[int, tuple[int, int]] = {}
    for r in sup:
        node, depth = r.s_suppkey, 0
        while True:
            n, s = want.get(depth, (0, 0))
            want[depth] = (n + 1, s + r.s_suppkey)
            if node <= 1:
                break
            node //= 2
            depth += 1
    got = {
        r.depth: (r.n_nodes, r.sum_supp)
        for r in QUERIES["q_recursive_cte"].fn(spark, sf_dir).collect()
    }
    assert got == want
    # depth 0 holds every supplier exactly once
    assert got[0][0] == len(sup)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
