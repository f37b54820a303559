"""Round-6 operators: Kendall tau-b, Jaro-Winkler, isotonic regression
(PAVA), Kleinberg burst detection — pinned against plain-Python models."""

from __future__ import annotations

import math

from platform_etl_backend_spark.catalog import QUERIES


def _events(spark, sf_dir):
    from platform_etl_backend_spark.catalog.events import events_table

    return events_table(spark, sf_dir).select(
        "event_type", "value", "user_id", "ep"
    ).collect()


def _daily_xy(rows):
    """(count, micro-sum) per day, day-ordered — the q_kendall_tau frame."""
    daily: dict[int, list] = {}
    for r in rows:
        d = daily.setdefault(r.ep // 86400, [0, 0])
        d[0] += 1
        d[1] += round(round(r.value, 6) * 1e6)
    return [tuple(daily[d]) for d in sorted(daily)]


def test_kendall_tau_matches_python(spark, sf_dir):
    xy = _daily_xy(_events(spark, sf_dir))
    n = len(xy)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            sgx = (xy[j][0] > xy[i][0]) - (xy[j][0] < xy[i][0])
            sgy = (xy[j][1] > xy[i][1]) - (xy[j][1] < xy[i][1])
            s += sgx * sgy
    from collections import Counter

    n0 = n * (n - 1) // 2
    n1 = sum(t * (t - 1) // 2 for t in Counter(x for x, _ in xy).values())
    n2 = sum(t * (t - 1) // 2 for t in Counter(y for _, y in xy).values())
    tau = s / math.sqrt((n0 - n1) * (n0 - n2))
    got = QUERIES["q_kendall_tau"].fn(spark, sf_dir).collect()[0]
    assert (got.concordant_minus_discordant, got.n_days) == (s, n)
    assert abs(got.tau_b - round(tau, 6)) <= 1e-6
    assert -1.0 <= got.tau_b <= 1.0


def test_kendall_tau_agrees_with_mergesort_inversion_model(spark, sf_dir):
    """The docstring's O(n log n) scale path is real: on a tie-free
    sub-frame, C - D == n0 - 2 * inversions(y ordered by x)."""
    xy = _daily_xy(_events(spark, sf_dir))
    # keep only days whose x AND y are unique (tie-free identity applies)
    from collections import Counter

    cx = Counter(x for x, _ in xy)
    cy = Counter(y for _, y in xy)
    sub = [(x, y) for x, y in xy if cx[x] == 1 and cy[y] == 1]
    n = len(sub)
    assert n >= 3, "need a tie-free sub-frame for the identity check"
    ys = [y for _, y in sorted(sub)]

    def count_inversions(a):
        if len(a) <= 1:
            return 0, a
        mid = len(a) // 2
        li, left = count_inversions(a[:mid])
        ri, right = count_inversions(a[mid:])
        merged, inv, i, j = [], li + ri, 0, 0
        while i < len(left) and j < len(right):
            if left[i] <= right[j]:
                merged.append(left[i]); i += 1
            else:
                inv += len(left) - i
                merged.append(right[j]); j += 1
        merged.extend(left[i:]); merged.extend(right[j:])
        return inv, merged

    inv, _ = count_inversions(ys)
    brute = sum(
        ((sub[j][0] > sub[i][0]) - (sub[j][0] < sub[i][0]))
        * ((sub[j][1] > sub[i][1]) - (sub[j][1] < sub[i][1]))
        for i in range(n)
        for j in range(i + 1, n)
    )
    assert brute == n * (n - 1) // 2 - 2 * inv
