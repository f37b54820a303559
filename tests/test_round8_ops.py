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


def test_kruskal_wallis_matches_python_model(spark, sf_dir):
    """H and the tie-corrected H must match a plain-python midrank
    implementation to the shared 6-dp rounding."""
    from collections import Counter, defaultdict

    from platform_etl_backend_spark.catalog import QUERIES

    got = QUERIES["q_kruskal_wallis"].fn(spark, sf_dir).collect()[0]
    rows = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value"
    ).collect()
    pooled = Counter(r["value"] for r in rows)
    n = sum(pooled.values())
    # pooled midranks per distinct value
    mid = {}
    cum = 0
    for v in sorted(pooled):
        c = pooled[v]
        mid[v] = cum + (c + 1) / 2
        cum += c
    groups = defaultdict(list)
    for r in rows:
        groups[r["event_type"]].append(mid[r["value"]])
    s = sum(
        sum(g) ** 2 / len(g)
        for _, g in sorted(groups.items())
    )
    h = 12 * s / (n * (n + 1)) - 3 * (n + 1)
    tie = sum(c ** 3 - c for c in pooled.values())
    hc = h / (1 - tie / (n ** 3 - n))
    assert got["n"] == n
    assert got["n_groups"] == len(groups)
    assert got["tie_sum"] == tie
    assert abs(got["h"] - h) < 1e-5, (got["h"], h)
    assert abs(got["h_tie_corrected"] - hc) < 1e-5
    assert got["h"] > 0


def test_levene_brown_forsythe_matches_python_model(spark, sf_dir):
    """Brown-Forsythe F on |cents - group median| must match the python
    model (lower-median rank-pick, exact integer deviations)."""
    from collections import defaultdict

    from platform_etl_backend_spark.catalog import QUERIES

    got = QUERIES["q_levene_test"].fn(spark, sf_dir).collect()[0]
    rows = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value"
    ).collect()
    cents = defaultdict(list)
    for r in rows:
        cents[r["event_type"]].append(round(r["value"] * 100))
    z = {}
    for gname, v in cents.items():
        v.sort()
        med = v[(len(v) + 1) // 2 - 1]
        z[gname] = [abs(x - med) for x in v]
    k = len(z)
    nt = sum(len(v) for v in z.values())
    st = sum(sum(v) for v in z.values())
    sst = sum(x * x for v in z.values() for x in v)
    sq = sum(sum(v) ** 2 / len(v) for _, v in sorted(z.items()))
    ssb = sq - st ** 2 / nt
    ssw = sst - sq
    f = (ssb / (k - 1)) / (ssw / (nt - k))
    assert got["n"] == nt and got["n_groups"] == k
    assert abs(got["f_bf"] - f) < 1e-5, (got["f_bf"], f)
    assert abs(got["ssb"] - ssb) < 1.0 and abs(got["ssw"] - ssw) < 1.0


def test_scd2_history_intervals_partition_and_chain(spark, sf_dir):
    """SCD2 invariants vs a plain-python replay: per user the intervals
    chain (valid_to = next valid_from - 1, NULL only on the last), statuses
    change at every boundary, and day-level statuses replay to the same
    runs."""
    from collections import defaultdict

    from platform_etl_backend_spark.catalog import QUERIES

    out = QUERIES["q_scd2_history"].fn(spark, sf_dir).collect()
    by_user = defaultdict(list)
    for r in out:
        by_user[r["user_id"]].append(r)
    assert by_user  # fixture has %17 users
    # python replay from raw events
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    days = defaultdict(dict)  # user -> day -> (ep, event_id, event_type)
    for r in ev:
        if r["user_id"] % 17 != 0:
            continue
        ts = r["ts"]
        ep = int(ts.timestamp()) if hasattr(ts, "timestamp") else int(ts) // 10**9
        key = (ep, r["event_id"], r["event_type"])
        d = ep // 86400
        cur = days[r["user_id"]].get(d)
        if cur is None or key > cur:
            days[r["user_id"]][d] = key
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r["valid_from_day"])
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to_day"] == b["valid_from_day"] - 1
            assert a["status"] != b["status"]  # a run ends only on change
        assert rows[-1]["valid_to_day"] is None  # current interval open
        # replay: collapse observed-day statuses into runs
        want = []
        for d in sorted(days[user]):
            st = days[user][d][2]
            if not want or want[-1][0] != st:
                want.append([st, d, d, 1])
            else:
                want[-1][2] = d
                want[-1][3] += 1
        got = [
            (r["status"], r["valid_from_day"], r["last_active_day"],
             r["n_active_days"])
            for r in rows
        ]
        assert got == [tuple(w) for w in want], (user, got, want)


def test_t_closeness_matches_python_tvd(spark, sf_dir):
    """Per-group categorical EMD (= total variation distance) must equal
    the python rational computation, and the query must return the true
    worst-10 groups."""
    from collections import Counter, defaultdict

    from platform_etl_backend_spark.catalog import QUERIES
    from fractions import Fraction

    got = QUERIES["q_t_closeness"].fn(spark, sf_dir).collect()
    rows = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_nationkey", "c_acctbal", "c_mktsegment"
    ).collect()
    import math

    glob = Counter()
    groups = defaultdict(Counter)
    for r in rows:
        band = math.floor(float(r["c_acctbal"]) / 1000)
        glob[r["c_mktsegment"]] += 1
        groups[(r["c_nationkey"], band)][r["c_mktsegment"]] += 1
    n = sum(glob.values())
    tvd = {}
    for g, cnts in groups.items():
        ng = sum(cnts.values())
        t = Fraction(
            sum(abs(cnts.get(s, 0) * n - glob[s] * ng) for s in glob),
            2 * ng * n,
        )
        # round-half-away micro
        tvd[g] = (2 * 10**6 * t.numerator + t.denominator) // (2 * t.denominator)
    want = sorted(
        ((mic, g) for g, mic in tvd.items()),
        key=lambda x: (-x[0], x[1]),
    )[:10]
    got_t = [((r["nat"], r["bal_band"]), r["tvd_micro"]) for r in got]
    assert [(g, mic) for mic, g in want] == got_t
    assert all(0 <= mic <= 10**6 for _, mic in got_t)  # TVD in [0, 1]


def test_friedman_matches_python_model(spark, sf_dir):
    """Q must match a plain-python Friedman computation (daily micro
    totals, midranks within complete blocks, tie-general formula), and
    the tie-free classic formula when no within-day ties exist."""
    from collections import defaultdict
    from decimal import Decimal

    from platform_etl_backend_spark.catalog import QUERIES

    got = QUERIES["q_friedman_test"].fn(spark, sf_dir).collect()[0]
    rows = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    cells = defaultdict(lambda: defaultdict(Decimal))
    types = set()
    for r in rows:
        ts = r["ts"]
        ep = int(ts.timestamp()) if hasattr(ts, "timestamp") else int(ts) // 10**9
        d = ep // 86400
        v = Decimal(str(round(r["value"], 6)))
        cells[d][r["event_type"]] += v
        types.add(r["event_type"])
    k = len(types)
    blocks = {
        d: {t: int(s * 10**6) for t, s in m.items()}
        for d, m in cells.items() if len(m) == k
    }
    n = len(blocks)
    r2sum = defaultdict(int)
    a4 = 0
    for d, m in blocks.items():
        vals = sorted(m.values())
        for t, s in m.items():
            lt = sum(1 for x in vals if x < s)
            eq = sum(1 for x in vals if x == s)
            r2 = 2 * lt + eq + 1
            r2sum[t] += r2
            a4 += r2 * r2
    s4 = sum((r2sum[t] - n * (k + 1)) ** 2 for t in types)
    q = (k - 1) * s4 / (a4 - n * k * (k + 1) ** 2)
    assert got["n_blocks"] == n and got["n_treatments"] == k
    assert abs(got["q_friedman"] - q) < 1e-6, (got["q_friedman"], q)


def test_silhouette_cells_matches_python_model(spark, sf_dir):
    """Per-cell mean silhouette must equal a plain-python recomputation
    from the SAME fitted centroids (6-dp cosine, signed-rha micro), and
    every mean must lie in [-1e6, 1e6]."""
    import math
    from collections import defaultdict
    from decimal import Decimal

    from platform_etl_backend_spark.catalog import QUERIES
    from platform_etl_backend_spark.operators.similarity import kmeans_fit

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = {
        r["cell_id"]: list(r["vec"])
        for r in kmeans_fit(emb, "vec_id", "embedding", k=8, iters=2).collect()
    }

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        da = math.sqrt(sum(x * x for x in a))
        db = math.sqrt(sum(x * x for x in b))
        return round(num / (da * db), 6)

    sums = defaultdict(Decimal)
    ns = defaultdict(int)
    for r in emb.collect():
        v = [float(x) for x in r["embedding"]]
        scored = sorted(
            ((cos(v, c), -cid) for cid, c in cents.items()), reverse=True
        )
        c_own, own_cell = scored[0][0], -scored[0][1]
        c_oth = max(s for s, _ in scored[1:])
        denom = max(1 - c_own, 1 - c_oth)
        s = Decimal(0) if denom == 0 else Decimal(
            str(round((c_own - c_oth) / denom, 6))
        )
        sums[own_cell] += s
        ns[own_cell] += 1
    got = {
        r["cell_id"]: (r["n"], r["mean_s_micro"])
        for r in QUERIES["q_silhouette_cells"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(ns)
    for cell in ns:
        sm = int(sums[cell] * 10**6)
        n = ns[cell]
        mean = (
            (2 * sm + n) // (2 * n) if sm >= 0 else -((2 * -sm + n) // (2 * n))
        )
        assert got[cell] == (n, mean), (cell, got[cell], (n, mean))
        assert -10**6 <= got[cell][1] <= 10**6


def test_bipartite_check_matches_networkx_and_flags_odd_cycles(spark, sf_dir):
    """The certificate must agree with networkx on the fixture projection,
    and the operator must correctly certify a known-bipartite even cycle
    and refute an odd cycle (via the same BFS-parity path)."""
    import pytest

    nx = pytest.importorskip("networkx")
    from platform_etl_backend_spark.catalog import QUERIES

    got = QUERIES["q_bipartite_check"].fn(spark, sf_dir).collect()[0]
    rows = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "value"
    ).collect()
    edges = set()
    for r in rows:
        u = r["user_id"] % 50
        v = int(r["value"]) % 50
        if u != v:
            edges.add((min(u, v), max(u, v)))
    g = nx.Graph(edges)
    assert got["n_nodes"] == g.number_of_nodes()
    assert got["n_edges"] == g.number_of_edges()
    assert bool(got["is_bipartite"]) == nx.is_bipartite(g)
    assert (got["n_conflict_edges"] == 0) == bool(got["is_bipartite"])


def test_bfs_parity_certifies_even_and_refutes_odd_cycle(spark):
    """Direct operator check: C6 is bipartite (0 parity conflicts), C5 is
    not — using the new landmark `sources` knob of
    pairwise_hop_distances."""
    from pyspark.sql import functions as F

    from platform_etl_backend_spark.operators.graph import pairwise_hop_distances

    def conflicts(n):
        und = [(i, (i + 1) % n) for i in range(n)]
        sym = und + [(b, a) for a, b in und]
        edges = spark.createDataFrame(sym, ["src", "dst"])
        roots = spark.createDataFrame([(0,)], ["node"])
        dist = pairwise_hop_distances(edges, max_hops=16, sources=roots)
        color = {r["node"]: r["dist"] % 2 for r in dist.collect()}
        color[0] = 0
        return sum(1 for a, b in und if color[a] == color[b])

    assert conflicts(6) == 0
    assert conflicts(5) > 0


def test_jonckheere_matches_python_model(spark, sf_dir):
    """2*JT, the null mean, and the tie-corrected z must match a
    bisect-based python computation over the ordered group pairs."""
    import math
    from bisect import bisect_left, bisect_right
    from collections import defaultdict

    from platform_etl_backend_spark.catalog import QUERIES

    got = QUERIES["q_jonckheere"].fn(spark, sf_dir).collect()[0]
    rows = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value"
    ).collect()
    groups = defaultdict(list)
    for r in rows:
        groups[r["event_type"]].append(r["value"])
    names = sorted(groups)
    for g in names:
        groups[g].sort()
    jt2 = 0
    for i, gi in enumerate(names):
        vi = groups[gi]
        for gj in names[i + 1:]:
            for v in groups[gj]:
                lt = bisect_left(vi, v)
                eq = bisect_right(vi, v) - lt
                jt2 += 2 * lt + eq
    ns = [len(groups[g]) for g in names]
    nn = sum(ns)
    mean2 = sum(
        ns[i] * ns[j] for i in range(len(ns)) for j in range(i + 1, len(ns))
    )
    from collections import Counter

    ties = Counter(v for vs in groups.values() for v in vs)
    g25 = sum(n * (n - 1) * (2 * n + 5) for n in ns)
    g3 = sum(n * (n - 1) * (n - 2) for n in ns)
    g2 = sum(n * (n - 1) for n in ns)
    t25 = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    t3 = sum(t * (t - 1) * (t - 2) for t in ties.values())
    t2 = sum(t * (t - 1) for t in ties.values())
    var = (
        (nn * (nn - 1) * (2 * nn + 5) - g25 - t25) / 72.0
        + g3 * t3 / (36.0 * nn * (nn - 1) * (nn - 2))
        + g2 * t2 / (8.0 * nn * (nn - 1))
    )
    z = (jt2 - mean2) / (2.0 * math.sqrt(var))
    assert got["n"] == nn
    assert got["jt2"] == jt2, (got["jt2"], jt2)
    assert got["mean2"] == mean2
    assert abs(got["z"] - z) < 1e-5, (got["z"], z)


def test_page_trend_matches_python_model(spark, sf_dir):
    """Page's L2 and z must match a plain-python computation on the same
    complete-block micro-total ranks; within-block ties must be absent
    (the no-tie variance precondition)."""
    import math
    from collections import defaultdict
    from decimal import Decimal

    from platform_etl_backend_spark.catalog import QUERIES

    got = QUERIES["q_page_trend"].fn(spark, sf_dir).collect()[0]
    rows = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    cells = defaultdict(lambda: defaultdict(Decimal))
    types = set()
    for r in rows:
        ts = r["ts"]
        ep = int(ts.timestamp()) if hasattr(ts, "timestamp") else int(ts) // 10**9
        cells[ep // 86400][r["event_type"]] += Decimal(str(round(r["value"], 6)))
        types.add(r["event_type"])
    k = len(types)
    order = {t: j for j, t in enumerate(sorted(types), start=1)}
    blocks = {
        d: {t: int(s * 10**6) for t, s in m.items()}
        for d, m in cells.items() if len(m) == k
    }
    n = len(blocks)
    l2 = 0
    for d, m in blocks.items():
        vals = sorted(m.values())
        assert len(set(vals)) == k  # no within-block ties on micro totals
        for t, s in m.items():
            r2 = 2 * vals.index(s) + 2  # 2 * rank (1-based, no ties)
            l2 += order[t] * r2
    mean2 = n * k * (k + 1) * (k + 1) // 2
    var = n * k * k * (k + 1) * (k + 1) * (k - 1) / 144.0
    z = (l2 - mean2) / (2.0 * math.sqrt(var))
    assert got["n_blocks"] == n and got["k"] == k
    assert got["l2"] == l2 and got["mean2"] == mean2
    assert abs(got["z"] - z) < 1e-6


def test_davies_bouldin_matches_python_model(spark, sf_dir):
    """Per-cell scatter, worst partner, and the DB index must match a
    plain-python recomputation from the same fitted centroids."""
    import math
    from collections import defaultdict
    from decimal import Decimal

    from platform_etl_backend_spark.catalog import QUERIES
    from platform_etl_backend_spark.operators.similarity import kmeans_fit

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = {
        r["cell_id"]: list(r["vec"])
        for r in kmeans_fit(emb, "vec_id", "embedding", k=8, iters=2).collect()
    }

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return round(
            num / (math.sqrt(sum(x * x for x in a))
                   * math.sqrt(sum(x * x for x in b))), 6)

    dsum = defaultdict(Decimal)
    ns = defaultdict(int)
    for r in emb.collect():
        v = [float(x) for x in r["embedding"]]
        best = sorted(((cos(v, c), -cid) for cid, c in cents.items()),
                      reverse=True)[0]
        cid = -best[1]
        dsum[cid] += Decimal(str(round(1 - best[0], 6)))
        ns[cid] += 1
    s_micro = {
        c: (2 * int(dsum[c] * 10**6) + ns[c]) // (2 * ns[c]) for c in ns
    }
    worst = {}
    for i in ns:
        cands = []
        for j in ns:
            if i == j:
                continue
            m = round(1 - cos(cents[i], cents[j]), 6) * 10**6
            m = int(round(m))
            if m > 0:
                cands.append(((s_micro[i] + s_micro[j]) / m, -j))
        rv, nj = sorted(cands, reverse=True)[0]
        worst[i] = (-nj, rv)
    db = round(sum(rv for _, rv in (worst[c] for c in sorted(worst))) /
               len(worst), 6)
    got = {
        r["cell_id"]: r
        for r in QUERIES["q_davies_bouldin"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(ns)
    for c in ns:
        g = got[c]
        assert g["n"] == ns[c] and g["s_micro"] == s_micro[c]
        assert g["worst_other"] == worst[c][0]
        assert abs(g["r_max"] - round(worst[c][1], 6)) < 2e-6
        assert abs(g["db_index"] - db) < 2e-6


def _daily_micro(spark, sf_dir):
    from collections import defaultdict
    from decimal import Decimal

    rows = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    cells = defaultdict(lambda: defaultdict(Decimal))
    for r in rows:
        ts = r["ts"]
        ep = int(ts.timestamp()) if hasattr(ts, "timestamp") else int(ts) // 10**9
        cells[ep // 86400][r["event_type"]] += Decimal(str(round(r["value"], 6)))
    return {
        d: {t: int(s * 10**6) for t, s in m.items()} for d, m in cells.items()
    }


def test_cochran_q_matches_python_model(spark, sf_dir):
    """Q from the above-own-median binary matrix over complete blocks must
    match the python computation exactly (integer identity, one division)."""
    from platform_etl_backend_spark.catalog import QUERIES

    got = QUERIES["q_cochran_q"].fn(spark, sf_dir).collect()[0]
    cells = _daily_micro(spark, sf_dir)
    types = sorted({t for m in cells.values() for t in m})
    k = len(types)
    blocks = {d: m for d, m in cells.items() if len(m) == k}
    med = {}
    for t in types:
        v = sorted(m[t] for m in blocks.values())
        med[t] = v[(len(v) + 1) // 2 - 1]
    x = {d: {t: int(m[t] > med[t]) for t in types} for d, m in blocks.items()}
    cj = {t: sum(x[d][t] for d in x) for t in types}
    ri = {d: sum(x[d].values()) for d in x}
    n1 = sum(cj.values())
    scj2 = sum(c * c for c in cj.values())
    sri2 = sum(r * r for r in ri.values())
    assert got["n_blocks"] == len(blocks) and got["k"] == k
    assert got["n_ones"] == n1
    assert got["sum_cj2"] == scj2 and got["sum_ri2"] == sri2
    q = (k - 1) * (k * scj2 - n1 * n1) / (k * n1 - sri2)
    assert abs(got["q_cochran"] - q) < 1e-6


def test_hodges_lehmann_matches_python_model(spark, sf_dir):
    """The HL shift must be the exact lower median of all pairwise
    purchase-minus-click daily-total differences."""
    from platform_etl_backend_spark.catalog import QUERIES

    got = QUERIES["q_hodges_lehmann"].fn(spark, sf_dir).collect()[0]
    cells = _daily_micro(spark, sf_dir)
    a = [m["purchase"] for m in cells.values() if "purchase" in m]
    b = [m["click"] for m in cells.values() if "click" in m]
    diffs = sorted(x - y for x in a for y in b)
    assert got["n_a"] == len(a) and got["n_b"] == len(b)
    assert got["n_pairs"] == len(diffs)
    assert got["hl_shift_micro"] == diffs[(len(diffs) + 1) // 2 - 1]
