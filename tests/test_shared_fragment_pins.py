"""Shared-SQL-fragment pin registry — the machine-checked rule the round-8
VERDICT asked for (#3).

THE HOLE THIS CLOSES: when a python helper interpolates the SAME SQL text
into both the Spark side (selectExpr/F.expr/spark.sql) and the DuckDB
oracle, the oracle stops being independent for that fragment — both
engines evaluate the same formula, so a wrong coefficient is hash-GREEN.
q_kruskal_wallis shipped exactly that bug in round 8 (H = 3·S/… instead
of 12·S/… inside the shared ``_KW_RAW``); only its independent python
model caught it.

RULE (now CI, not code review): every query that shares generated SQL
text with its oracle MUST appear in ``SHARED_FRAGMENT_PINS`` below,
mapped to either

- ``("pin", "tests/<file>.py::<test_name>")`` — an INDEPENDENT python
  model of the query's values (pandas/pure-python, no SQL reuse), or
- ``("data-literal", reason)`` — the shared text is pure input DATA (a
  fixture string, a type token on an exact value), not transform logic;
  the oracle's independently-written transform still gates the logic.

Discovery is mechanical: a module-level ``_NAME`` string constant whose
VALUE appears in the oracle SQL and whose NAME is referenced in the query
function BODY (decorator excluded — the oracle itself lives there). A new
shared-fragment query without a registry entry fails
``test_every_shared_fragment_query_is_pinned``; a stale entry fails too,
so the registry can't rot.
"""

from __future__ import annotations

import inspect
import os
import re

import pandas as pd
import pytest

from platform_etl_backend_spark.catalog import QUERIES

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SHARED_FRAGMENT_PINS: dict[str, tuple[str, str]] = {
    # formula fragments (the kruskal class) -> independent python models
    "q_kruskal_wallis": (
        "pin", "tests/test_round8_ops.py::test_kruskal_wallis_matches_python_model"),
    "q_levene_test": (
        "pin", "tests/test_round8_ops.py::test_levene_brown_forsythe_matches_python_model"),
    "q_jonckheere": (
        "pin", "tests/test_round8_ops.py::test_jonckheere_matches_python_model"),
    "q_page_trend": (
        "pin", "tests/test_round8_ops.py::test_page_trend_matches_python_model"),
    "q_mann_whitney": (
        "pin", "tests/test_round5_session3.py::test_mann_whitney_matches_python"),
    "q_bh_fdr": (
        # the BH step-up mechanics are modeled independently; the shared
        # _MW_Z per-pair statistic is itself pinned via q_mann_whitney
        "pin", "tests/test_round5_session5.py::test_bh_fdr_mechanics"),
    "q_welch_ttest": (
        "pin", "tests/test_round5_session4.py::test_welch_ttest_matches_python"),
    # whole-SQL-shared queries (identical ANSI text runs on both engines
    # BY DESIGN — the SQL-surface parity family) -> models in this file
    "q_exists_subquery": (
        "pin", "tests/test_shared_fragment_pins.py::test_exists_subquery_matches_python_model"),
    "q_scalar_subquery": (
        "pin", "tests/test_shared_fragment_pins.py::test_scalar_subquery_matches_python_model"),
    "q_lateral_topk": (
        "pin", "tests/test_shared_fragment_pins.py::test_lateral_topk_matches_python_model"),
    # _DEC_ONE is a typed-constant token, but a wrong constant WOULD agree
    # across engines — so Q1 gets a full value model here too
    "q_agg_basic": (
        "pin", "tests/test_shared_fragment_pins.py::test_agg_basic_matches_python_model"),
    # _SENT_PREAMBLE is a fixture SENTENCE prepended as input data on both
    # sides; the split/normalize TRANSFORM is written independently per
    # engine, so the oracle still gates the logic. Conservation property:
    # tests/test_properties.py::test_sentence_split_token_conservation.
    "q_sentence_split": ("data-literal", "shared text is input data, not logic"),
    "q_text_normalize": ("data-literal", "shared text is input data, not logic"),
}


def discover_shared_fragment_queries() -> dict[str, list[str]]:
    """Mechanical inventory: query -> module-level _CONST names whose str
    value appears in the oracle AND whose name the function BODY uses."""
    import sys

    found: dict[str, list[str]] = {}
    for name, spec in QUERIES.items():
        if not spec.oracle:
            continue
        try:
            src = inspect.getsource(spec.fn)
        except (OSError, TypeError):  # pragma: no cover - all fns have source
            continue
        m = re.search(r"^def \w+", src, flags=re.M)
        body = src[m.start():] if m else src
        mod = sys.modules[spec.fn.__module__]
        hits = [
            attr
            for attr, val in vars(mod).items()
            if attr.startswith("_")
            and isinstance(val, str)
            and len(val) >= 16
            and re.search(rf"\b{re.escape(attr)}\b", body)
            and val in spec.oracle
        ]
        if hits:
            found[name] = sorted(hits)
    return found


def test_every_shared_fragment_query_is_pinned():
    discovered = discover_shared_fragment_queries()
    unpinned = {k: v for k, v in discovered.items()
                if k not in SHARED_FRAGMENT_PINS}
    assert not unpinned, (
        "queries share SQL text with their oracle but have no independent "
        f"python-model pin (add to SHARED_FRAGMENT_PINS): {unpinned}"
    )
    stale = sorted(set(SHARED_FRAGMENT_PINS) - set(discovered))
    assert not stale, f"SHARED_FRAGMENT_PINS entries no longer shared: {stale}"


def test_every_pin_target_exists():
    for qname, (kind, target) in SHARED_FRAGMENT_PINS.items():
        if kind == "data-literal":
            assert target, qname
            continue
        path, test_name = target.split("::")
        full = os.path.join(ROOT, path)
        assert os.path.exists(full), f"{qname}: pin file missing {path}"
        text = open(full).read()
        assert re.search(rf"^def {re.escape(test_name)}\(", text, flags=re.M), (
            f"{qname}: pin test {test_name} not defined in {path}"
        )


# ---------------------------------------------------------------------------
# Independent python models (pandas / pure python — NO SQL text reuse)
# ---------------------------------------------------------------------------


def _lineitem(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/lineitem.parquet")


def test_agg_basic_matches_python_model(spark, sf_dir):
    """TPC-H Q1 value model in integer cents (decimal(18,2)*(4,2) exact):
    pins the 1.00 constant and every coefficient in the shared fragment."""
    li = _lineitem(sf_dir)
    li = li[pd.to_datetime(li["l_shipdate"]).dt.date
            <= pd.Timestamp("1998-09-01").date()]
    groups = {}
    for r in li.itertuples(index=False):
        key = (r.l_returnflag, r.l_linestatus)
        g = groups.setdefault(key, [0, 0, 0, 0, 0])  # qty_c, price_c, disc4, charge6, n
        qty_c = round(float(r.l_quantity) * 100)
        price_c = round(float(r.l_extendedprice) * 100)
        disc_c = round(float(r.l_discount) * 100)   # (4,2) hundredths
        tax_c = round(float(r.l_tax) * 100)
        g[0] += qty_c
        g[1] += price_c
        g[2] += price_c * (100 - disc_c)            # scale-4 integer
        g[3] += price_c * (100 - disc_c) * (100 + tax_c)  # scale-6 integer
        g[4] += 1
    got = {(r.l_returnflag, r.l_linestatus): r
           for r in QUERIES["q_agg_basic"].fn(spark, sf_dir).collect()}
    assert set(got) == set(groups)
    for key, (qty_c, price_c, disc4, charge6, n) in groups.items():
        row = got[key]
        assert row.count_order == n
        assert row.sum_qty == pytest.approx(qty_c / 100, rel=1e-12)
        assert row.sum_base_price == pytest.approx(price_c / 100, rel=1e-12)
        assert row.sum_disc_price == pytest.approx(disc4 / 1e4, rel=1e-12)
        assert row.sum_charge == pytest.approx(charge6 / 1e6, rel=1e-12)
        assert row.avg_qty == pytest.approx(qty_c / 100 / n, rel=1e-12)


def test_exists_subquery_matches_python_model(spark, sf_dir):
    """TPC-H Q4 shape: orders with >=1 returned line, counted by priority."""
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    li = _lineitem(sf_dir)
    returned = set(li.loc[li["l_returnflag"] == "R", "l_orderkey"])
    hit = orders[orders["o_orderkey"].isin(returned)]
    want = hit.groupby("o_orderpriority").size().to_dict()
    got = {r.o_orderpriority: r.order_count
           for r in QUERIES["q_exists_subquery"].fn(spark, sf_dir).collect()}
    assert got == want


def test_scalar_subquery_matches_python_model(spark, sf_dir):
    """TPC-H Q17 shape: lines below the per-part 1/5 average-quantity
    threshold, on small parts; pins the /7.0 and the 5x divisor."""
    li = _lineitem(sf_dir)
    part = pd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_size"])
    small = set(part.loc[part["p_size"] < 15, "p_partkey"])
    per_part: dict[int, list[int]] = {}
    for r in li.itertuples(index=False):
        g = per_part.setdefault(int(r.l_partkey), [0, 0])
        g[0] += round(float(r.l_quantity) * 100)  # decimal(18,2) cents
        g[1] += 1
    price_cents = 0
    n_lines = 0
    for r in li.itertuples(index=False):
        pk = int(r.l_partkey)
        if pk not in small:
            continue
        qty_c, n = per_part[pk]
        thresh = (qty_c / 100) / (5 * n)
        if float(r.l_quantity) < thresh:
            price_cents += round(float(r.l_extendedprice) * 100)
            n_lines += 1
    row = QUERIES["q_scalar_subquery"].fn(spark, sf_dir).collect()[0]
    assert row.n_lines == n_lines
    assert row.avg_yearly == pytest.approx(
        round(price_cents / 100 / 7.0, 6), abs=1e-6)


def test_lateral_topk_matches_python_model(spark, sf_dir):
    """Per-nation top-2 customers by (acctbal DESC, name)."""
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_name", "c_acctbal"])
    want = set()
    for n in nation.itertuples(index=False):
        mine = cust[cust["c_nationkey"] == n.n_nationkey]
        top = sorted(
            ((round(float(r.c_acctbal), 2), r.c_name) for r in
             mine.itertuples(index=False)),
            key=lambda t: (-t[0], t[1]))[:2]
        want.update((n.n_name, name, bal) for bal, name in top)
    got = {(r.n_name, r.c_name, round(float(r.c_acctbal), 2))
           for r in QUERIES["q_lateral_topk"].fn(spark, sf_dir).collect()}
    assert got == want
