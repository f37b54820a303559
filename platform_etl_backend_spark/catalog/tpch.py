"""The remaining TPC-H query shapes (Q2/Q4/Q6/Q9/Q11/Q12/Q16/Q17/Q20/Q21),
adapted to the driver's TPC-H-ish schema.

The -ish schema has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate``/``l_shipmode`` columns, so (documented
per query, same policy as the existing q_tpch_q19/q_tpch_q22 adaptations):

- the *supply* relation is derived from ``lineitem`` as the distinct
  (partkey, suppkey) pairs, with MIN(extendedprice) standing in for
  ``ps_supplycost`` and SUM(quantity) for ``ps_availqty``;
- *lateness* (``l_receiptdate > l_commitdate``) becomes
  ``l_shipdate > o_orderdate + 60 days``;
- Q12's ship-mode classes become FAST/SLOW lateness bands.

With these, all 22 TPC-H query SHAPES are covered: the correlated-min
subquery (Q2), EXISTS with a correlated inequality (Q4), scan-filter-sum
(Q6), multi-dim profit rollup (Q9), group-HAVING vs a global scalar (Q11),
conditional two-way counts (Q12), distinct-count with anti-join exclusion
(Q16), correlated per-group average threshold (Q17), nested IN semi-joins
(Q20), and the semi+anti self-join pair (Q21). Q1/Q3/Q5/Q7/Q8/Q10/Q13/Q14/
Q15/Q18/Q19/Q22 live in ``catalog/relational.py``.

Reference parity: the reference's query layer composes the same
join/agg/subquery primitives (e.g. GraphNode.scala-style step composition);
TPC-H is the standard public benchmark surface for those shapes.

Determinism: money sums via decimal(18,2); ratios/thresholds as exact
decimal sums cast to double with single IEEE operations; every output
ordered on a unique key (conventions in ``catalog/__init__.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from platform_etl_backend_spark.catalog.registry import register, table, dec2, dbl

_DEC_ONE = "cast(1 as decimal(4,2))"

_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "CAST(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))"
)


def _one_minus_disc():
    return (F.expr(_DEC_ONE) - F.col("l_discount").cast("decimal(4,2)")).cast("decimal(4,2)")


@register(
    "q_tpch_q2",
    oracle="""
    WITH supply AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    eur AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE')
    SELECT p.p_partkey, p.p_brand, e.s_suppkey, e.s_name, e.n_name,
           CAST(e.s_acctbal AS DOUBLE) AS s_acctbal,
           CAST(sp.cost AS DOUBLE) AS cost
    FROM part p
    JOIN supply sp ON sp.partkey = p.p_partkey
    JOIN eur e ON e.s_suppkey = sp.suppkey
    WHERE p.p_type = 'STANDARD'
      AND sp.cost = (SELECT MIN(sp2.cost) FROM supply sp2
                     JOIN eur e2 ON e2.s_suppkey = sp2.suppkey
                     WHERE sp2.partkey = p.p_partkey)
    ORDER BY p.p_partkey, e.s_suppkey
    """,
    description="TPC-H Q2 shape (minimum-cost supplier; supply relation "
    "derived from lineitem with MIN(extendedprice) as ps_supplycost): "
    "correlated MIN subquery decorrelated into a per-part min-cost "
    "aggregate joined back on EXACT decimal equality, so ties keep every "
    "minimal supplier identically in both engines; supplier/nation/region "
    "dimensions broadcast",
    tags=("join", "agg", "subquery", "tpch"),
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    supply = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(dec2("l_extendedprice")).alias("cost"))
    eur = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eur_supply = supply.join(F.broadcast(eur), supply.suppkey == F.col("s_suppkey"))
    best = eur_supply.groupBy("partkey").agg(F.min("cost").alias("best_cost"))
    return (
        eur_supply.join(best, ["partkey"])
        .where(F.col("cost") == F.col("best_cost"))
        .join(F.broadcast(p), F.col("partkey") == p.p_partkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            "n_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            F.col("cost").cast("double").alias("cost"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


@register(
    "q_tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 60)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    description="TPC-H Q4 shape (order priority checking; lateness = "
    "shipdate > orderdate + 60 days standing in for the missing "
    "commit/receipt dates): correlated EXISTS with an inequality on the "
    "correlated row — Catalyst decorrelates to a LEFT-SEMI hash join on "
    "orderkey with the date predicate as the join condition residual; "
    "quarter filter pushed to the orders scan",
    tags=("subquery", "agg", "tpch"),
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-04-01").cast("date"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate.cast("date") > F.date_add(o.o_orderdate.cast("date"), 60)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q_tpch_q6",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND l_discount >= CAST(0.05 AS DOUBLE) AND l_discount <= CAST(0.07 AS DOUBLE)
      AND l_quantity < CAST(24 AS DOUBLE)
    """,
    description="TPC-H Q6 (forecasting revenue change): pure "
    "scan-filter-aggregate — every predicate pushes to the parquet scan "
    "(PushedFilters on shipdate/discount/quantity), no shuffle beyond the "
    "single-row global agg; discount literals compared as doubles so both "
    "engines test identical bits",
    tags=("filter", "agg", "tpch"),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount") >= F.lit(0.05))
            & (F.col("l_discount") <= F.lit(0.07))
            & (F.col("l_quantity") < F.lit(24.0))
        )
        .agg(
            dbl(F.sum(dec2("l_extendedprice") * F.col("l_discount").cast("decimal(4,2)"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q_tpch_q9",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM CAST(o.o_orderdate AS DATE)) AS BIGINT) AS o_year,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * CAST(CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
                         AS DECIMAL(28,4))
                    - CAST(CAST(p.p_retailprice AS DECIMAL(18,2))
                           * CAST(l.l_quantity AS DECIMAL(4,1)) AS DECIMAL(28,4))) AS DOUBLE)
               AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, o_year
    ORDER BY nation, o_year
    """,
    description="TPC-H Q9 shape (product-type profit; p_retailprice*quantity "
    "stands in for ps_supplycost*quantity): 5-table star with a LIKE filter "
    "on the part name, profit as a difference of two exact narrow-decimal "
    "products (each within precision 38 — the wide-product scale-reduction "
    "trap documented in catalog/__init__.py is avoided by casting each "
    "product, not the operands, to decimal(28,4)); nation/part/supplier "
    "broadcast, orders<->lineitem is the one real shuffle",
    tags=("join", "agg", "tpch"),
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    rev = (dec2("l_extendedprice") * _one_minus_disc()).cast("decimal(28,4)")
    cost = (dec2("p_retailprice") * F.col("l_quantity").cast("decimal(4,1)")).cast(
        "decimal(28,4)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).cast("bigint").alias("o_year"),
        )
        .agg(dbl(F.sum(rev - cost)).alias("sum_profit"))
        .orderBy("nation", "o_year")
    )


@register(
    "q_tpch_q11",
    oracle="""
    WITH eur_value AS (
      SELECT l.l_partkey AS partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
      GROUP BY l.l_partkey)
    SELECT partkey, CAST(value AS DOUBLE) AS value
    FROM eur_value
    WHERE CAST(value AS DOUBLE)
          > (SELECT CAST(SUM(value) AS DOUBLE) / COUNT(*) FROM eur_value)
            * CAST(1.5 AS DOUBLE)
    ORDER BY value DESC, partkey
    """,
    description="TPC-H Q11 shape (important stock; per-part shipped value "
    "from EUROPE-nation suppliers stands in for partsupp stock value): "
    "group-HAVING against a global scalar — the per-part decimal sums are "
    "computed once and reused for both the probe and the global total "
    "(exchange reuse), threshold = one IEEE multiply of exact doubles; "
    "the region-filtered supplier LUT broadcasts onto the fact scan",
    tags=("join", "agg", "subquery", "tpch"),
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eur_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    value = (
        li.join(F.broadcast(eur_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(dec2("l_extendedprice")).alias("value"))
    )
    total = value.agg(
        ((F.sum("value").cast("double") / F.count(F.lit(1))) * F.lit(1.5)).alias("threshold")
    )
    return (
        value.crossJoin(F.broadcast(total))  # 1-row scalar frame
        .where(F.col("value").cast("double") > F.col("threshold"))
        .select("partkey", F.col("value").cast("double").alias("value"))
        .orderBy(F.desc("value"), "partkey")
    )


@register(
    "q_tpch_q12",
    oracle="""
    SELECT CASE WHEN CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE) >= 30
                THEN 'SLOW' ELSE 'FAST' END AS ship_band,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
               AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
               AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1997-01-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1998-01-01'
    GROUP BY ship_band
    ORDER BY ship_band
    """,
    description="TPC-H Q12 shape (shipping modes; FAST/SLOW lateness bands "
    "— integer day difference thresholds — stand in for the missing "
    "l_shipmode): orderkey equi-join then conditional two-way counts per "
    "band; the year filter pushes to the lineitem scan and the band "
    "expression is pure integer date arithmetic, portable by construction",
    tags=("join", "agg", "tpch"),
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-01-01").cast("date"))
    )
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    band = F.when(
        F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")) >= 30,
        F.lit("SLOW"),
    ).otherwise(F.lit("FAST"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(band.alias("ship_band"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_band")
    )


@register(
    "q_tpch_q16",
    oracle="""
    WITH pairs AS (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT pr.suppkey) AS supplier_cnt
    FROM pairs pr JOIN part p ON p.p_partkey = pr.partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND pr.suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 4 = 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    description="TPC-H Q16 shape (parts/supplier relationship; distinct "
    "lineitem (part,supp) pairs stand in for partsupp, and a deterministic "
    "suppkey band stands in for the complaints comment filter): NOT IN "
    "becomes a LEFT-ANTI broadcast join (no nulls in the key by "
    "construction so NOT-IN null semantics cannot bite), then "
    "COUNT(DISTINCT) per (brand,type,size) — partial distinct map-side, "
    "one shuffle on the group key",
    tags=("join", "agg", "tpch"),
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") % 4 == 0)
        .select("s_suppkey")
    )
    pairs = li.select(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).distinct()
    return (
        pairs.join(F.broadcast(bad_supp), pairs.suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q_tpch_q17",
    oracle="""
    WITH avg_qty AS (
      SELECT l_partkey AS partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS aq
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(7 AS DOUBLE) AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN avg_qty a ON a.partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23' AND p.p_size <= 10
      AND l.l_quantity < CAST(0.2 AS DOUBLE) * a.aq
    """,
    description="TPC-H Q17 shape (small-quantity-order revenue; the size "
    "band stands in for the missing container): correlated per-part average "
    "decorrelated into an aggregate joined back on partkey; the threshold "
    "0.2*avg is one IEEE multiply of an exact decimal-sum/count double; "
    "the filtered part LUT broadcasts, the avg join shuffles on partkey "
    "ONCE and reuses the lineitem scan exchange",
    tags=("join", "agg", "subquery", "tpch"),
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") <= 10)
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        (F.sum(dec2("l_quantity")).cast("double") / F.count(F.lit(1))).alias("aq")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("partkey"))
        .where(F.col("l_quantity") < F.lit(0.2) * F.col("aq"))
        .agg(
            (F.sum(dec2("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q_tpch_q20",
    oracle="""
    WITH widget_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'large%'),
    shipped AS (
      SELECT l_suppkey AS suppkey, l_partkey AS partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      GROUP BY l_suppkey, l_partkey)
    SELECT s.s_suppkey, s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (
        SELECT suppkey FROM shipped
        WHERE partkey IN (SELECT p_partkey FROM widget_parts)
          AND qty > CAST(50 AS DECIMAL(18,2)))
    ORDER BY s.s_suppkey
    """,
    description="TPC-H Q20 shape (potential part promotion; the "
    "lineitem-derived shipped-quantity relation stands in for partsupp "
    "availqty): NESTED IN subqueries — the inner part-name IN becomes a "
    "broadcast LEFT-SEMI onto the per-(supp,part) aggregate, the outer "
    "suppkey IN a second LEFT-SEMI onto the region-filtered supplier dim; "
    "the quantity threshold compares exact decimals",
    tags=("join", "subquery", "tpch"),
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1997-01-01").cast("date"))
    )
    parts = (
        table(spark, sf_dir, "part").where(F.col("p_name").like("large%")).select("p_partkey")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    shipped = li.groupBy(
        F.col("l_suppkey").alias("suppkey"), F.col("l_partkey").alias("partkey")
    ).agg(F.sum(dec2("l_quantity")).alias("qty"))
    qualifying = (
        shipped.join(F.broadcast(parts), shipped.partkey == F.col("p_partkey"), "left_semi")
        .where(F.col("qty") > F.lit(50).cast("decimal(18,2)"))
        .select("suppkey")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(qualifying, s.s_suppkey == F.col("suppkey"), "left_semi")
        .select("s_suppkey", "s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
        .orderBy("s_suppkey")
    )


@register(
    "q_tpch_q21",
    oracle="""
    WITH f_orders AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate
      FROM orders WHERE o_orderstatus = 'F'),
    all_pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN f_orders o ON o.o_orderkey = l.l_orderkey
      WHERE CAST(l.l_shipdate AS DATE) > o.odate + 60)
    SELECT s.s_name, COUNT(*) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM all_pairs l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM late) l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
    description="TPC-H Q21 shape (suppliers who kept orders waiting; "
    "lateness = shipdate > orderdate + 60 days): the classic EXISTS + "
    "NOT EXISTS self-join pair — a LEFT-SEMI against all (order,supp) "
    "pairs with a different supplier, then a LEFT-ANTI against the late "
    "pairs with a different supplier; both joins carry the orderkey "
    "equi-component so they stay hash joins with a residual inequality, "
    "never BNLJ",
    tags=("join", "subquery", "agg", "tpch"),
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(
            F.col("l_shipdate").cast("date") > F.date_add(F.col("o_orderdate").cast("date"), 60)
        )
        .select("l_orderkey", "l_suppkey")
    )
    all_pairs = li.select(
        F.col("l_orderkey").alias("p_orderkey"), F.col("l_suppkey").alias("p_suppkey")
    ).distinct()
    late_pairs = late.select(
        F.col("l_orderkey").alias("lp_orderkey"), F.col("l_suppkey").alias("lp_suppkey")
    ).distinct()
    l1 = (
        late.join(
            all_pairs,
            (late.l_orderkey == F.col("p_orderkey")) & (late.l_suppkey != F.col("p_suppkey")),
            "left_semi",
        ).join(
            late_pairs,
            (late.l_orderkey == F.col("lp_orderkey"))
            & (late.l_suppkey != F.col("lp_suppkey")),
            "left_anti",
        )
    )
    return (
        l1.join(F.broadcast(s), l1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )
