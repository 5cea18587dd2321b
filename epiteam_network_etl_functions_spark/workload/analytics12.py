"""Round-12-candidate analytics (registered into the DEFERRED tier in
round 10: sweep-verified now, they fill the round-11 driver prefix
together with the ``analytics11`` family).

Families: merchandising rollups on the reduced TPC-H slice (return
shares, tax x discount grid, counterfactual discount caps, domestic
vs international flows, positional lineitem profiles), balance and
outlier audits (exact integer-cent z-scores), event-stream behaviour
profiles (profile distances, entropy histograms, decile migration,
week-over-week overlap), corpus token diagnostics, embedding-space
audits (nearest-centroid confusion, JL distortion), and two
lakehouse-layout audits (Z-order locality, zone-map pruning yield).

All money/rate arithmetic uses the exact integer quantization
discipline from ``workload.tpch`` (cents / basis points as BIGINT;
DECIMAL(38,0) for product sums) so every oracle hash-matches
bit-for-bit; the only doubles are explicitly rounded terminal ratios.

IMPORT ORDER CONTRACT: imported LAST by ``workload.load_all``; every
name here is listed in ``workload.DEFERRED`` so nothing can evict a
round-10 query from the driver prefix (the rotation invariant
``tools/check_rotation.py`` enforces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .. import catalog
from ..session import prep
from . import query
from .tpch import _SQL_CENTS, _SQL_BP, _bp, _cents


def _load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    prep(spark)
    return catalog.load(spark, sf_dir, table)


# Exact discounted revenue in micro-dollars (cents x (10000 - bp) ->
# 1e-6 dollars), summed as DECIMAL(38,0) so no scale overflows: the
# pricing_summary discipline (workload/tpch.py:44).
_SQL_REV = (
    f"CAST({_SQL_CENTS.format(c='l.l_extendedprice')}"
    f" * (10000 - {_SQL_BP.format(c='l.l_discount')}) AS DECIMAL(38,0))"
)


def _rev_col() -> F.Column:
    return (
        _cents("l_extendedprice") * (10000 - _bp("l_discount"))
    ).cast("decimal(38,0)")


# ---------------------------------------------------------------------------
# Merchandising rollups
# ---------------------------------------------------------------------------


@query(
    "returned_share_by_brand",
    oracle=f"""
    SELECT p.p_brand AS brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returned,
           CAST(sum({_SQL_REV}) AS DOUBLE) / 1000000.0 AS revenue_total,
           CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN {_SQL_REV}
                         ELSE 0 END) AS DOUBLE) / 1000000.0
               AS revenue_returned,
           round(CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN {_SQL_REV}
                               ELSE 0 END) AS DOUBLE)
                 / CAST(sum({_SQL_REV}) AS DOUBLE), 6) + 0.0
               AS returned_share
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def returned_share_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-revenue share per brand — the merchandising QC rollup
    (which brands come back). One broadcast dim join (part is the small
    side at every SF) into a single brand groupBy: the per-row revenue
    is exact integer micro-dollars (cents x basis points) summed as
    DECIMAL(38,0), so the share is bit-deterministic on both engines.
    Map-side partial aggregation leaves a 25-row shuffle."""
    li = _load(spark, sf_dir, "lineitem")
    part = _load(spark, sf_dir, "part")
    rev = _rev_col()
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li.l_partkey == F.col("p_partkey"),
    )
    ret = F.when(F.col("l_returnflag") == "R", rev).otherwise(F.lit(0))
    out = j.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("n_returned"),
        (F.sum(rev).cast("double") / 1000000.0).alias("revenue_total"),
        (F.sum(ret).cast("double") / 1000000.0).alias("revenue_returned"),
    )
    return out.select(
        "brand",
        "n_lines",
        "n_returned",
        "revenue_total",
        "revenue_returned",
        (
            F.round(F.col("revenue_returned") / F.col("revenue_total"), 6)
            + F.lit(0.0)
        ).alias("returned_share"),
    )


@query(
    "lineitem_tax_discount_grid",
    oracle=f"""
    SELECT {_SQL_BP.format(c='l.l_discount')} AS discount_bp,
           {_SQL_BP.format(c='l.l_tax')} AS tax_bp,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum({_SQL_CENTS.format(c='l.l_quantity')}) AS BIGINT)
               AS qty_cents,
           CAST(sum({_SQL_REV}) AS DOUBLE) / 1000000.0 AS revenue
    FROM lineitem l
    GROUP BY discount_bp, tax_bp
    """,
)
def lineitem_tax_discount_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue / volume over the full tax x discount grid (11 x 9 cells)
    — the pricing-policy exposure matrix. Map-only quantization into a
    two-key groupBy: partial aggregation makes the shuffle 99 rows at
    any scale; no joins, no windows."""
    li = _load(spark, sf_dir, "lineitem")
    return li.groupBy(
        _bp("l_discount").alias("discount_bp"),
        _bp("l_tax").alias("tax_bp"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(_cents("l_quantity")).cast("long").alias("qty_cents"),
        (F.sum(_rev_col()).cast("double") / 1000000.0).alias("revenue"),
    )


@query(
    "discount_cap_counterfactual",
    oracle=f"""
    SELECT CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(sum({_SQL_REV}) AS DOUBLE) / 1000000.0 AS revenue_actual,
           CAST(sum(CAST({_SQL_CENTS.format(c='l.l_extendedprice')}
                    * (10000 - least({_SQL_BP.format(c='l.l_discount')}, 500))
                    AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0
               AS revenue_capped,
           round(CAST(sum(CAST({_SQL_CENTS.format(c='l.l_extendedprice')}
                    * ({_SQL_BP.format(c='l.l_discount')}
                       - least({_SQL_BP.format(c='l.l_discount')}, 500))
                    AS DECIMAL(38,0))) AS DOUBLE)
                 / CAST(sum({_SQL_REV}) AS DOUBLE), 6) + 0.0
               AS givenback_share
    FROM lineitem l
    GROUP BY ship_year
    """,
)
def discount_cap_counterfactual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counterfactual revenue if discounts were capped at 5%: per ship
    year, actual vs capped revenue and the share of revenue given back
    above the cap — the what-if pricing audit (TPC-H Q6's forecasting
    question generalized to a policy sweep). Exact integer arithmetic
    throughout (the counterfactual is a different basis-point factor on
    the same cents), one year-keyed groupBy, map-side combined."""
    li = _load(spark, sf_dir, "lineitem")
    pc, db = _cents("l_extendedprice"), _bp("l_discount")
    capped = F.least(db, F.lit(500))
    base = li.select(
        F.year("l_shipdate").cast("long").alias("ship_year"),
        (pc * (10000 - db)).cast("decimal(38,0)").alias("rev"),
        (pc * (10000 - capped)).cast("decimal(38,0)").alias("rev_cap"),
        (pc * (db - capped)).cast("decimal(38,0)").alias("giveback"),
    )
    return base.groupBy("ship_year").agg(
        (F.sum("rev").cast("double") / 1000000.0).alias("revenue_actual"),
        (F.sum("rev_cap").cast("double") / 1000000.0).alias("revenue_capped"),
        (
            F.round(
                F.sum("giveback").cast("double") / F.sum("rev").cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("givenback_share"),
    )


@query(
    "part_name_term_head",
    oracle="""
    SELECT term, CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT unnest(string_split(p_name, ' ')) AS term FROM part
    )
    WHERE term <> ''
    GROUP BY term
    ORDER BY n DESC, term ASC
    LIMIT 20
    """,
)
def part_name_term_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 vocabulary head of the part-name column — the
    dimension-text profiling pass (catalog names are bounded-vocabulary
    text; the head shows the generator's palette). split + explode +
    count with the (n DESC, term ASC) total order; TakeOrdered keeps
    the top-k driver-side state at 20 rows."""
    part = _load(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split("p_name", " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(20)
    )


@query(
    "linenumber_position_profile",
    oracle=f"""
    SELECT CAST(l_linenumber AS BIGINT) AS linenumber,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum({_SQL_CENTS.format(c='l.l_quantity')}) AS DOUBLE)
                 / 100.0 / count(*), 6) AS avg_qty,
           round(CAST(sum({_SQL_CENTS.format(c='l.l_extendedprice')}) AS DOUBLE)
                 / 100.0 / count(*), 6) AS avg_price,
           round(CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) + 0.0 AS returned_share
    FROM lineitem l
    GROUP BY linenumber
    """,
)
def linenumber_position_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the Nth line of an order look different from the first?
    Per-linenumber volume / price / return profile — the positional
    bias probe a data-quality suite runs on any ordered child table.
    Single map-side-combined groupBy over a 7-value key."""
    li = _load(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return li.groupBy(
        F.col("l_linenumber").cast("long").alias("linenumber")
    ).agg(
        n.cast("long").alias("n"),
        F.round(F.sum(_cents("l_quantity")).cast("double") / 100.0 / n, 6).alias(
            "avg_qty"
        ),
        F.round(
            F.sum(_cents("l_extendedprice")).cast("double") / 100.0 / n, 6
        ).alias("avg_price"),
        (
            F.round(
                F.sum(
                    F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
                ).cast("double")
                / n,
                6,
            )
            + F.lit(0.0)
        ).alias("returned_share"),
    )


@query(
    "brand_peak_ship_month",
    oracle=f"""
    WITH bm AS (
        SELECT p.p_brand AS brand,
               CAST(month(l.l_shipdate) AS BIGINT) AS ship_month,
               CAST(sum({_SQL_REV}) AS DECIMAL(38,0)) AS rev
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY brand, ship_month
    ),
    win AS (
        SELECT brand, ship_month, rev,
               CAST(sum(rev) OVER (PARTITION BY brand) AS DECIMAL(38,0))
                   AS rev_total,
               row_number() OVER (
                   PARTITION BY brand ORDER BY rev DESC, ship_month ASC
               ) AS rn
        FROM bm
    )
    SELECT brand, ship_month AS peak_month,
           CAST(rev AS DOUBLE) / 1000000.0 AS peak_revenue,
           round(CAST(rev AS DOUBLE) / CAST(rev_total AS DOUBLE), 6) + 0.0
               AS peak_share
    FROM win WHERE rn = 1
    """,
)
def brand_peak_ship_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand peak shipping month and its share of brand revenue —
    the seasonality argmax (engine W4 winner kernel PARTITIONED by
    brand over the 25 x 12 month summary; total order by rev DESC,
    month ASC). One dim join + one two-key aggregate shuffle; the
    window runs over 300 summary rows."""
    li = _load(spark, sf_dir, "lineitem")
    part = _load(spark, sf_dir, "part")
    bm = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.month("l_shipdate").cast("long").alias("ship_month"),
        )
        .agg(F.sum(_rev_col()).cast("decimal(38,0)").alias("rev"))
    )
    w_tot = Window.partitionBy("brand")
    w_rank = Window.partitionBy("brand").orderBy(
        F.desc("rev"), F.asc("ship_month")
    )
    win = bm.select(
        "brand",
        "ship_month",
        "rev",
        F.sum("rev").over(w_tot).cast("decimal(38,0)").alias("rev_total"),
        F.row_number().over(w_rank).alias("rn"),
    )
    return win.where(F.col("rn") == 1).select(
        "brand",
        F.col("ship_month").alias("peak_month"),
        (F.col("rev").cast("double") / 1000000.0).alias("peak_revenue"),
        (
            F.round(
                F.col("rev").cast("double") / F.col("rev_total").cast("double"),
                6,
            )
            + F.lit(0.0)
        ).alias("peak_share"),
    )


# ---------------------------------------------------------------------------
# Trade-flow and balance audits
# ---------------------------------------------------------------------------


@query(
    "domestic_revenue_share",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum({_SQL_REV}) AS DOUBLE) / 1000000.0 AS revenue_total,
           CAST(sum(CASE WHEN c.c_nationkey = s.s_nationkey
                         THEN {_SQL_REV} ELSE 0 END) AS DOUBLE) / 1000000.0
               AS revenue_domestic,
           round(CAST(sum(CASE WHEN c.c_nationkey = s.s_nationkey
                               THEN {_SQL_REV} ELSE 0 END) AS DOUBLE)
                 / CAST(sum({_SQL_REV}) AS DOUBLE), 6) + 0.0
               AS domestic_share
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY order_year
    """,
)
def domestic_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of revenue where the customer's nation equals the
    supplier's nation, per order year — the domestic-vs-international
    flow split (TPC-H Q7's question folded to one indicator). Supplier
    and customer are broadcast dims; the only wide operation is the
    lineitem-orders fact join on orderkey, then a year groupBy with
    map-side combine. The indicator is evaluated per row so there is
    no pair-enumeration anywhere."""
    li = _load(spark, sf_dir, "lineitem")
    orders = _load(spark, sf_dir, "orders")
    cust = _load(spark, sf_dir, "customer")
    supp = _load(spark, sf_dir, "supplier")
    rev = _rev_col()
    j = (
        li.join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(supp.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == F.col("s_suppkey"),
        )
    )
    dom = F.when(F.col("c_nationkey") == F.col("s_nationkey"), rev).otherwise(
        F.lit(0)
    )
    out = j.groupBy(
        F.year("o_orderdate").cast("long").alias("order_year")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        (F.sum(rev).cast("double") / 1000000.0).alias("revenue_total"),
        (F.sum(dom).cast("double") / 1000000.0).alias("revenue_domestic"),
    )
    return out.select(
        "order_year",
        "n_lines",
        "revenue_total",
        "revenue_domestic",
        (
            F.round(F.col("revenue_domestic") / F.col("revenue_total"), 6)
            + F.lit(0.0)
        ).alias("domestic_share"),
    )


@query(
    "international_order_share",
    oracle="""
    WITH per_order AS (
        SELECT l.l_orderkey AS orderkey,
               count(DISTINCT s.s_nationkey) AS n_nations
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY orderkey
    )
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o.o_orderdate) AS BIGINT) AS order_month,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN p.n_nations > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_multi_nation,
           round(CAST(sum(CASE WHEN p.n_nations > 1 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) + 0.0 AS multi_share
    FROM per_order p JOIN orders o ON p.orderkey = o.o_orderkey
    GROUP BY order_year, order_month
    """,
)
def international_order_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of orders sourced from more than one supplier nation, per
    order month — the supply-chain complexity trend. supplier is a
    broadcast dim; COUNT(DISTINCT nation) per order is a 25-value
    distinct under a high-cardinality key (map-side partial distinct
    keeps the shuffle at one row per (order, nation) pair max 25);
    the month rollup then rides the orders join on the same orderkey
    partitioning."""
    li = _load(spark, sf_dir, "lineitem")
    supp = _load(spark, sf_dir, "supplier")
    orders = _load(spark, sf_dir, "orders")
    per_order = (
        li.join(
            F.broadcast(supp.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(F.countDistinct("s_nationkey").alias("n_nations"))
    )
    j = per_order.join(
        orders.select("o_orderkey", "o_orderdate"),
        per_order.orderkey == F.col("o_orderkey"),
    )
    multi = F.when(F.col("n_nations") > 1, 1).otherwise(0)
    out = j.groupBy(
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(multi).cast("long").alias("n_multi_nation"),
    )
    return out.select(
        "order_year",
        "order_month",
        "n_orders",
        "n_multi_nation",
        (
            F.round(
                F.col("n_multi_nation").cast("double") / F.col("n_orders"), 6
            )
            + F.lit(0.0)
        ).alias("multi_share"),
    )


@query(
    "nation_customer_supplier_balance",
    oracle="""
    WITH cc AS (
        SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_cust,
               CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS cust_bal_cents
        FROM customer GROUP BY nk
    ),
    ss AS (
        SELECT s_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_supp,
               CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS supp_bal_cents
        FROM supplier GROUP BY nk
    )
    SELECT n.n_name AS nation,
           coalesce(cc.n_cust, 0) AS n_customers,
           coalesce(ss.n_supp, 0) AS n_suppliers,
           CASE WHEN coalesce(ss.n_supp, 0) = 0 THEN NULL
                ELSE round(CAST(cc.n_cust AS DOUBLE) / ss.n_supp, 6) END
               AS customers_per_supplier,
           round(coalesce(cc.cust_bal_cents, 0) / 100.0, 2)
               AS customer_balance,
           round(coalesce(ss.supp_bal_cents, 0) / 100.0, 2)
               AS supplier_balance
    FROM nation n
    LEFT JOIN cc ON cc.nk = n.n_nationkey
    LEFT JOIN ss ON ss.nk = n.n_nationkey
    """,
)
def nation_customer_supplier_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Customers-per-supplier coverage ratio and account-balance totals
    per nation — the market-coverage dimension audit. Two independent
    25-row pre-aggregates (each map-side combined) left-joined onto the
    nation dim so nations with no suppliers still appear (NULL ratio,
    zero balances) — the left-join + zero-fill engine idiom (J5)."""
    cust = _load(spark, sf_dir, "customer")
    supp = _load(spark, sf_dir, "supplier")
    nation = _load(spark, sf_dir, "nation")
    cc = cust.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum(_cents("c_acctbal")).cast("long").alias("cust_bal_cents"),
    )
    ss = supp.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).cast("long").alias("n_supp"),
        F.sum(_cents("s_acctbal")).cast("long").alias("supp_bal_cents"),
    )
    j = (
        nation.select("n_nationkey", "n_name")
        .join(cc, F.col("nk") == F.col("n_nationkey"), "left")
        .drop("nk")
        .join(ss, F.col("nk") == F.col("n_nationkey"), "left")
        .drop("nk")
    )
    return j.select(
        F.col("n_name").alias("nation"),
        F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_customers"),
        F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_suppliers"),
        F.when(
            F.coalesce(F.col("n_supp"), F.lit(0)) == 0, F.lit(None)
        )
        .otherwise(
            F.round(F.col("n_cust").cast("double") / F.col("n_supp"), 6)
        )
        .alias("customers_per_supplier"),
        F.round(
            F.coalesce(F.col("cust_bal_cents"), F.lit(0)) / 100.0, 2
        ).alias("customer_balance"),
        F.round(
            F.coalesce(F.col("supp_bal_cents"), F.lit(0)) / 100.0, 2
        ).alias("supplier_balance"),
    )


@query(
    "acctbal_outliers_by_nation",
    oracle="""
    WITH c AS (
        SELECT c_nationkey AS nk,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal
        FROM customer
    ),
    stats AS (
        SELECT nk, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(bal) AS BIGINT) AS s,
               CAST(sum(bal * bal) AS DECIMAL(38,0)) AS ss
        FROM c GROUP BY nk
    ),
    z AS (
        SELECT c.nk, c.bal, stats.n,
               CAST(stats.s AS DOUBLE) / stats.n AS mean,
               sqrt((CAST(stats.ss AS DOUBLE)
                     - CAST(stats.s AS DOUBLE) * stats.s / stats.n)
                    / (stats.n - 1)) AS sd
        FROM c JOIN stats ON c.nk = stats.nk
        WHERE stats.n > 1
    )
    SELECT n.n_name AS nation,
           CAST(min(z.n) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN abs(z.bal - z.mean) > 2 * z.sd
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(CAST(sum(CASE WHEN abs(z.bal - z.mean) > 2 * z.sd
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / min(z.n), 6) + 0.0 AS outlier_share
    FROM z JOIN nation n ON z.nk = n.n_nationkey
    GROUP BY nation
    """,
)
def acctbal_outliers_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation count of customers whose balance sits more than two
    sample standard deviations from the nation mean — the balance-fraud
    screening pass. Moments are exact integer sums of cents (sum and
    sum-of-squares as BIGINT/DECIMAL so the mean and sd derive from
    exact integers — bit-deterministic across engines); the per-row
    z-test re-joins the 25-row stats table by broadcast, so the fact is
    scanned twice but shuffled only into 25-row aggregates."""
    cust = _load(spark, sf_dir, "customer")
    nation = _load(spark, sf_dir, "nation")
    c = cust.select(
        F.col("c_nationkey").alias("nk"), _cents("c_acctbal").alias("bal")
    )
    stats = c.groupBy("nk").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("bal").cast("long").alias("s"),
        F.sum((F.col("bal") * F.col("bal")).cast("decimal(38,0)")).alias("ss"),
    )
    z = c.join(F.broadcast(stats.where(F.col("n") > 1)), "nk").select(
        "nk",
        "bal",
        "n",
        (F.col("s").cast("double") / F.col("n")).alias("mean"),
        F.sqrt(
            (
                F.col("ss").cast("double")
                - F.col("s").cast("double") * F.col("s") / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("sd"),
    )
    is_out = F.when(
        F.abs(F.col("bal") - F.col("mean")) > 2 * F.col("sd"), 1
    ).otherwise(0)
    out = z.groupBy("nk").agg(
        F.min("n").cast("long").alias("n_customers"),
        F.sum(is_out).cast("long").alias("n_outliers"),
    )
    return out.join(
        F.broadcast(_load(spark, sf_dir, "nation")),
        F.col("nk") == F.col("n_nationkey"),
    ).select(
        F.col("n_name").alias("nation"),
        "n_customers",
        "n_outliers",
        (
            F.round(
                F.col("n_outliers").cast("double") / F.col("n_customers"), 6
            )
            + F.lit(0.0)
        ).alias("outlier_share"),
    )


@query(
    "negative_balance_share",
    oracle="""
    SELECT c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_negative,
           round(CAST(sum(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) + 0.0 AS negative_share,
           round(coalesce(sum(CASE WHEN c_acctbal < 0
                     THEN CAST(round(c_acctbal * 100) AS BIGINT)
                     ELSE 0 END), 0) / 100.0, 2) AS negative_balance_total
    FROM customer
    GROUP BY segment
    """,
)
def negative_balance_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share and total of negative account balances per market segment
    — the credit-exposure rollup (TPC-H Q22 keeps only positive
    balances; this audits the other side). One segment groupBy with
    conditional integer-cent sums; 5-row shuffle."""
    cust = _load(spark, sf_dir, "customer")
    neg = F.when(F.col("c_acctbal") < 0, 1).otherwise(0)
    neg_cents = F.when(
        F.col("c_acctbal") < 0, _cents("c_acctbal")
    ).otherwise(F.lit(0))
    return cust.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(neg).cast("long").alias("n_negative"),
        (
            F.round(F.sum(neg).cast("double") / F.count(F.lit(1)), 6)
            + F.lit(0.0)
        ).alias("negative_share"),
        F.round(
            F.coalesce(F.sum(neg_cents), F.lit(0)) / 100.0, 2
        ).alias("negative_balance_total"),
    )


@query(
    "region_parttype_affinity",
    oracle=f"""
    WITH rv AS (
        SELECT r.r_name AS region,
               string_split(p.p_type, ' ')[1] AS type_head,
               CAST(sum({_SQL_REV}) AS DECIMAL(38,0)) AS rev
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY region, type_head
    ),
    tot AS (
        SELECT CAST(sum(rev) AS DECIMAL(38,0)) AS grand FROM rv
    ),
    rt AS (
        SELECT region, CAST(sum(rev) AS DECIMAL(38,0)) AS region_rev
        FROM rv GROUP BY region
    ),
    gt AS (
        SELECT type_head, CAST(sum(rev) AS DECIMAL(38,0)) AS type_rev
        FROM rv GROUP BY type_head
    )
    SELECT rv.region, rv.type_head,
           CAST(rv.rev AS DOUBLE) / 1000000.0 AS revenue,
           round(CAST(rv.rev AS DOUBLE) / CAST(rt.region_rev AS DOUBLE), 6)
               + 0.0 AS region_share,
           round(CAST(gt.type_rev AS DOUBLE) / CAST(tot.grand AS DOUBLE), 6)
               + 0.0 AS global_share,
           round((CAST(rv.rev AS DOUBLE) / CAST(rt.region_rev AS DOUBLE))
                 / (CAST(gt.type_rev AS DOUBLE) / CAST(tot.grand AS DOUBLE)),
                 6) + 0.0 AS lift
    FROM rv
    JOIN rt ON rv.region = rt.region
    JOIN gt ON rv.type_head = gt.type_head
    CROSS JOIN tot
    """,
)
def region_parttype_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lift of each part-type family within each customer
    region vs its global share — the assortment-affinity matrix (do
    ASIAN customers over-index on PROMO parts?). One fact aggregation
    to the 5 x 6 (region, type-head) grid; the marginals and the grand
    total are re-aggregates of that 30-row summary (no second fact
    pass), joined back broadcast-small. Dim chain is all broadcast;
    the only wide join is lineitem-orders."""
    li = _load(spark, sf_dir, "lineitem")
    part = _load(spark, sf_dir, "part")
    orders = _load(spark, sf_dir, "orders")
    cust = _load(spark, sf_dir, "customer")
    nation = _load(spark, sf_dir, "nation")
    region = _load(spark, sf_dir, "region")
    j = (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(part.select("p_partkey", "p_type")),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    rv = (
        j.groupBy(
            F.col("r_name").alias("region"),
            F.split("p_type", " ").getItem(0).alias("type_head"),
        )
        .agg(F.sum(_rev_col()).cast("decimal(38,0)").alias("rev"))
        # four downstream consumers (rv/rt/gt/tot) must not re-run the
        # fact aggregation (the checkpoint-on-reuse rule, PLANS.md r10)
        .localCheckpoint(eager=False)
    )
    rt = rv.groupBy("region").agg(
        F.sum("rev").cast("decimal(38,0)").alias("region_rev")
    )
    gt = rv.groupBy("type_head").agg(
        F.sum("rev").cast("decimal(38,0)").alias("type_rev")
    )
    tot = rv.agg(F.sum("rev").cast("decimal(38,0)").alias("grand"))
    out = (
        rv.join(rt, "region")
        .join(gt, "type_head")
        .crossJoin(F.broadcast(tot))
    )
    region_share = F.col("rev").cast("double") / F.col("region_rev").cast(
        "double"
    )
    global_share = F.col("type_rev").cast("double") / F.col("grand").cast(
        "double"
    )
    return out.select(
        "region",
        "type_head",
        (F.col("rev").cast("double") / 1000000.0).alias("revenue"),
        (F.round(region_share, 6) + F.lit(0.0)).alias("region_share"),
        (F.round(global_share, 6) + F.lit(0.0)).alias("global_share"),
        (F.round(region_share / global_share, 6) + F.lit(0.0)).alias("lift"),
    )


# ---------------------------------------------------------------------------
# Order/supplier shape profiles
# ---------------------------------------------------------------------------


@query(
    "supplier_breadth_histogram",
    oracle="""
    WITH b AS (
        SELECT l_suppkey AS suppkey,
               count(DISTINCT l_partkey) AS n_parts,
               count(DISTINCT l_orderkey) AS n_orders
        FROM lineitem GROUP BY suppkey
    )
    SELECT CAST(floor(n_parts / 5) * 5 AS BIGINT) AS parts_bucket,
           CAST(count(*) AS BIGINT) AS n_suppliers,
           round(CAST(sum(n_orders) AS DOUBLE) / count(*), 6) AS avg_orders,
           CAST(min(n_parts) AS BIGINT) AS min_parts,
           CAST(max(n_parts) AS BIGINT) AS max_parts
    FROM b GROUP BY parts_bucket
    """,
)
def supplier_breadth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of supplier catalog breadth (distinct parts
    shipped, bucketed by 5) with the order-volume profile per bucket —
    the supply-base segmentation histogram. Two COUNT(DISTINCT) under
    the supplier key collapse in one aggregate (Spark plans a single
    expand + two-phase distinct; the shuffle is (supplier, part/order)
    pairs, then supplier rows); the bucket histogram is a re-aggregate
    of the supplier summary."""
    li = _load(spark, sf_dir, "lineitem")
    b = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )
    return b.groupBy(
        (F.floor(F.col("n_parts") / 5) * 5).cast("long").alias("parts_bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
        F.round(F.sum("n_orders").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_orders"
        ),
        F.min("n_parts").cast("long").alias("min_parts"),
        F.max("n_parts").cast("long").alias("max_parts"),
    )


@query(
    "ship_lag_by_weekday",
    oracle="""
    WITH lag AS (
        SELECT CAST(isodow(o.o_orderdate) - 1 AS BIGINT) AS order_weekday,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE)) AS lag_days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT order_weekday,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(CAST(sum(lag_days) AS DOUBLE) / count(*), 6) AS avg_lag_days,
           round(quantile_cont(CAST(lag_days AS DOUBLE), 0.50), 6) AS p50,
           round(quantile_cont(CAST(lag_days AS DOUBLE), 0.90), 6) AS p90
    FROM lag GROUP BY order_weekday
    """,
)
def ship_lag_by_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency profile by order weekday (Mon=0, the
    pinned cross-engine mapping: Spark weekday() vs DuckDB isodow()-1)
    — does a Friday order ship slower? Integer day lags sum exactly;
    the quantiles are the interpolated percentile fold over the 7-group
    aggregate (both engines interpolate identically on integer
    inputs)."""
    li = _load(spark, sf_dir, "lineitem")
    orders = _load(spark, sf_dir, "orders")
    lag = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        F.expr("weekday(o_orderdate)").cast("long").alias("order_weekday"),
        F.datediff("l_shipdate", "o_orderdate").alias("lag_days"),
    )
    return lag.groupBy("order_weekday").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.round(
            F.sum("lag_days").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_lag_days"),
        F.round(
            F.expr("percentile(CAST(lag_days AS DOUBLE), 0.50)"), 6
        ).alias("p50"),
        F.round(
            F.expr("percentile(CAST(lag_days AS DOUBLE), 0.90)"), 6
        ).alias("p90"),
    )


@query(
    "quantity_outlier_orders",
    oracle=f"""
    WITH per_order AS (
        SELECT l_orderkey AS orderkey,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum({_SQL_CENTS.format(c='l.l_quantity')}) AS BIGINT)
                   AS qty_cents
        FROM lineitem l GROUP BY orderkey
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(qty_cents) AS BIGINT) AS s,
               CAST(sum(qty_cents * qty_cents) AS DECIMAL(38,0)) AS ss
        FROM per_order
    )
    SELECT p.orderkey, p.n_lines,
           round(p.qty_cents / 100.0, 2) AS total_qty,
           round((p.qty_cents - CAST(st.s AS DOUBLE) / st.n)
                 / sqrt((CAST(st.ss AS DOUBLE)
                         - CAST(st.s AS DOUBLE) * st.s / st.n)
                        / (st.n - 1)), 6) + 0.0 AS z_score
    FROM per_order p CROSS JOIN stats st
    WHERE (p.qty_cents - CAST(st.s AS DOUBLE) / st.n)
          > 3 * sqrt((CAST(st.ss AS DOUBLE)
                      - CAST(st.s AS DOUBLE) * st.s / st.n)
                     / (st.n - 1))
    ORDER BY p.qty_cents DESC, p.orderkey ASC
    LIMIT 20
    """,
)
def quantity_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds the global mean by more than
    three sample standard deviations, top-20 by volume — the bulk-order
    anomaly screen. Global moments come from exact integer sums (one
    scalar aggregate broadcast back over the per-order summary: the A7
    agg + broadcast idiom, never a global window); ordering carries the
    orderkey tie-break."""
    li = _load(spark, sf_dir, "lineitem")
    per_order = li.groupBy(F.col("l_orderkey").alias("orderkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(_cents("l_quantity")).cast("long").alias("qty_cents"),
    )
    stats = per_order.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("qty_cents").cast("long").alias("s"),
        F.sum(
            (F.col("qty_cents") * F.col("qty_cents")).cast("decimal(38,0)")
        ).alias("ss"),
    )
    j = per_order.crossJoin(F.broadcast(stats))
    mean = F.col("s").cast("double") / F.col("n")
    sd = F.sqrt(
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n")
        )
        / (F.col("n") - 1)
    )
    return (
        j.where((F.col("qty_cents") - mean) > 3 * sd)
        .select(
            "orderkey",
            "n_lines",
            F.round(F.col("qty_cents") / 100.0, 2).alias("total_qty"),
            (F.round((F.col("qty_cents") - mean) / sd, 6) + F.lit(0.0)).alias(
                "z_score"
            ),
        )
        .orderBy(F.desc("total_qty"), F.asc("orderkey"))
        .limit(20)
    )


@query(
    "unit_price_retail_gap",
    oracle="""
    WITH g AS (
        SELECT p.p_brand AS brand,
               CAST(round((l.l_extendedprice / l.l_quantity
                           - p.p_retailprice) * 100) AS BIGINT) AS gap_cents
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_quantity > 0
    )
    SELECT brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(CAST(sum(gap_cents) AS DOUBLE) / 100.0 / count(*), 6) + 0.0
               AS avg_gap,
           round(CAST(sum(CASE WHEN gap_cents < 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*), 6) + 0.0 AS below_retail_share
    FROM g GROUP BY brand
    """,
)
def unit_price_retail_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized unit price vs catalog retail price per brand — the
    price-realization audit (negative gap = sold below list). The
    per-row gap is quantized to integer cents BEFORE aggregation
    (IEEE division then one deterministic round), so the group sums
    are exact integers on both engines; broadcast part join, one
    25-row groupBy."""
    li = _load(spark, sf_dir, "lineitem")
    part = _load(spark, sf_dir, "part")
    g = (
        li.where(F.col("l_quantity") > 0)
        .join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_retailprice")),
            li.l_partkey == F.col("p_partkey"),
        )
        .select(
            F.col("p_brand").alias("brand"),
            F.round(
                (
                    F.col("l_extendedprice") / F.col("l_quantity")
                    - F.col("p_retailprice")
                )
                * 100
            )
            .cast("bigint")
            .alias("gap_cents"),
        )
    )
    below = F.when(F.col("gap_cents") < 0, 1).otherwise(0)
    return g.groupBy("brand").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        (
            F.round(
                F.sum("gap_cents").cast("double") / 100.0 / F.count(F.lit(1)),
                6,
            )
            + F.lit(0.0)
        ).alias("avg_gap"),
        (
            F.round(F.sum(below).cast("double") / F.count(F.lit(1)), 6)
            + F.lit(0.0)
        ).alias("below_retail_share"),
    )
