"""Relational analytics over the TPC-H-ish tables.

Exercises the reference's aggregation/join/sort surface (SURVEY.md §2.3-2.8)
on lineitem/orders/customer/..., where the data volume actually stresses the
planner: multi-way joins, group-by-heavy scans, top-k.

Cross-engine float determinism: Spark and DuckDB accumulate double sums in
different orders, so raw SUM(double) can differ near rounding boundaries.
All money columns in the testdata sit exactly on a cent grid (verified:
max |x*100 - round(x*100)| < 1e-9), so sums are computed on exact integer
cents / basis points (BIGINT, or DECIMAL(38,0) where products overflow
int64) and converted to doubles with a single identical division at the
end — bit-exact on both engines. At 100 TB the same trick holds: decimal
accumulators never overflow and shuffle as fixed-width values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import catalog
from ..session import prep
from . import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prep(spark)
    return catalog.load(spark, sf_dir, name)


# Exact integer quantizations (same expression shape on both engines).
def _cents(col: str):  # money -> integer cents
    return F.round(F.col(col) * 100).cast("bigint")


def _bp(col: str):  # rate in [0,1] -> integer basis points
    return F.round(F.col(col) * 10000).cast("bigint")


_SQL_CENTS = "CAST(round({c} * 100) AS BIGINT)"
_SQL_BP = "CAST(round({c} * 10000) AS BIGINT)"


@query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
        sum({_SQL_CENTS.format(c='l_quantity')}) / 100.0 AS sum_qty,
        sum({_SQL_CENTS.format(c='l_extendedprice')}) / 100.0 AS sum_base_price,
        CAST(sum(CAST({_SQL_CENTS.format(c='l_extendedprice')}
                 * (10000 - {_SQL_BP.format(c='l_discount')}) AS DECIMAL(38,0)))
             AS DOUBLE) / 1000000.0 AS sum_disc_price,
        CAST(sum(CAST({_SQL_CENTS.format(c='l_extendedprice')}
                 * (10000 - {_SQL_BP.format(c='l_discount')})
                 * (10000 + {_SQL_BP.format(c='l_tax')}) AS DECIMAL(38,0)))
             AS DOUBLE) / 10000000000.0 AS sum_charge,
        round((sum({_SQL_CENTS.format(c='l_quantity')}) / 100.0) / count(*), 6) AS avg_qty,
        round((sum({_SQL_CENTS.format(c='l_extendedprice')}) / 100.0) / count(*), 6) AS avg_price,
        round((sum({_SQL_BP.format(c='l_discount')}) / 10000.0) / count(*), 6) AS avg_disc,
        count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single wide scan -> 2-key groupBy with 8 aggregates
    (reference A2/A5 family). Partial map-side aggregation makes this a
    single shuffle of n_groups rows at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    qc, pc = _cents("l_quantity"), _cents("l_extendedprice")
    db, tb = _bp("l_discount"), _bp("l_tax")
    base = li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date")).select(
        "l_returnflag",
        "l_linestatus",
        qc.alias("qc"),
        pc.alias("pc"),
        db.alias("db"),
        tb.alias("tb"),
        (pc * (10000 - db)).cast("decimal(38,0)").alias("disc_c"),
        (pc * (10000 - db) * (10000 + tb)).cast("decimal(38,0)").alias("charge_c"),
    )
    n = F.count(F.lit(1))
    return base.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum("qc") / 100.0).alias("sum_qty"),
        (F.sum("pc") / 100.0).alias("sum_base_price"),
        (F.sum("disc_c").cast("double") / 1000000.0).alias("sum_disc_price"),
        (F.sum("charge_c").cast("double") / 10000000000.0).alias("sum_charge"),
        F.round((F.sum("qc") / 100.0) / n, 6).alias("avg_qty"),
        F.round((F.sum("pc") / 100.0) / n, 6).alias("avg_price"),
        F.round((F.sum("db") / 10000.0) / n, 6).alias("avg_disc"),
        n.alias("count_order"),
    )


_REVENUE_SQL = (
    f"CAST(sum(CAST({_SQL_CENTS.format(c='l_extendedprice')}"
    f" * (10000 - {_SQL_BP.format(c='l_discount')}) AS DECIMAL(38,0)))"
    " AS DOUBLE) / 1000000.0"
)


def _revenue_col() -> F.Column:
    expr = (_cents("l_extendedprice") * (10000 - _bp("l_discount"))).cast(
        "decimal(38,0)"
    )
    return expr


def _revenue_col_long() -> F.Column:
    """Revenue term as a plain BIGINT — the codegen fast path (DECIMAL(38,0)
    aggregation runs on Int128 off the whole-stage fast path and showed up
    as the data/duck 1.6-1.7x residual on the Q3/Q10 rollups at the 10x
    tier, PLANS.md r9 floor table). Per-row bound: cents <= ~1e9 * 1e4 bp
    = 1e13, so a SUM only overflows past ~9e5 rows per group at the
    largest realistic prices — safe wherever the group is an ORDER
    (lines-per-order is bounded small) or a per-order partial rollup
    (orders-per-customer ~10 at every TPC-H SF); the unbounded-group
    aggregates (pricing_summary's flag-level sums, nation-level Q5/Q7)
    keep the DECIMAL(38,0) form."""
    return _cents("l_extendedprice") * (10000 - _bp("l_discount"))


@query(
    "top_unshipped_orders",
    oracle=f"""
    SELECT o.o_orderkey,
           {_REVENUE_SQL} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1998-01-01'
      AND l.l_shipdate > DATE '1998-01-01'
    GROUP BY o.o_orderkey, orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join -> grouped revenue -> top-k
    (reference O3 top-k + J-family). The revenue ordering key is an exact
    integer sum, so the top-k cut is deterministic across engines; the
    orderkey tie-break makes it total.

    Lineitem is pre-aggregated to per-order revenue BEFORE touching
    orders: the grouping key (o_orderkey) is functionally determined by
    the join key, so folding the sum below the join shrinks the join
    input from line-level to order-level rows, the aggregation gets
    map-side combine on the narrow (orderkey, revenue) pair, and the
    orders join reuses the groupBy's hash(orderkey) partitioning — at
    100 TB only orders re-exchanges, never lineitem twice. The final
    grouped-then-sorted top-k becomes a plain TakeOrderedAndProject."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("date")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("date")
    )
    per_order = li.groupBy("l_orderkey").agg(
        (F.sum(_revenue_col_long()).cast("double") / 1000000.0).alias("revenue")
    )
    building = o.join(c, o.o_custkey == c.c_custkey, "left_semi")
    return (
        per_order.join(building, per_order.l_orderkey == building.o_orderkey)
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


@query(
    "region_nation_revenue",
    oracle=f"""
    SELECT n.n_name, {_REVENUE_SQL} AS revenue, count(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate < DATE '1998-01-01'
    GROUP BY n.n_name
    """,
)
def region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join fact->dims with a region filter (reference
    J10/J12 dimension attaches). nation/region are broadcast — at 100 TB the
    only shuffles are lineitem⋈orders and ⋈customer on their keys."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            (F.sum(_revenue_col()).cast("double") / 1000000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "priority_order_counts",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_customers
    FROM orders
    WHERE strftime(o_orderdate, '%Y-%m-%d')
          IN ('1997-03-01', '1997-03-02', '1997-03-03', '1997-03-04',
              '1997-03-05', '1997-03-06', '1997-03-07')
       OR year(o_orderdate) = 2000
    GROUP BY o_orderpriority
    """,
)
def priority_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-IN-list predicate (P6: ntl_queries.py:107 STRFTIME-IN) + count
    aggregates, P6's formatted-date membership kept deliberately."""
    o = _t(spark, sf_dir, "orders")
    days = [f"1997-03-{d:02d}" for d in range(1, 8)]
    return (
        o.where(
            F.date_format("o_orderdate", "yyyy-MM-dd").isin(days)
            | (F.year("o_orderdate") == 2000)
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


@query(
    "scalar_function_suite",
    oracle="""
    SELECT p_partkey,
        concat(p_brand, ':', p_type) AS brand_type,
        substring(p_name, 1, 8) AS name_prefix,
        lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        length(p_name) AS name_len,
        least(p_retailprice, 500.0) AS price_capped,
        greatest(CAST(p_size AS BIGINT), 25) AS size_floor,
        CASE WHEN p_size >= 25 THEN 'big' ELSE 'small' END AS size_class,
        CAST(ceil(p_retailprice) AS DOUBLE) AS price_ceil,
        round(sqrt(p_retailprice), 6) AS price_sqrt,
        round(pow(abs(p_retailprice - 500.0), 2), 4) AS dev_sq,
        CAST(p_size AS DOUBLE) / 10 AS size_scaled
    FROM part
    WHERE substring(p_brand, 1, 6) = 'Brand#'
      AND substring(p_type, 1, 2) <> 'XX'
    """,
)
def scalar_function_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's scalar-function families in one projection (SURVEY
    §2.8): concat, substring-slice prefixes (P10/P11), lpad zero-pad
    (IndexingHomeAgebs.py:125-126), least/greatest, length, CASE, ceil,
    sqrt, pow(abs(x),2) (RadiusOfGyrationHandler.py:225), casts."""
    p = _t(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    return p.where(
        (F.substring("p_brand", 1, 6) == "Brand#")
        & (F.substring("p_type", 1, 2) != "XX")
    ).select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.least(price, F.lit(500.0)).alias("price_capped"),
        F.greatest(F.col("p_size").cast("bigint"), F.lit(25).cast("bigint")).alias(
            "size_floor"
        ),
        F.when(F.col("p_size") >= 25, "big").otherwise("small").alias("size_class"),
        F.ceil(price).cast("double").alias("price_ceil"),
        F.round(F.sqrt(price), 6).alias("price_sqrt"),
        F.round(F.pow(F.abs(price - 500.0), F.lit(2)), 4).alias("dev_sq"),
        (F.col("p_size").cast("double") / 10).alias("size_scaled"),
    )


@query(
    "supplier_balance_rollup",
    oracle="""
    SELECT n.n_name,
           round(avg(s.s_acctbal), 6) + 0.0 AS avg_bal,
           round(coalesce(stddev_samp(s.s_acctbal), 0.0), 6) AS std_bal,
           count(*) AS n_suppliers
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def supplier_balance_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVG+STDDEV grouped rollup (A5: RGAggregatorByMun.py:85-96) over a
    broadcast dimension join. stddev is sample-variant on both engines;
    NULL (n=1 groups) coalesced to 0 for hash stability."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            (F.round(F.avg("s_acctbal"), 6) + F.lit(0.0)).alias("avg_bal"),
            F.round(F.coalesce(F.stddev_samp("s_acctbal"), F.lit(0.0)), 6).alias(
                "std_bal"
            ),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )


@query(
    "late_shipment_orders",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE year(o.o_orderdate) = 1997
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS over lineitem per order (reference J2 semi
    idiom at TPC-H scale), then grouped counts.

    Single-pass plan (r10: the old form joined orders twice — once to
    derive late keys, once as a left_semi): EXISTS(l_shipdate >
    o_orderdate + 90) is MAX(flag) per order because o_orderdate is
    constant within the order, so one lineitem⋈orders-1997 join (the
    year filter makes the orders side a broadcast at bench scale; at
    100 TB it's one keyed shuffle), a per-(order, priority) max — whose
    hash(o_orderkey) exchange Catalyst reuses from the join — and a
    priority-cardinality rollup. Lineitem is touched once, orders once,
    and the only wide exchange carries one flag-bit row per matched
    line pre-combined to order cardinality."""
    o = _t(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1997)
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    late_flag = F.when(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90), 1
    ).otherwise(0)
    per_order = j.groupBy("o_orderkey", "o_orderpriority").agg(
        F.max(late_flag).alias("late")
    )
    return (
        per_order.where(F.col("late") == 1)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "customer_order_distribution",
    oracle="""
    SELECT n_orders, count(*) AS n_customers
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join preserving order-less customers,
    then an aggregation OF an aggregation (count histogram). count(col)
    skips NULLs on both engines, so empty customers land in bucket 0."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "top_return_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, {_REVENUE_SQL} AS lost_revenue,
           count(*) AS n_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY lost_revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def top_return_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-items revenue per customer, top-20 with an
    exact-integer ordering key + custkey tie-break.

    Two-level pre-aggregation: lineitem folds to per-order partials
    (exact DECIMAL cents + item count) before the orders join, so the
    join input shrinks from line-level to order-level and the groupBy's
    hash(orderkey) partitioning is reused by the join — only orders
    re-exchanges. The per-customer rollup then sums order-level partials
    (sum-of-sums and count-of-counts are exact), and the TOP-20 CUT
    HAPPENS BEFORE the customer dimension attaches: the ordering key
    (lost_revenue, custkey) exists pre-join, so TakeOrderedAndProject
    runs on the customer-cardinality rollup and the name join touches
    exactly 20 rows — broadcast by construction at ANY scale, where
    joining first would shuffle the full customer dimension at 100 TB
    for 20 survivors."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(_revenue_col_long()).alias("rev_part"),
        F.count(F.lit(1)).alias("cnt_part"),
    )
    per_cust = (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            (F.sum("rev_part").cast("double") / 1000000.0).alias("lost_revenue"),
            F.sum("cnt_part").alias("n_items"),
        )
    )
    top = (
        per_cust.orderBy(F.desc("lost_revenue"), F.asc("o_custkey"))
        .limit(20)
    )
    return (
        c.join(F.broadcast(top), top.o_custkey == c.c_custkey)
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .select("c_custkey", "c_name", "lost_revenue", "n_items")
    )


_VS_A = ("NATION_1", "NATION_2", "NATION_3", "NATION_4")
_VS_B = ("NATION_5", "NATION_6", "NATION_7", "NATION_8")


def _sql_in(names: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{n}'" for n in names) + ")"


@query(
    "volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           {_REVENUE_SQL} AS revenue, count(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer cu ON o.o_custkey = cu.c_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON cu.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name IN {_sql_in(_VS_A)} AND n2.n_name IN {_sql_in(_VS_B)})
        OR (n1.n_name IN {_sql_in(_VS_B)} AND n2.n_name IN {_sql_in(_VS_A)}))
      AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
)
def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the nation dimension joined in TWO roles (supplier
    side and customer side) with a disjunctive cross-dimension predicate —
    the join-order stress the single-role star queries don't exercise.
    The disjunction couples the two sides, so Catalyst cannot split it
    into per-side pushdowns — but its UNION (each side's nation must be
    in A∪B) IS per-side derivable, and this plan applies that derived
    filter to supplier and customer BEFORE the fact joins, resolving the
    25-row nation dim at plan build into key-literal isin filters plus a
    key->name literal map (zero nation joins in the plan): both
    dimension sides shrink to the relevant nations (x(25/4) at any
    TPC-H scale) and arrive already named; the cross-side disjunction
    survives as the only post-join filter. At 100 TB the exchanges are
    lineitem⋈orders and ⋈(pre-filtered customer) — the customer side
    6x smaller before it shuffles. The ship-date range IS pushed to the
    lineitem scan. Floor probe: 9 stages -> 8, idle ratio 1.99 (was the
    one new >2x entrant in the round-9 A/B samples)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    a, b = list(_VS_A), list(_VS_B)
    both = set(a + b)
    # the nation dim is 25 rows by the TPC-H spec — resolve it ONCE at
    # plan build (the knn_bruteforce literal-resolution precedent) into
    # key-literal filters + a key->name literal map, so the plan carries
    # ZERO nation joins: both dimension sides arrive pre-filtered to the
    # relevant nations and already named
    nrows = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name").collect()
    keys = [r["n_nationkey"] for r in nrows if r["n_name"] in both]
    name_map = F.create_map(
        *[
            F.lit(x)
            for r in nrows
            if r["n_name"] in both
            for x in (r["n_nationkey"], r["n_name"])
        ]
    )
    s = _t(spark, sf_dir, "supplier").where(
        F.col("s_nationkey").isin(keys)
    ).withColumn("supp_nation", name_map[F.col("s_nationkey")])
    cu = _t(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isin(keys)
    ).withColumn("cust_nation", name_map[F.col("c_nationkey")])
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cu, o.o_custkey == cu.c_custkey)
        .where(
            (F.col("supp_nation").isin(a) & F.col("cust_nation").isin(b))
            | (F.col("supp_nation").isin(b) & F.col("cust_nation").isin(a))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            (F.sum(_revenue_col()).cast("double") / 1000000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "promo_revenue_share",
    oracle=f"""
    SELECT round(
        100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST({_SQL_CENTS.format(c='l.l_extendedprice')}
                      * (10000 - {_SQL_BP.format(c='l.l_discount')})
                      AS DECIMAL(38,0)) ELSE 0 END) AS DOUBLE)
        / CAST(sum(CAST({_SQL_CENTS.format(c='l.l_extendedprice')}
                 * (10000 - {_SQL_BP.format(c='l.l_discount')})
                 AS DECIMAL(38,0))) AS DOUBLE),
        6) AS promo_pct,
        count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1997-01-01'
      AND l.l_shipdate < DATE '1997-04-01'
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation (CASE inside SUM) over a
    fact⋈dim join collapsing to one scalar row — the promotion-revenue
    ratio. The part dimension broadcasts; both sums accumulate in exact
    DECIMAL(38,0) micro-cents and the ratio divides the two exact sums as
    doubles once at the end, rounded on both engines."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = _revenue_col()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(38,0)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "small_quantity_revenue",
    oracle=f"""
    WITH pa AS (
        SELECT l_partkey,
               sum({_SQL_CENTS.format(c='l_quantity')}) AS sq,
               count(*) AS n
        FROM lineitem GROUP BY l_partkey
    )
    SELECT count(*) AS n_items,
           sum({_SQL_CENTS.format(c='l.l_extendedprice')}) / 700.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_brand IN ('Brand#13', 'Brand#4', 'Brand#2')
      AND 2 * {_SQL_CENTS.format(c='l.l_quantity')} * pa.n < pa.sq
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: the correlated scalar subquery ("quantity below
    half this part's average") — but NOT decorrelated into the aggregate
    + join-back the oracle spells out (two fact passes, one over the FULL
    fact). Because brand is a part attribute, every lineitem of a
    brand-filtered part survives the brand filter, so the per-part
    aggregate computed as a WINDOW over the brand-pruned fact equals the
    full-fact per-part aggregate for every surviving row: broadcast the
    filtered parts, one shuffle on l_partkey for the window, filter,
    scalar agg. One fact scan of ~|brands|/|all| of the data instead of a
    full-fact aggregate plus join-back — the asymmetry that matters when
    lineitem is 100 TB. The threshold predicate is pure INTEGER
    arithmetic (2·qty_cents·n < sum_cents ⇔ qty < avg/2), so the
    half-average knife-edge cannot flip on float summation order."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    qc = _cents("l_quantity")
    p = _t(spark, sf_dir, "part").where(
        F.col("p_brand").isin("Brand#13", "Brand#4", "Brand#2")
    )
    w = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .withColumn("sq", F.sum(qc).over(w))
        .withColumn("n", F.count(F.lit(1)).over(w))
        .where(F.lit(2) * qc * F.col("n") < F.col("sq"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(_cents("l_extendedprice")) / 700.0).alias("avg_yearly"),
        )
    )


@query(
    "discounted_brand_revenue",
    oracle=f"""
    SELECT p.p_brand, count(*) AS n_items, {_REVENUE_SQL} AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 40)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 20 AND 50
           AND l.l_quantity BETWEEN 20 AND 50)
    GROUP BY p.p_brand
    """,
)
def discounted_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR of per-branch conjunctions that couple BOTH
    join sides (brand+size on part, quantity on lineitem). Catalyst
    extracts the single-side residues it CAN push — the brand IN-set and
    size range reach the part scan, the quantity hull reaches lineitem —
    while the cross-side coupling stays a post-join filter; the dimension
    side broadcasts. The disjunctive-predicate shape none of the other
    TPC-H queries exercise."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    branch = (
        ((F.col("p_brand") == "Brand#13") & sz.between(1, 15) & q.between(1, 20))
        | ((F.col("p_brand") == "Brand#4") & sz.between(10, 30) & q.between(10, 40))
        | ((F.col("p_brand") == "Brand#2") & sz.between(20, 50) & q.between(20, 50))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(branch)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(_revenue_col()).cast("double") / 1000000.0).alias("revenue"),
        )
    )


@query(
    "forecast_revenue",
    oracle=f"""
    SELECT CAST(sum(CAST({_SQL_CENTS.format(c='l_extendedprice')}
                    * {_SQL_BP.format(c='l_discount')} AS DECIMAL(38,0)))
                AS DOUBLE) / 1000000.0 AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND {_SQL_BP.format(c='l_discount')} BETWEEN 500 AND 700
      AND l_quantity < 24
    """,
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-predicate aggregate — every filter
    (date range, discount band, quantity cap) is single-column and pushes
    to the parquet scan, so the plan is scan -> map-side partial sum ->
    one scalar row. The discount band compares in exact integer basis
    points so the band edges cut identically on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    db = _bp("l_discount")
    rev = (_cents("l_extendedprice") * db).cast("decimal(38,0)")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & db.between(500, 700)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(rev).cast("double") / 1000000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "nation_market_share",
    oracle=f"""
    WITH base AS (
        SELECT year(o.o_orderdate) AS o_year,
               CAST({_SQL_CENTS.format(c='l.l_extendedprice')}
                    * (10000 - {_SQL_BP.format(c='l.l_discount')})
                    AS DECIMAL(38,0)) AS rev_c,
               ns.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation nc ON c.c_nationkey = nc.n_nationkey
        JOIN region r ON nc.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation ns ON s.s_nationkey = ns.n_nationkey
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_2'
                               THEN rev_c ELSE 0 END) AS DOUBLE)
                 / CAST(sum(rev_c) AS DOUBLE), 6) AS mkt_share
    FROM base GROUP BY o_year
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: the widest star join in the set — fact -> orders ->
    customer -> nation -> region on the demand side AND supplier -> nation
    on the supply side (nation in TWO roles, like Q7) plus the part filter,
    then a conditional-share aggregate per order year. All five dimension
    sides broadcast; the fact shuffles once for the year groupBy. The
    share is a ratio of exact integer sums rounded identically."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region")
    )
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), c.c_nationkey == F.col("nc_key"))
        .join(F.broadcast(r), F.col("nc_region") == r.r_regionkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == F.col("ns_key"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            _revenue_col().alias("rev_c"),
            "supp_nation",
        )
    )
    target = F.when(F.col("supp_nation") == "NATION_2", F.col("rev_c")).otherwise(
        F.lit(0).cast("decimal(38,0)")
    )
    return base.groupBy("o_year").agg(
        F.round(
            F.sum(target).cast("double") / F.sum("rev_c").cast("double"), 6
        ).alias("mkt_share")
    )


@query(
    "top_revenue_supplier",
    oracle=f"""
    WITH srev AS (
        SELECT l_suppkey, {_REVENUE_SQL} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, sr.total_revenue
    FROM supplier s JOIN srev sr ON s.s_suppkey = sr.l_suppkey
    WHERE sr.total_revenue = (SELECT max(total_revenue) FROM srev)
    """,
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: an aggregate VIEW consumed twice — once for the
    global max (scalar subquery) and once to select the winners. The
    per-supplier revenue is computed ONCE and the scalar max attaches as a
    broadcast cross join (the origin-scalar idiom; a window over an
    unpartitioned frame would collapse to one task). The equality compares
    exact integer-derived revenue, so "the" max is unambiguous."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    srev = li.groupBy("l_suppkey").agg(
        (F.sum(_revenue_col()).cast("double") / 1000000.0).alias("total_revenue")
    )
    mx = srev.agg(F.max("total_revenue").alias("__mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        srev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "large_volume_customers",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           {_SQL_CENTS.format(c='o.o_totalprice')} / 100.0 AS totalprice,
           sum({_SQL_CENTS.format(c='l.l_quantity')}) / 100.0 AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum({_SQL_CENTS.format(c='l_quantity')}) > 25000
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, orderdate, totalprice
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: an IN-subquery over a grouped HAVING. The SQL
    formulation (kept verbatim in the oracle) scans the fact twice — once
    for the qualifying orderkeys, once to re-aggregate the survivors.
    Because the final grouping is per-order and the customer/order columns
    are functionally dependent on the orderkey, the re-aggregation IS the
    HAVING aggregation: aggregate lineitem ONCE to (orderkey, sum_qty),
    filter > threshold there, and attach orders + customer to the tiny
    qualifying set afterwards. One fact pass, one shuffle, and the dims
    join output-sized rows — the plan that matters when lineitem is the
    100 TB side. Quantities sum in exact integer cents."""
    li = _t(spark, sf_dir, "lineitem")
    qc = _cents("l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qc).alias("__sq"))
        .where(F.col("__sq") > 25000)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    # the qualifying set is the SMALL side both times: broadcast it into
    # orders, then broadcast the (still output-sized) result into customer
    qualified = o.join(F.broadcast(big), big.l_orderkey == o.o_orderkey)
    return (
        c.join(F.broadcast(qualified), qualified.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            (_cents("o_totalprice") / 100.0).alias("totalprice"),
            (F.col("__sq") / 100.0).alias("sum_qty"),
        )
    )


@query(
    "sole_late_suppliers",
    oracle="""
    WITH late AS (
        SELECT DISTINCT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    ),
    multi AS (
        SELECT l_orderkey FROM (
            SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
        ) GROUP BY l_orderkey HAVING count(*) > 1
    )
    SELECT s.s_name, count(*) AS numwait
    FROM late t
    JOIN multi m ON t.l_orderkey = m.l_orderkey
    JOIN supplier s ON t.l_suppkey = s.s_suppkey
    WHERE NOT EXISTS (
        SELECT 1 FROM late t2
        WHERE t2.l_orderkey = t.l_orderkey AND t2.l_suppkey <> t.l_suppkey
    )
    GROUP BY s.s_name
    """,
)
def sole_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted to this schema's dates: "late" =
    shipped >90 days after the order date): suppliers who were the ONLY
    late shipper on a multi-supplier order. The two correlated EXISTS /
    NOT EXISTS of Q21 decorrelate into one left-semi (order has other
    suppliers) and one left-anti (no OTHER late supplier on the order) on
    the same deduped (order, supplier) lateness table — the anti join
    compares a two-column key against an inequality on the second, which
    rewrites as: orders with exactly one distinct late supplier."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    multi = (
        li.select("l_orderkey", "l_suppkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("__ns"))
        .where(F.col("__ns") > 1)
        .select("l_orderkey")
    )
    sole_late = (
        late.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("__nl"), F.max("l_suppkey").alias("l_suppkey"))
        .where(F.col("__nl") == 1)
        .select("l_orderkey", "l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        sole_late.join(multi, "l_orderkey", "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "idle_rich_customers",
    oracle="""
    WITH cutoff AS (
        SELECT CAST(round(avg(CAST(round(c_acctbal * 100) AS BIGINT)), 6)
                    AS DOUBLE) AS avg_bal_c
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey,
           count(*) AS numcust,
           sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) / 100.0 AS totacctbal
    FROM customer c CROSS JOIN cutoff
    WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) > cutoff.avg_bal_c
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= DATE '2000-01-01'
      )
    GROUP BY c.c_nationkey
    """,
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: nationkey stands in for the phone-prefix
    country code this schema lacks): account balances above the global
    positive-balance average (scalar subquery -> broadcast cross join)
    for customers with NO recent orders (NOT EXISTS -> left-anti against
    the date-filtered orders — the filter pushes below the anti join so
    the build side is only recent orders). Balances compare in exact
    integer cents against the rounded average."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("date")
    )
    bc = _cents("c_acctbal")
    cutoff = c.where(F.col("c_acctbal") > 0).agg(
        F.round(F.avg(bc), 6).alias("avg_bal_c")
    )
    return (
        c.crossJoin(F.broadcast(cutoff))
        .where(bc > F.col("avg_bal_c"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(bc) / 100.0).alias("totacctbal"),
        )
    )


@query(
    "min_cost_part_supplier",
    oracle="""
    WITH cost AS (
        SELECT l.l_partkey, l.l_suppkey,
               min(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cost_c
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_type = 'STANDARD' AND p.p_size <= 10
        GROUP BY l.l_partkey, l.l_suppkey
    )
    SELECT c.l_partkey AS p_partkey, p.p_name, s.s_name, n.n_name,
           c.cost_c / 100.0 AS best_cost
    FROM cost c
    JOIN part p ON p.p_partkey = c.l_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE c.cost_c = (
        SELECT min(c2.cost_c) FROM cost c2 WHERE c2.l_partkey = c.l_partkey
    )
    """,
)
def min_cost_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the min-cost-supplier-per-part CORRELATED scalar
    subquery (``WHERE cost = (SELECT min(cost) ... WHERE same part)``),
    decorrelated the Spark-first way: the per-(part, supplier) cost
    aggregate is computed once, then the per-part minimum attaches as a
    WINDOW over the already part-partitioned aggregate — zero extra joins
    and zero extra shuffles for the decorrelation (the oracle spells the
    correlated form so the rewrite is differentially checked). The part
    filter broadcasts and prunes the fact BEFORE the aggregate, so the
    shuffle carries only surviving (part, supplier) groups; supplier and
    nation attach as broadcast dims. Costs compare in exact integer cents —
    a min-equality knife-edge can't flip on float noise. All min-ties are
    emitted (identically on both engines), keeping output deterministic
    without an arbitrary pick."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cost = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey", "p_name")
        .agg(F.min(_cents("l_extendedprice")).alias("cost_c"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        cost.withColumn("best_c", F.min("cost_c").over(w))
        .where(F.col("cost_c") == F.col("best_c"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "s_name",
            "n_name",
            (F.col("cost_c") / 100.0).alias("best_cost"),
        )
    )


@query(
    "part_value_concentration",
    oracle="""
    WITH pv AS (
        SELECT l.l_partkey,
               sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS value_c
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_regionkey = 0
        GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey, value_c / 100.0 AS part_value
    FROM pv
    WHERE value_c > (SELECT CAST(sum(value_c) AS DOUBLE) / count(*) FROM pv)
    """,
)
def part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-group value vs a FRACTION OF THE GLOBAL total
    (``HAVING sum(v) > (SELECT sum(v) * f FROM ...)``) — the
    group-vs-global decorrelation pattern. The global total is the sum of
    the per-part sums, so the plan computes the per-part aggregate ONCE
    and feeds it to both sides: the scalar total crossJoin-broadcasts back
    onto the same aggregate (the engine's W1 idiom, plans/mobility.py:83)
    and ReuseExchange dedups the underlying shuffle — one fact scan, one
    shuffle, never a second pass over lineitem. Region filter reaches the
    fact through two broadcast dims. Values accumulate in exact cents;
    the threshold is the GLOBAL MEAN share (sum/count), which is
    scale-free by construction: TPC-H's own Q11 scales its fraction as
    0.0001/SF because any FIXED fraction degenerates as the part
    population grows — the round-9 registry-wide degeneracy audit
    (tools/audit_degeneracy.py) caught exactly that here (194/107/0 rows
    at sf0.001/0.01/0.1 under the old fixed 0.1%). Mean-share compares
    one exact-bigint-derived double cross-engine-identically."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_regionkey") == 0)
    pv = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(_cents("l_extendedprice")).alias("value_c"))
    )
    total = pv.agg(
        (F.sum("value_c").cast("double") / F.count(F.lit(1))).alias("__thr")
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .where(F.col("value_c") > F.col("__thr"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value_c") / 100.0).alias("part_value"),
        )
    )


@query(
    "dominant_part_shippers",
    oracle="""
    WITH ps AS (
        SELECT l.l_partkey, l.l_suppkey,
               sum(CAST(round(l.l_quantity * 100) AS BIGINT)) AS qty_c
        FROM lineitem l
        WHERE l.l_shipdate >= DATE '1997-01-01'
          AND l.l_shipdate < DATE '1998-01-01'
          AND l.l_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
          )
        GROUP BY l.l_partkey, l.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
        SELECT ps.l_suppkey FROM ps
        WHERE 2 * ps.qty_c > (
            SELECT sum(p2.qty_c) FROM ps p2 WHERE p2.l_partkey = ps.l_partkey
        )
    )
    """,
)
def dominant_part_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the NESTED SEMI-JOIN CHAIN — suppliers IN
    (aggregated shippers of parts IN (name-prefixed parts) whose shipped
    quantity beats a correlated per-part threshold). Decorrelated
    bottom-up: the part-name prefix semi-join becomes a broadcast
    LEFT SEMI pruning the fact scan; the per-(part, supplier) aggregate
    shuffles once on its own keys; the correlated per-part total attaches
    as a window over that same partitioning (no re-shuffle — part is a
    prefix of the aggregate keys); the outer IN becomes a left-semi of
    supplier against the distinct dominant shippers. 'Dominant' compares
    2·qty > part_total in exact integer centi-units, so the half-share
    knife-edge is float-proof. At 100 TB the only wide exchange is the
    (part, supplier) aggregate over the date+prefix-pruned fact."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_name").startswith("small"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    ps = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_cents("l_quantity")).alias("qty_c"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        ps.withColumn("part_total_c", F.sum("qty_c").over(w))
        .where(F.lit(2) * F.col("qty_c") > F.col("part_total_c"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
    )


@query(
    "order_value_median",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.25)
                 / 100.0, 6) AS p25,
           round(quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5)
                 / 100.0, 6) AS median_value,
           round(quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.75)
                 / 100.0, 6) AS p75,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def order_value_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-group quartiles of order value (continuous interpolation)
    — the robust-statistics counterpart to the mean-based reports. The
    quantile input is integer cents, so rank positions are unambiguous and
    the single linear interpolation (a + (b-a)·frac on at-most-one cent
    gap) is the same IEEE arithmetic on both engines. Exact percentile
    needs the group's values together — one shuffle on the 5-value
    priority key; the approx_percentile sketch variant
    (approx_device_stats) is the documented swap when groups stop
    fitting an executor."""
    o = _t(spark, sf_dir, "orders")
    pc = _cents("o_totalprice")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile(pc, F.lit(0.25)) / 100.0, 6).alias("p25"),
        F.round(F.percentile(pc, F.lit(0.5)) / 100.0, 6).alias("median_value"),
        F.round(F.percentile(pc, F.lit(0.75)) / 100.0, 6).alias("p75"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "orders_monthly_trend",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
           o_orderstatus,
           count(*) AS n_orders,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
    FROM orders
    GROUP BY date_trunc('month', o_orderdate), o_orderstatus
    """,
)
def orders_monthly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month × status time-series rollup — the calendar-bucketed trend
    report (reference A2 family on the orders fact). date_trunc is a
    scalar projection so the groupBy map-side-combines into at most
    months×statuses rows; the month formats to a string so the compare
    is timezone-representation-proof. Revenue in exact cents."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "month"
            ),
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(_cents("o_totalprice")) / 100.0).alias("revenue"),
        )
    )


@query(
    "part_catalog_grouping_sets",
    oracle="""
    SELECT p_type, p_size, count(*) AS n_parts,
           sum(CAST(round(p_retailprice * 100) AS BIGINT)) / 100.0
               AS retail_total
    FROM part
    GROUP BY GROUPING SETS ((p_type, p_size), (p_type), (p_size))
    """,
)
def part_catalog_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the generalization ROLLUP/CUBE specialize):
    the (type, size) matrix plus BOTH one-dimensional margins in a single
    pass — CUBE minus the grand total, a set CUBE can't express without a
    post-filter. Spark expands the sets map-side (each input row feeds
    every set's partial aggregate), so it stays one shuffle of
    Σ|set-cardinalities| rows. Aggregated-away dimensions surface as
    NULLs identically on both engines (no NULL-valued data in these
    columns to collide with)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.groupingSets(
            [["p_type", "p_size"], ["p_type"], ["p_size"]],
            "p_type",
            "p_size",
        )
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            (F.sum(_cents("p_retailprice")) / 100.0).alias("retail_total"),
        )
    )


@query(
    "part_supplier_census",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_size IN (1, 7, 14, 21, 28, 35, 42, 49)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def part_supplier_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can serve each
    (brand, type, size) bucket, excluding flagged suppliers (negative
    balance stands in for Q16's complaints subquery; lineitem stands in
    for partsupp, which this schema folds into the fact). The NOT IN
    decorrelates to a broadcast left-anti on the tiny flagged-supplier
    list — the one decorrelation family (anti-join under a grouped
    distinct-count) the suite didn't yet pin with an oracle. Plan: size
    filter prunes part early, part broadcasts into the fact, the anti
    join is map-side, then one shuffle for the grouped distinct count."""
    p = _t(spark, sf_dir, "part").where(
        F.col("p_size").isin([1, 7, 14, 21, 28, 35, 42, 49])
    )
    li = _t(spark, sf_dir, "lineitem")
    flagged = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(F.broadcast(flagged), "l_suppkey", "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "ship_latency_histogram",
    oracle="""
    SELECT CAST(floor(date_diff('day', CAST(o.o_orderdate AS DATE),
                                CAST(l.l_shipdate AS DATE)) / 30.0)
                AS BIGINT) AS latency_bucket,
           count(*) AS n_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY latency_bucket
    """,
)
def ship_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency histogram in 30-day buckets — the fulfilment
    SLA report (reference A-family aggregate over a J-family join). The
    lineitem⋈orders join runs on the orderkey spine (exchange-free over
    the keyed cache / bucketed layout), then one tiny-key count groupBy;
    the bucket is floor(days/30.0) — double floor division, identical
    IEEE on both engines, negative-safe."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    days = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.floor(days / 30.0).cast("bigint").alias("latency_bucket"))
        .groupBy("latency_bucket")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )


@query(
    "orders_backlog_depth",
    oracle="""
    WITH closed AS (
        SELECT l_orderkey, max(l_shipdate) AS closed_at
        FROM lineitem GROUP BY l_orderkey
    ),
    om AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               count(*) AS n_opened
        FROM orders GROUP BY month
    ),
    cm AS (
        SELECT strftime(date_trunc('month', closed_at), '%Y-%m') AS month,
               count(*) AS n_closed
        FROM closed GROUP BY month
    ),
    months AS (SELECT month FROM om UNION SELECT month FROM cm),
    j AS (
        SELECT months.month,
               CAST(coalesce(om.n_opened, 0) AS BIGINT) AS n_opened,
               CAST(coalesce(cm.n_closed, 0) AS BIGINT) AS n_closed
        FROM months
        LEFT JOIN om ON om.month = months.month
        LEFT JOIN cm ON cm.month = months.month
    )
    SELECT month, n_opened, n_closed,
           CAST(sum(n_opened - n_closed) OVER (
               ORDER BY month ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog
    FROM j
    """,
)
def orders_backlog_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time: per month, orders opened, orders fully
    shipped (close = max ship date over the order's lines, computed
    exchange-free on the orderkey spine), and the running net backlog —
    the as-of inventory-depth analytic (a cumulative window over an
    ALREADY-AGGREGATED month dimension, so the 'global' running sum is
    ~80 rows at any fact scale; orders with no lines simply never close).
    Month string is the unique sort key; every value an exact BIGINT."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    month = lambda c: F.date_format(F.date_trunc("month", F.col(c)), "yyyy-MM")  # noqa: E731
    closed = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("closed_at"))
    om = o.groupBy(month("o_orderdate").alias("month")).agg(
        F.count(F.lit(1)).alias("n_opened")
    )
    cm = closed.groupBy(month("closed_at").alias("month")).agg(
        F.count(F.lit(1)).alias("n_closed")
    )
    j = (
        om.join(cm, "month", "full")
        .select(
            "month",
            F.coalesce("n_opened", F.lit(0)).cast("bigint").alias("n_opened"),
            F.coalesce("n_closed", F.lit(0)).cast("bigint").alias("n_closed"),
        )
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return j.select(
        "month",
        "n_opened",
        "n_closed",
        F.sum(F.col("n_opened") - F.col("n_closed")).over(w).cast("bigint").alias(
            "backlog"
        ),
    )


@query(
    "customer_repeat_rate",
    oracle="""
    WITH pc AS (
        SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
    )
    SELECT count(*) AS n_customers,
           CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_repeat,
           round(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) * 1.0 / count(*),
                 6) AS repeat_rate
    FROM pc
    """,
)
def customer_repeat_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase rate: share of ordering customers with >= 2 orders
    (the retention scalar next to the cohort matrix). One map-side-combined
    count per customer, one scalar rollup; the rate is a ratio of exact
    integers."""
    o = _t(spark, sf_dir, "orders")
    pc = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    rep = F.sum(F.when(F.col("n") >= 2, 1).otherwise(0))
    return pc.agg(
        F.count(F.lit(1)).alias("n_customers"),
        rep.cast("bigint").alias("n_repeat"),
        F.round(rep * 1.0 / F.count(F.lit(1)), 6).alias("repeat_rate"),
    )


@query(
    "part_price_band_census",
    oracle="""
    SELECT p_brand,
           CAST(floor(CAST(round(p_retailprice * 100) AS BIGINT)
                      / 100000.0) AS BIGINT) AS price_band,
           count(*) AS n_parts,
           min(CAST(round(p_retailprice * 100) AS BIGINT)) / 100.0
               AS min_price,
           max(CAST(round(p_retailprice * 100) AS BIGINT)) / 100.0
               AS max_price
    FROM part GROUP BY p_brand, price_band
    """,
)
def part_price_band_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog price-band census per brand (1000-unit bands on exact
    integer cents): count + exact min/max band prices. Map-only banding,
    one small-key groupBy; (p_brand, price_band) is the unique key and
    every float is one exact-cents division."""
    p = _t(spark, sf_dir, "part")
    pc = _cents("p_retailprice")
    return (
        p.select(
            "p_brand",
            F.floor(pc / 100000.0).cast("bigint").alias("price_band"),
            pc.alias("__pc"),
        )
        .groupBy("p_brand", "price_band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            (F.min("__pc") / 100.0).alias("min_price"),
            (F.max("__pc") / 100.0).alias("max_price"),
        )
    )


@query(
    "order_lines_distribution",
    oracle="""
    WITH per AS (
        SELECT l_orderkey, count(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT n_lines, count(*) AS n_orders
    FROM per GROUP BY n_lines
    """,
)
def order_lines_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lines-per-order histogram (the fact-table fan-out profile that
    sizes the orderkey join): per-order line count runs EXCHANGE-FREE on
    the orderkey spine (keyed cache / bucketed layout), then one
    tiny-key histogram; all integers, n_lines is the unique key."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .groupBy("n_lines")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "supplier_load_balance",
    oracle="""
    WITH per AS (
        SELECT l_suppkey, count(*) AS n_items
        FROM lineitem GROUP BY l_suppkey
    ),
    mx AS (SELECT CAST(max(n_items) AS BIGINT) AS mx FROM per)
    SELECT p.l_suppkey AS s_suppkey, p.n_items,
           round(p.n_items * 1.0 / m.mx, 6) AS load_share
    FROM per p CROSS JOIN mx m
    """,
)
def supplier_load_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier load-balance report: each supplier's lineitem volume as a
    fraction of the hottest supplier's — the skew scorecard for a
    supplier-keyed shuffle (the engine's salting decision input, as a
    query). One count groupBy + the max as a scalar-agg broadcast
    crossJoin (the W1 idiom); the share is a ratio of exact integers."""
    li = _t(spark, sf_dir, "lineitem")
    per = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.count(F.lit(1)).alias("n_items")
    )
    mx = per.agg(F.max("n_items").cast("bigint").alias("mx"))
    return per.crossJoin(F.broadcast(mx)).select(
        "s_suppkey",
        "n_items",
        F.round(F.col("n_items") * 1.0 / F.col("mx"), 6).alias("load_share"),
    )


@query(
    "orders_weekday_profile",
    oracle="""
    SELECT CAST(isodow(o_orderdate) - 1 AS INTEGER) AS weekday,
           o_orderpriority,
           count(*) AS n_orders
    FROM orders
    GROUP BY weekday, o_orderpriority
    """,
)
def orders_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order volume by weekday × priority — pins the cross-engine weekday
    mapping, the classic date-part portability trap: Spark's weekday()
    is 0=Monday while DuckDB's dayofweek() is 0=Sunday, so the oracle
    uses isodow()-1 (1=Monday ISO, shifted) to land on the identical
    0=Monday..6=Sunday convention. One map-only extract + tiny-key
    count groupBy; (weekday, o_orderpriority) is the unique key."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.expr("weekday(o_orderdate)").cast("int").alias("weekday"),
            "o_orderpriority",
        )
        .groupBy("weekday", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "orders_quarter_growth",
    oracle="""
    WITH q AS (
        SELECT strftime(date_trunc('quarter', o_orderdate), '%Y-%m')
                   AS quarter,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM orders GROUP BY quarter
    )
    SELECT quarter, rev_c / 100.0 AS revenue,
           round((rev_c - lag(rev_c) OVER (ORDER BY quarter)) * 1.0
                 / lag(rev_c) OVER (ORDER BY quarter), 6) AS qoq_growth
    FROM q
    """,
)
def orders_quarter_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarter-over-quarter revenue growth — the trend report over the
    coarse calendar truncation (quarter) with a lag-ratio window. The
    'global' window runs over the ~27-row quarter dimension, never the
    fact; revenue accumulates as exact integer cents so the growth ratio
    is one identical IEEE division (NULL for the first quarter on both
    engines)."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    q = o.groupBy(
        F.date_format(F.date_trunc("quarter", F.col("o_orderdate")), "yyyy-MM")
        .alias("quarter")
    ).agg(F.sum(_cents("o_totalprice")).cast("bigint").alias("rev_c"))
    w = Window.orderBy("quarter")
    prev = F.lag("rev_c").over(w)
    return q.select(
        "quarter",
        (F.col("rev_c") / 100.0).alias("revenue"),
        F.round((F.col("rev_c") - prev) * 1.0 / prev, 6).alias("qoq_growth"),
    )


@query(
    "brand_type_revenue_rank",
    oracle="""
    WITH r AS (
        SELECT p.p_brand, p.p_type,
               CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand, p.p_type
    )
    SELECT p_brand, p_type, rev_c / 100.0 AS revenue,
           CAST(dense_rank() OVER (
               PARTITION BY p_brand ORDER BY rev_c DESC
           ) AS INTEGER) AS rnk
    FROM r
    """,
)
def brand_type_revenue_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue league table per brand: p_types dense-ranked by exact-cents
    gross revenue within each brand — the dense_rank window family (equal
    values share a rank with no gaps; deterministic on exact integers
    without a tie-break, unlike row_number). part broadcasts into the
    fact, one (brand, type) aggregate, one small window."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    r = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.sum(_cents("l_extendedprice")).cast("bigint").alias("rev_c"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("rev_c"))
    return r.select(
        "p_brand",
        "p_type",
        (F.col("rev_c") / 100.0).alias("revenue"),
        F.dense_rank().over(w).cast("int").alias("rnk"),
    )


@query(
    "fulfillment_lag_by_priority",
    oracle="""
    WITH lat AS (
        SELECT o.o_orderpriority,
               CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                              CAST(l.l_shipdate AS DATE)) AS BIGINT)
                   AS lag_days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           count(*) AS n_items,
           round(sum(lag_days) * 1.0 / count(*), 6) AS avg_lag_days,
           round(quantile_cont(lag_days, 0.5), 6) AS median_lag_days
    FROM lat GROUP BY o_orderpriority
    """,
)
def fulfillment_lag_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfilment SLA by priority class: mean and exact median
    order-to-ship lag — does URGENT actually ship faster? The join runs
    exchange-free on the orderkey spine; the lag is exact integer days,
    so the mean is one exact division and the median interpolates over
    integers identically on both engines; one shuffle on the 5-value
    priority key."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    lag_days = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    ).cast("bigint")
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority", lag_days.alias("lag_days")
    )
    n = F.count(F.lit(1))
    return lat.groupBy("o_orderpriority").agg(
        n.alias("n_items"),
        F.round(F.sum("lag_days") * 1.0 / n, 6).alias("avg_lag_days"),
        F.round(F.percentile("lag_days", F.lit(0.5)), 6).alias(
            "median_lag_days"
        ),
    )


@query(
    "first_order_cohort_value",
    oracle="""
    WITH firsts AS (
        SELECT o_custkey,
               min(o_orderdate) AS first_date
        FROM orders GROUP BY o_custkey
    ),
    fo AS (
        SELECT f.o_custkey,
               strftime(date_trunc('quarter', f.first_date), '%Y-%m')
                   AS cohort,
               min(CAST(round(o.o_totalprice * 100) AS BIGINT))
                   AS first_value_c
        FROM firsts f
        JOIN orders o ON o.o_custkey = f.o_custkey
                     AND o.o_orderdate = f.first_date
        GROUP BY f.o_custkey, cohort
    )
    SELECT cohort,
           count(*) AS n_customers,
           round(sum(first_value_c) / 100.0 / count(*), 6)
               AS avg_first_value
    FROM fo GROUP BY cohort
    """,
)
def first_order_cohort_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition-cohort quality: customers grouped by the quarter of
    their FIRST order, with the average first-order value — the
    first-touch analytic (argmin-by-date then aggregate by cohort).
    Ties on the first date resolve to the MIN price on both engines
    (deterministic without an order-key tie-break); the first-date
    lookup is a self-join back on (custkey, date) against the min-date
    aggregate, one shuffle each side on custkey; money stays exact
    integer cents until the single final division."""
    o = _t(spark, sf_dir, "orders")
    firsts = o.groupBy(F.col("o_custkey").alias("__ck")).agg(
        F.min("o_orderdate").alias("first_date")
    )
    fo = (
        firsts.join(
            o,
            (F.col("o_custkey") == F.col("__ck"))
            & (F.col("o_orderdate") == F.col("first_date")),
        )
        .groupBy(
            "__ck",
            F.date_format(F.date_trunc("quarter", "first_date"), "yyyy-MM").alias(
                "cohort"
            ),
        )
        .agg(F.min(_cents("o_totalprice")).alias("first_value_c"))
    )
    n = F.count(F.lit(1))
    return fo.groupBy("cohort").agg(
        n.alias("n_customers"),
        F.round(F.sum("first_value_c") / 100.0 / n, 6).alias(
            "avg_first_value"
        ),
    )


@query(
    "segment_value_matrix",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(floor(CAST(round(o.o_totalprice * 100) AS BIGINT)
                      / 5000000.0) AS BIGINT) AS value_band,
           count(*) AS n_orders
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment, value_band
    """,
)
def segment_value_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-segment × order-value-band census (50k-unit bands on exact
    cents) — the demand-mix matrix. customer broadcasts into orders,
    banding is exact-integer floor division, one tiny-key groupBy;
    (c_mktsegment, value_band) is the unique key."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    band = F.floor(_cents("o_totalprice") / 5000000.0).cast("bigint")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_mktsegment", band.alias("value_band"))
        .groupBy("c_mktsegment", "value_band")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "supplier_nation_summary",
    oracle="""
    SELECT n.n_name,
           count(*) AS n_suppliers,
           min(CAST(round(s.s_acctbal * 100) AS BIGINT)) / 100.0
               AS min_balance,
           max(CAST(round(s.s_acctbal * 100) AS BIGINT)) / 100.0
               AS max_balance,
           round(sum(CAST(round(s.s_acctbal * 100) AS BIGINT)) / 100.0
                 / count(*), 6) AS avg_balance
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    """,
)
def supplier_nation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier census per nation with exact-cents balance statistics —
    the supply-side dimension profile (the supplier table's only other
    coverage is as a join leg). Broadcast dim attach + one small groupBy;
    min/max/avg all derive from exact integer cents."""
    s = _t(spark, sf_dir, "supplier")
    nt = _t(spark, sf_dir, "nation")
    bc = _cents("s_acctbal")
    n = F.count(F.lit(1))
    return (
        s.join(F.broadcast(nt), s.s_nationkey == nt.n_nationkey)
        .groupBy("n_name")
        .agg(
            n.alias("n_suppliers"),
            (F.min(bc) / 100.0).alias("min_balance"),
            (F.max(bc) / 100.0).alias("max_balance"),
            F.round(F.sum(bc) / 100.0 / n, 6).alias("avg_balance"),
        )
    )


@query(
    "region_revenue_share",
    oracle=f"""
    WITH rr AS (
        SELECT r.r_name,
               CAST(sum(CAST({_SQL_CENTS.format(c='l.l_extendedprice')}
                        * (10000 - {_SQL_BP.format(c='l.l_discount')})
                        AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS rev
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    ),
    tot AS (SELECT CAST(sum(rev) AS DECIMAL(38,0)) AS t FROM rr)
    SELECT rr.r_name,
           CAST(rr.rev AS DOUBLE) / 1000000.0 AS revenue,
           round(CAST(rr.rev AS DOUBLE) / CAST(tot.t AS DOUBLE), 6)
               AS revenue_share
    FROM rr CROSS JOIN tot
    """,
)
def region_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each region's share of global discounted revenue — the two-level
    rollup (group total + grand total) expressed as a 5-row aggregate
    crossJoined with its own scalar sum, NOT a window over the fact: the
    share computation touches 5 rows regardless of fact size. Revenue
    accumulates exactly in DECIMAL(38,0) micro-cents; both the share and
    the revenue convert to double with one identical division."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rr = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.sum(_revenue_col()).cast("decimal(38,0)").alias("rev"))
        # consumed by the total AND the final select: without a
        # checkpoint the 5-table join + aggregation runs twice
        # (plan_audit lead, r10: scans 10 -> 5)
        .localCheckpoint(eager=False)
    )
    tot = rr.agg(F.sum("rev").cast("decimal(38,0)").alias("t"))
    return rr.crossJoin(F.broadcast(tot)).select(
        "r_name",
        (F.col("rev").cast("double") / 1000000.0).alias("revenue"),
        F.round(
            F.col("rev").cast("double") / F.col("t").cast("double"), 6
        ).alias("revenue_share"),
    )


@query(
    "nation_year_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(
               {_SQL_CENTS.format(c='l_extendedprice')}
                   * (10000 - {_SQL_BP.format(c='l_discount')})
               - {_SQL_CENTS.format(c='p_retailprice')}
                   * {_SQL_CENTS.format(c='l_quantity')} * 100
           AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-line profit by supplier nation and year;
    reference has no partsupp table, so p_retailprice stands in for
    ps_supplycost — same plan topology: fact x 3 broadcast dims + the
    orderkey spine). Q9 is the classic star-join profit rollup; the
    decorrelation-free shape here is ONE pass over lineitem: the
    orders join rides the keyed-cache orderkey partitioning
    (exchange-free, tests/test_keyed_cache.py), part/supplier/nation
    broadcast, and the (nation, year) groupBy map-side-combines to
    nations x years rows. Profit accumulates exactly in DECIMAL(38,0)
    micro-dollar units (cents x basis points), one identical double
    division at the end — the same cross-engine determinism contract
    as _revenue_col."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    amount = (
        _cents("l_extendedprice") * (10000 - _bp("l_discount"))
        - _cents("p_retailprice") * _cents("l_quantity") * 100
    ).cast("decimal(38,0)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            (F.sum(amount).cast("double") / 1000000.0).alias("profit"),
        )
    )


@query(
    "returnflag_priority_counts",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def returnflag_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (this schema has no l_shipmode/receiptdate, so
    l_returnflag categorizes and l_shipdate bounds the year) — the
    conditional-aggregation pattern: one fact join, then CASE-based
    split counts per category, the SQL idiom for pivoting a binary
    attribute without a second pass. With Q12 in place every one of the
    22 TPC-H query shapes has an adapted, oracle-certified counterpart
    here. The orderkey join rides the keyed-cache partitioning
    (exchange-free); the year filter pushes to the scan; the groupBy
    map-side-combines to |returnflags| rows. Counts are exact integers
    on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


BASKET_MIN_ORDERS = 2
BASKET_TOP_K = 30


@query(
    "part_basket_pairs",
    oracle=f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_orders
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
    )
    SELECT part_a, part_b, n_orders
    FROM pairs WHERE n_orders >= {BASKET_MIN_ORDERS}
    ORDER BY n_orders DESC, part_a ASC, part_b ASC
    LIMIT {BASKET_TOP_K}
    """,
)
def part_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence mining: the top part PAIRS by number of
    distinct orders containing both — the support-counting kernel of
    frequent-itemset mining (the recommender/affinity report every retail
    warehouse runs on its order fact). Plan: distinct (order, part) once,
    then a WITHIN-ORDER self-join — the pair explosion is bounded by
    C(order_size, 2) (TPC-H orders hold <= 7 lines, so ~21 pairs/order:
    linear in the fact, never parts-squared), a pair-keyed count that
    map-side-combines, a support gate, and a k-bounded
    TakeOrderedAndProject. At 100 TB the same plan holds because the join
    key is the order key — co-partitioned with the keyed cache/bucketing
    layout — and a pathological mega-order is capped by a per-order line
    limit before the pair join."""
    li = _t(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = op.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= BASKET_MIN_ORDERS)
        .orderBy(
            F.col("n_orders").desc(),
            F.col("part_a").asc(),
            F.col("part_b").asc(),
        )
        .limit(BASKET_TOP_K)
    )


@query(
    "part_size_price_regression",
    oracle=f"""
    WITH s AS (
        SELECT CAST(p_size AS BIGINT) AS x,
               {_SQL_CENTS.format(c='p_retailprice')} AS y
        FROM part
    ),
    m AS (
        SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x*y) AS sxy, sum(x*x) AS sxx
        FROM s
    )
    SELECT CAST(n AS BIGINT) AS n_parts,
           round(CAST(n*sxy - sx*sy AS DOUBLE)
                 / CAST(n*sxx - sx*sx AS DOUBLE) / 100.0, 6)
               AS slope_per_size,
           round((CAST(sy AS DOUBLE)
                  - CAST(n*sxy - sx*sy AS DOUBLE)
                    / CAST(n*sxx - sx*sx AS DOUBLE)
                    * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) / 100.0, 6)
               AS intercept_dollars
    FROM m
    """,
)
def part_size_price_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed ordinary least squares — price-vs-size regression over
    the part catalog (the does-size-drive-price audit; the same one-pass
    moment-sum kernel fits ANY y-on-x at 100 TB). Exact integer moments
    (size, cents) accumulate in DECIMAL(38,0) — the products-of-sums
    overflow discipline from colocation_assortativity — then slope and
    intercept are each ONE double expression, so both engines divide the
    same exact integers. Map-side-combined scalar aggregate: the fact
    reduces to five numbers however many parts exist."""
    p = _t(spark, sf_dir, "part")
    dec = "decimal(38,0)"
    s = p.select(
        F.col("p_size").cast("long").alias("x"),
        _cents("p_retailprice").alias("y"),
    )
    m = s.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    return m.select(
        F.col("n").cast("bigint").alias("n_parts"),
        F.round(slope / 100.0, 6).alias("slope_per_size"),
        F.round(intercept / 100.0, 6).alias("intercept_dollars"),
    )


@query(
    "nation_trade_balance",
    oracle=f"""
    WITH sup AS (
        SELECT n.n_name AS nation,
               CAST(sum(CAST({_SQL_CENTS.format(c='l.l_extendedprice')}
                    * (10000 - {_SQL_BP.format(c='l.l_discount')})
                    AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS supply_revenue
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        GROUP BY n.n_name
    ),
    dem AS (
        SELECT n.n_name AS nation,
               sum({_SQL_CENTS.format(c='o.o_totalprice')}) / 100.0
                   AS demand_spend
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name
    )
    SELECT coalesce(s.nation, d.nation) AS nation,
           coalesce(s.supply_revenue, 0.0) AS supply_revenue,
           coalesce(d.demand_spend, 0.0) AS demand_spend,
           round(coalesce(s.supply_revenue, 0.0)
                 - coalesce(d.demand_spend, 0.0), 6) AS balance
    FROM sup s FULL OUTER JOIN dem d ON d.nation = s.nation
    """,
)
def nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-fact reconciliation: per nation, revenue SUPPLIED (lineitem
    through supplier) vs demand SPENT (orders through customer), with the
    net balance — the cross-fact consistency report a warehouse runs to
    catch pipeline drift between independently-loaded facts. Each side is
    a broadcast-dim star aggregate over its own fact (no fact-fact join);
    the FULL OUTER join runs on the 25-row nation aggregates. Exact-cents
    sums; balance subtracts two identically-derived doubles."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    sup = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            (F.sum(_revenue_col()).cast("double") / 1000000.0).alias(
                "supply_revenue"
            )
        )
    )
    dem = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg((F.sum(_cents("o_totalprice")) / 100.0).alias("demand_spend"))
    )
    return (
        sup.join(dem, "nation", "full_outer")
        .select(
            "nation",
            F.coalesce("supply_revenue", F.lit(0.0)).alias("supply_revenue"),
            F.coalesce("demand_spend", F.lit(0.0)).alias("demand_spend"),
            F.round(
                F.coalesce("supply_revenue", F.lit(0.0))
                - F.coalesce("demand_spend", F.lit(0.0)),
                6,
            ).alias("balance"),
        )
    )


@query(
    "customer_ltv_deciles",
    oracle=f"""
    WITH spend AS (
        SELECT o_custkey, sum({_SQL_CENTS.format(c='o_totalprice')}) AS cents
        FROM orders GROUP BY o_custkey
    ),
    tiled AS (
        SELECT o_custkey, cents,
               ntile(10) OVER (ORDER BY cents ASC, o_custkey ASC) AS decile
        FROM spend
    )
    SELECT decile,
           count(*) AS n_customers,
           min(cents) / 100.0 AS min_spend,
           max(cents) / 100.0 AS max_spend,
           sum(cents) / 100.0 AS total_spend
    FROM tiled GROUP BY decile
    """,
)
def customer_ltv_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value deciles: per-customer exact-cents spend,
    ntile(10) banding, and per-band boundaries + totals — the LTV
    segmentation report behind every retention/marketing split. ntile's
    bin edges depend only on row ORDER, so the window order carries the
    custkey tie-break (the ntile-totality rule, DETERMINISM.md) and both
    engines band identically even on tied spends. One customer-keyed
    aggregate, one global-order window over customer-sized (not
    fact-sized) rows — at 100 TB the window input is |customers| and a
    range-partitioned sort; the decile aggregate is 10 rows."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(_cents("o_totalprice")).alias("cents")
    )
    w = Window.orderBy(F.col("cents").asc(), F.col("o_custkey").asc())
    return (
        spend.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.min("cents") / 100.0).alias("min_spend"),
            (F.max("cents") / 100.0).alias("max_spend"),
            (F.sum("cents") / 100.0).alias("total_spend"),
        )
    )


@query(
    "inventory_value_abc",
    oracle=f"""
    WITH pr AS (
        SELECT l_partkey,
               sum(CAST({_SQL_CENTS.format(c='l_extendedprice')}
                   * (10000 - {_SQL_BP.format(c='l_discount')})
                   AS HUGEINT)) AS rev
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT l_partkey, rev,
               sum(rev) OVER (
                   ORDER BY rev DESC, l_partkey ASC ROWS UNBOUNDED PRECEDING
               ) AS cum,
               sum(rev) OVER () AS total
        FROM pr
    ),
    banded AS (
        SELECT CASE WHEN cum * 100 <= total * 80 THEN 'A'
                    WHEN cum * 100 <= total * 95 THEN 'B'
                    ELSE 'C' END AS band,
               rev, total
        FROM ranked
    )
    SELECT band, count(*) AS n_parts,
           CAST(sum(rev) AS DOUBLE) / 1000000.0 AS band_revenue,
           round(CAST(sum(rev) AS DOUBLE) / CAST(max(total) AS DOUBLE), 6)
               AS revenue_share
    FROM banded GROUP BY band
    """,
)
def inventory_value_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by lifetime revenue,
    banded at the classic 80%/95% cumulative cuts — the Pareto report
    every inventory planner starts from (A parts get daily counts, C
    parts annual). The band cut is EXACT integer cross-multiplication
    (cum·100 <= total·80 on decimal revenue units) so a part exactly on
    a boundary lands identically on both engines; the running share is
    one part-keyed window ordered by (rev, partkey) — totally ordered,
    so the cumulative sum is deterministic. Window input is part-sized,
    not fact-sized."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(F.sum(_revenue_col()).alias("rev"))
    w = Window.orderBy(F.col("rev").desc(), F.col("l_partkey").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = pr.select(
        "rev",
        F.sum("rev").over(w).alias("cum"),
        F.sum("rev").over(wt).alias("total"),
    )
    band = (
        F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
        .otherwise("C")
    )
    return (
        ranked.select(band.alias("band"), "rev", "total")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            (F.sum("rev").cast("double") / 1000000.0).alias("band_revenue"),
            F.round(
                F.sum("rev").cast("double") / F.max("total").cast("double"), 6
            ).alias("revenue_share"),
        )
    )


@query(
    "supplier_herfindahl",
    oracle=f"""
    WITH sr AS (
        SELECT s.s_nationkey,
               sum(CAST({_SQL_CENTS.format(c='l.l_extendedprice')}
                   * (10000 - {_SQL_BP.format(c='l.l_discount')})
                   AS HUGEINT)) AS rev
        FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
        GROUP BY l.l_suppkey, s.s_nationkey
    )
    SELECT n.n_name AS nation,
           count(*) AS n_suppliers,
           round(CAST(sum(rev * rev) AS DOUBLE)
                 / (CAST(sum(rev) AS DOUBLE) * CAST(sum(rev) AS DOUBLE)),
                 6) AS hhi
    FROM sr JOIN nation n ON n.n_nationkey = sr.s_nationkey
    GROUP BY n.n_name
    """,
)
def supplier_herfindahl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration audit: the Herfindahl-Hirschman index of
    supplier revenue within each nation (1/n = perfectly even, 1.0 =
    monopoly) — the supply-risk metric a procurement team tracks. HHI
    = sum(rev_i^2)/total^2 assembles entirely from EXACT integer
    revenue sums (decimal accumulators; rev^2 is the products-of-sums
    frontier again) with one double division at the end. Two aggregates:
    supplier-keyed revenue, then nation-keyed moment sums — both
    map-side combined, broadcast nation dim."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    sr = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("l_suppkey", "s_nationkey")
        .agg(F.sum(_revenue_col()).alias("rev"))
    )
    return (
        sr.join(F.broadcast(n), sr.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(
                F.sum(F.col("rev") * F.col("rev")).cast("double")
                / (
                    F.sum("rev").cast("double")
                    * F.sum("rev").cast("double")
                ),
                6,
            ).alias("hhi"),
        )
    )


@query(
    "customer_nation_pareto",
    oracle=f"""
    WITH spend AS (
        SELECT c.c_nationkey, o.o_custkey,
               sum({_SQL_CENTS.format(c='o.o_totalprice')}) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY c.c_nationkey, o.o_custkey
    ),
    ranked AS (
        SELECT c_nationkey, cents,
               row_number() OVER (
                   PARTITION BY c_nationkey
                   ORDER BY cents DESC, o_custkey ASC
               ) AS rn,
               count(*) OVER (PARTITION BY c_nationkey) AS n_cust
        FROM spend
    )
    SELECT n.n_name AS nation,
           CAST(max(n_cust) AS BIGINT) AS n_customers,
           sum(cents) / 100.0 AS total_spend,
           sum(CASE WHEN rn * 5 <= n_cust THEN cents ELSE 0 END) / 100.0
               AS top20_spend,
           round(sum(CASE WHEN rn * 5 <= n_cust THEN cents ELSE 0 END)
                 * 1.0 / sum(cents), 6) AS top20_share
    FROM ranked JOIN nation n ON n.n_nationkey = ranked.c_nationkey
    GROUP BY n.n_name
    """,
)
def customer_nation_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration per market: the revenue share held by the top
    20% of customers in each nation — the 80/20 check behind account
    prioritization. The top-20% membership is EXACT integer arithmetic
    (rank·5 <= n, no float fraction), the rank order carries the custkey
    tie-break, and spends are exact cents; one customer-keyed aggregate,
    one nation-partitioned window over customer-sized rows, one
    25-row rollup with the broadcast nation dim."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    spend = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum(_cents("o_totalprice")).alias("cents"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("cents").desc(), F.col("o_custkey").asc()
    )
    wc = Window.partitionBy("c_nationkey")
    ranked = spend.select(
        "c_nationkey",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_cust"),
    )
    top = F.sum(
        F.when(F.col("rn") * 5 <= F.col("n_cust"), F.col("cents")).otherwise(0)
    )
    return (
        ranked.join(F.broadcast(n), ranked.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.max("n_cust").cast("bigint").alias("n_customers"),
            (F.sum("cents") / 100.0).alias("total_spend"),
            (top / 100.0).alias("top20_spend"),
            F.round(top * 1.0 / F.sum("cents"), 6).alias("top20_share"),
        )
    )


@query(
    "order_value_vs_lines",
    oracle=f"""
    WITH ol AS (
        SELECT o.o_orderkey, count(*) AS n_lines,
               max({_SQL_CENTS.format(c='o.o_totalprice')}) AS cents
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey
    )
    SELECT n_lines,
           count(*) AS n_orders,
           round(sum(cents) / 100.0 / count(*), 6) AS avg_value,
           min(cents) / 100.0 AS min_value,
           max(cents) / 100.0 AS max_value
    FROM ol GROUP BY n_lines
    """,
)
def order_value_vs_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size-vs-value profile: average order value keyed by the
    number of lines in the order — the does-bigger-basket-mean-bigger-
    spend curve (linear: independent items; superlinear: bundling).
    Orderkey-spine join (co-partitioned with the keyed cache/bucket
    layout), order-keyed count with the order value carried as max()
    (constant per group — never re-joined), then a ~7-row profile
    aggregate of exact cents."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    ol = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(o.o_orderkey)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.max(_cents("o_totalprice")).alias("cents"),
        )
    )
    return ol.groupBy("n_lines").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("cents") / 100.0 / F.count(F.lit(1)), 6).alias(
            "avg_value"
        ),
        (F.min("cents") / 100.0).alias("min_value"),
        (F.max("cents") / 100.0).alias("max_value"),
    )


@query(
    "customer_rfm_segments",
    oracle=f"""
    WITH per_cust AS (
        SELECT o_custkey,
               max(o_orderdate) AS last_date,
               count(*) AS f,
               sum({_SQL_CENTS.format(c='o_totalprice')}) AS m
        FROM orders GROUP BY o_custkey
    ),
    anchor AS (SELECT max(o_orderdate) AS mx FROM orders),
    binned AS (
        SELECT ntile(4) OVER (ORDER BY date_diff('day', last_date, a.mx) ASC,
                              o_custkey ASC) AS r_bin,
               ntile(4) OVER (ORDER BY f DESC, o_custkey ASC) AS f_bin,
               ntile(4) OVER (ORDER BY m DESC, o_custkey ASC) AS m_bin,
               f, m
        FROM per_cust CROSS JOIN anchor a
    )
    SELECT CAST(r_bin AS VARCHAR) || '-' || CAST(f_bin AS VARCHAR)
               || '-' || CAST(m_bin AS VARCHAR) AS segment,
           count(*) AS n_customers,
           round(sum(f) * 1.0 / count(*), 6) AS avg_orders,
           round(sum(m) / 100.0 / count(*), 6) AS avg_monetary
    FROM binned GROUP BY 1
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile segmentation — the
    classic customer-base census (reference A2/W4 family composed:
    per-entity rollup -> global quantile binning -> segment profile).
    Each dimension ntiles into quartiles under a TOTAL order (metric +
    custkey tie-break), so bin assignment is deterministic on both
    engines; recency anchors to the corpus max order date via a
    scalar-agg crossJoin (no wall clock, no eager collect), and money
    stays in exact integer cents until the final division. Plan: one
    orders groupBy (map-side combined), then three window functions —
    note they are GLOBAL ntiles, i.e. single-partition sorts over the
    per-customer rollup (n_customers rows, not n_orders). That is fine
    to ~10⁸ customers on one executor's sort; past that the documented
    swap is percentile-threshold binning (approx_percentile cutoffs
    broadcast back, the value_quartile_labels pattern) which bins in a
    map-only pass at the cost of exactness at the boundaries."""
    o = _t(spark, sf_dir, "orders")
    from pyspark.sql import Window

    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_date"),
        F.count(F.lit(1)).alias("f"),
        F.sum(_cents("o_totalprice")).alias("m"),
    )
    anchor = o.agg(F.max("o_orderdate").alias("mx"))
    binned = per_cust.crossJoin(F.broadcast(anchor)).select(
        F.ntile(4)
        .over(
            Window.orderBy(
                F.datediff(F.col("mx"), F.col("last_date")).asc(),
                F.col("o_custkey").asc(),
            )
        )
        .alias("r_bin"),
        F.ntile(4)
        .over(Window.orderBy(F.col("f").desc(), F.col("o_custkey").asc()))
        .alias("f_bin"),
        F.ntile(4)
        .over(Window.orderBy(F.col("m").desc(), F.col("o_custkey").asc()))
        .alias("m_bin"),
        "f",
        "m",
    )
    seg = F.concat_ws(
        "-",
        F.col("r_bin").cast("string"),
        F.col("f_bin").cast("string"),
        F.col("m_bin").cast("string"),
    )
    return binned.groupBy(seg.alias("segment")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("f") * 1.0 / F.count(F.lit(1)), 6).alias("avg_orders"),
        F.round(F.sum("m") / 100.0 / F.count(F.lit(1)), 6).alias(
            "avg_monetary"
        ),
    )


# Entity-resolution edit-distance threshold: names within this Levenshtein
# distance inside a block are match candidates.
ER_LEV_MAX = 1


@query(
    "customer_er_blocking_pairs",
    oracle=f"""
    SELECT a.c_custkey AS custkey_a, b.c_custkey AS custkey_b,
           CAST(a.c_nationkey AS BIGINT) AS nationkey,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS lev
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= {ER_LEV_MAX}
    """,
)
def customer_er_blocking_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENTITY-RESOLUTION candidate pairs by blocking + edit distance: the
    classic dedup-a-dimension kernel (merge near-identical customer
    records before they fan out through joins). Records block on
    nationkey, pair within a block, and keep pairs whose names are
    within Levenshtein {ER_LEV_MAX} — both engines implement the same
    classic DP edit distance, so the integer threshold is exact. Plan:
    the self-join shuffles BOTH sides on the block key once, the
    quadratic blow-up is confined to within-block pair counts (the same
    hazard analysis as the co-location flagship — block sizes decide
    everything), and levenshtein runs JVM-side inside the join filter.
    At 100 TB the block key coarsens or compounds (nation × name-length
    × name-prefix — exactly the LSH-banding idea in exact form) to keep
    the per-block quadratic bounded; a skew-salted variant follows the
    colocation salting recipe. The distance column doubles as the match
    score for a downstream threshold sweep."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_name"
    )
    a = c.select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_name").alias("name_a"),
    )
    b = c.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_name").alias("name_b"),
    )
    lev = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(b, "nationkey")
        .where(F.col("custkey_a") < F.col("custkey_b"))
        .where(lev <= ER_LEV_MAX)
        .select(
            "custkey_a",
            "custkey_b",
            F.col("nationkey").cast("bigint").alias("nationkey"),
            lev.cast("bigint").alias("lev"),
        )
    )


# Minimum shared distinct parts for a supplier pair to enter the overlap
# report (blocks the long tail of 1-part coincidences on both engines).
SUPP_JACCARD_MIN_SHARED = 3
SUPP_JACCARD_TOP_K = 25


@query(
    "supplier_part_jaccard",
    oracle=f"""
    WITH sp AS (
        SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ),
    sizes AS (SELECT s, count(*) AS n FROM sp GROUP BY s),
    shared AS (
        SELECT a.s AS supp_a, b.s AS supp_b, count(*) AS n_shared
        FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
        GROUP BY a.s, b.s
        HAVING count(*) >= {SUPP_JACCARD_MIN_SHARED}
    )
    SELECT sh.supp_a, sh.supp_b, sh.n_shared,
           round(sh.n_shared * 1.0 / (x.n + y.n - sh.n_shared), 6)
               AS jaccard
    FROM shared sh
    JOIN sizes x ON x.s = sh.supp_a
    JOIN sizes y ON y.s = sh.supp_b
    ORDER BY jaccard DESC, supp_a ASC, supp_b ASC
    LIMIT {SUPP_JACCARD_TOP_K}
    """,
)
def supplier_part_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier catalog-overlap: Jaccard similarity of the DISTINCT part
    sets two suppliers ship, top-{SUPP_JACCARD_TOP_K} — the set-similarity
    join on the RELATIONAL side (the text/vector dedup family's exact
    co-occurrence blocking applied to assortments: overlapping suppliers
    are substitution candidates in sourcing optimization, near-identical
    ones are duplicate-vendor suspects for entity resolution). Candidates
    come ONLY from the part-key co-occurrence join (suppliers sharing at
    least one part, then a >= {SUPP_JACCARD_MIN_SHARED}-shared gate) —
    never suppliers²; pair volume is bounded by the sum over parts of
    C(suppliers_per_part, 2), and suppliers-per-part is a bounded fan-out
    in any real catalog (a hot-part cap is the mitigation if it isn't —
    the wedge-join discipline of operators/graphstats). Jaccard is a
    rounded ratio of exact distinct counts; the top-k orders on
    (jaccard DESC, supp_a, supp_b) — total."""
    from .text import _materialize_release

    li = _t(spark, sf_dir, "lineitem")
    # the distinct (supplier, part) table feeds four branches (both
    # self-join sides + both size lookups): cache it for the one
    # evaluation, release after the k-bounded result materializes
    # (plan-audit lead: 4 re-derivations uncached)
    sp = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct().cache()
    sizes = sp.groupBy("s").agg(F.count(F.lit(1)).alias("n"))
    a = sp.select(F.col("s").alias("supp_a"), "p")
    b = sp.select(F.col("s").alias("supp_b"), "p")
    shared = (
        a.join(b, "p")
        .where(F.col("supp_a") < F.col("supp_b"))
        .groupBy("supp_a", "supp_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= SUPP_JACCARD_MIN_SHARED)
    )
    x = sizes.select(F.col("s").alias("supp_a"), F.col("n").alias("na"))
    y = sizes.select(F.col("s").alias("supp_b"), F.col("n").alias("nb"))
    out = (
        shared.join(x, "supp_a")
        .join(y, "supp_b")
        .select(
            "supp_a",
            "supp_b",
            "n_shared",
            F.round(
                F.col("n_shared")
                * 1.0
                / (F.col("na") + F.col("nb") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("supp_a"), F.asc("supp_b"))
        .limit(SUPP_JACCARD_TOP_K)
    )
    return _materialize_release(out, sp)


@query(
    "discount_lift_by_quantity",
    oracle=f"""
    SELECT CAST(floor((l_quantity - 1) / 10) AS BIGINT) AS qty_band,
           count(*) AS n_items,
           CAST(sum(CAST({_SQL_CENTS.format(c='l_extendedprice')}
                * (10000 - {_SQL_BP.format(c='l_discount')})
                AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0 AS revenue,
           round(1.0 - CAST(sum(CAST({_SQL_CENTS.format(c='l_extendedprice')}
                * (10000 - {_SQL_BP.format(c='l_discount')})
                AS DECIMAL(38,0))) AS DOUBLE) / 10000.0
                / CAST(sum(CAST({_SQL_CENTS.format(c='l_extendedprice')}
                     AS DECIMAL(38,0))) AS DOUBLE), 6) AS eff_discount
    FROM lineitem
    GROUP BY qty_band
    """,
)
def discount_lift_by_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective discount rate by quantity band — the pricing-policy
    readout (does the discount schedule actually deepen with order
    size?): per 10-unit quantity band, item count, realized discounted
    revenue, and the revenue-weighted effective discount
    1 - disc_revenue/full_revenue. All three aggregates are exact
    DECIMAL(38,0) sums of cents x basis-point products (the
    pricing_summary discipline); the two output doubles are constant
    divisions and one mirrored ratio rounded at 6dp. One map-side
    combined aggregate over the fact — a single pass at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    full_c = F.sum(_cents("l_extendedprice").cast("decimal(38,0)"))
    disc_c = F.sum(
        (_cents("l_extendedprice") * (10000 - _bp("l_discount"))).cast(
            "decimal(38,0)"
        )
    )
    return (
        li.groupBy(
            F.floor((F.col("l_quantity") - 1) / 10)
            .cast("bigint")
            .alias("qty_band")
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (disc_c.cast("double") / 1000000.0).alias("revenue"),
            F.round(
                F.lit(1.0)
                - disc_c.cast("double") / 10000.0 / full_c.cast("double"),
                6,
            ).alias("eff_discount"),
        )
    )


@query(
    "balance_spend_correlation",
    oracle="""
    WITH spend AS (
        SELECT c.c_custkey, c.c_mktsegment,
               CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal_c,
               coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0)
                   AS spend_c
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_mktsegment, c.c_acctbal
    ),
    m AS (
        SELECT c_mktsegment,
               count(*) AS n,
               sum(CAST(bal_c AS HUGEINT)) AS sx,
               sum(CAST(spend_c AS HUGEINT)) AS sy,
               sum(CAST(bal_c AS HUGEINT) * bal_c) AS sxx,
               sum(CAST(spend_c AS HUGEINT) * spend_c) AS syy,
               sum(CAST(bal_c AS HUGEINT) * spend_c) AS sxy
        FROM spend GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, CAST(n AS BIGINT) AS n_customers,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                 / sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 6)
               AS pearson_r
    FROM m
    WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def balance_spend_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between a customer's account balance and their
    lifetime spend, per market segment — does the balance field carry
    any signal about purchasing (a data-quality question as much as a
    business one; TPC-H's balance is famously uncorrelated noise, and
    this query PROVES it per segment instead of assuming it). Customers
    with no orders contribute spend 0 (left join). Both variables
    quantize to exact cents; the five moment sums accumulate in
    HUGEINT/DECIMAL(38,0); r assembles from exact integer combinations
    with two mirrored sqrt/divisions (products-of-sums discipline);
    degenerate segments (zero variance either side) are excluded on
    both engines. One customer-keyed aggregate + one 5-row rollup."""
    from pyspark.sql import functions as F2

    dec = "decimal(38,0)"
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    spend = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment", "c_acctbal")
        .agg(
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")),
                F.lit(0),
            ).alias("spend_c")
        )
        .select(
            "c_mktsegment",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
            "spend_c",
        )
    )
    x = F.col("bal_c").cast(dec)
    y = F.col("spend_c").cast(dec)
    m = spend.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * F.col("bal_c")).cast(dec)).alias("sxx"),
        F.sum((y * F.col("spend_c")).cast(dec)).alias("syy"),
        F.sum((x * F.col("spend_c")).cast(dec)).alias("sxy"),
    )
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(dec)
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(dec)
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(dec)
    return (
        m.where((vx > 0) & (vy > 0))
        .select(
            "c_mktsegment",
            F.col("n").cast("bigint").alias("n_customers"),
            F.round(
                cov.cast("double")
                / F.sqrt(vx.cast("double"))
                / F.sqrt(vy.cast("double")),
                6,
            ).alias("pearson_r"),
        )
    )


@query(
    "brand_share_yearly_shift",
    oracle=f"""
    WITH rev AS (
        SELECT p.p_brand AS brand, year(o.o_orderdate) AS yr,
               sum(CAST({_SQL_CENTS.format(c='l_extendedprice')}
                   * (10000 - {_SQL_BP.format(c='l_discount')})
                   AS DECIMAL(38,0))) AS rev_c
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY p.p_brand, year(o.o_orderdate)
    ),
    sh AS (
        SELECT brand, yr,
               round(CAST(rev_c AS DOUBLE)
                     / CAST(sum(rev_c) OVER (PARTITION BY yr) AS DOUBLE), 6)
                   AS share
        FROM rev
    )
    SELECT brand, CAST(yr AS BIGINT) AS yr, share,
           round(share - lag(share) OVER (
               PARTITION BY brand ORDER BY yr ASC), 6) AS share_delta
    FROM sh
    """,
)
def brand_share_yearly_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand revenue-share trajectory: each brand's share of total
    yearly revenue, with the year-over-year delta — the market-share
    drift report (a brand losing share each year is a lifecycle signal
    no single-year snapshot shows; the lag-over-aggregate shape of
    orders_quarter_growth applied to a two-dimension share). Revenue
    accumulates in exact DECIMAL cents x basis points; the share divides
    two exact sums (the yearly total via a year-partitioned window over
    the ALREADY-AGGREGATED brand-year frame, never a second fact pass);
    the delta subtracts ROUNDED shares, so cross-engine drift cannot
    leak through the lag. Plan: one fact aggregate (part/orders dims
    attach by key), then two windows over brand-year rows — the fact is
    touched once."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(F.sum(_revenue_col()).alias("rev_c"))
    )
    w_y = Window.partitionBy("yr")
    sh = rev.select(
        "brand",
        "yr",
        F.round(
            F.col("rev_c").cast("double")
            / F.sum("rev_c").over(w_y).cast("double"),
            6,
        ).alias("share"),
    )
    w_b = Window.partitionBy("brand").orderBy(F.asc("yr"))
    return sh.select(
        "brand",
        F.col("yr").cast("bigint").alias("yr"),
        "share",
        F.round(F.col("share") - F.lag("share").over(w_b), 6).alias(
            "share_delta"
        ),
    )
