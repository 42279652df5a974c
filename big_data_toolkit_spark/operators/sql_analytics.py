"""TPC-H-style SQL analytics (reference a6 Q1-Q4, re-expressed Spark-first).

The reference hand-builds each query as an RDD pipeline with hard-coded
physical decisions; here each query is a declarative DataFrame plan and
Catalyst/AQE make those decisions:

* Q1 (``a6/Q1.scala:48-63``): scan + date-equality filter + count. Reference
  splits text lines / drops parquet to RDDs; engine keeps the DataFrame so the
  ``l_shipdate = ?`` predicate is pushed into the parquet scan (row-group
  min/max skipping — at 100 TB this prunes almost all IO).
* Q2 (``a6/Q2.scala:44-91``): lineitem-orders equi-join on orderkey, one row
  per order, sort + take(20). Reference cogroups both full tables; engine
  filters lineitem FIRST (pushdown), dedups the join key, joins, and the sort
  +limit compiles to TakeOrderedAndProject (no global sort).
* Q3 (``a6/Q3.scala:49-99``): fact-to-dimension joins. Reference manually
  ``collectAsMap`` + broadcasts part/supplier; engine just joins — the dims are
  far below ``autoBroadcastJoinThreshold`` so Catalyst plans BroadcastHashJoin
  (verified in tests), and at any scale AQE re-checks the decision at runtime.
* Q4 (``a6/Q4.scala:44-137``): filtered fact join + per-nation count.
  Reference pre-composes customer⋈nation on the driver and broadcasts the
  result by hand; engine expresses the join chain declaratively and lets
  Catalyst order it (fact filtered first, dims broadcast).

Scale behavior: the only shuffles are the Q2/Q4 fact-side joins+aggregates on
the (filtered) lineitem, keyed by high-cardinality ``l_orderkey`` — even
partitioning, no skew; dimension joins are broadcasts (no shuffle at all).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_toolkit_spark.catalog import load_table

# Default parameters (the reference parameterizes by --date; these are the
# engine's test-bench picks, chosen to select real rows in TESTDATA).
SHIP_DATE = dt.datetime(1998, 8, 23)
SHIP_YEAR_START = dt.datetime(1998, 1, 1)
SHIP_YEAR_END = dt.datetime(1999, 1, 1)
TOP_N = 20


def q1_count_shipped(
    spark: SparkSession, sf_dir: str, ship_date: dt.datetime = SHIP_DATE
) -> DataFrame:
    """COUNT(*) of lineitems shipped exactly on ``ship_date``.

    Mirrors ``a6/Q1.scala:49-54`` (filter + count). The aggregate is returned
    as a 1-row DataFrame (the driver collects); the filter is pushed into the
    parquet scan.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.where(F.col("l_shipdate") == F.lit(ship_date))
        .agg(F.count("*").alias("cnt"))
    )


def q2_orders_shipped(
    spark: SparkSession,
    sf_dir: str,
    ship_date: dt.datetime = SHIP_DATE,
    top_n: int = TOP_N,
) -> DataFrame:
    """First ``top_n`` orders (by key) with a lineitem shipped on the date.

    Mirrors ``a6/Q2.scala:81-91``: cogroup join keeping one row per order
    (the reference takes the first clerk per order; TESTDATA orders carry no
    clerk column, so ``o_orderpriority`` plays that role). The distinct on the
    filtered fact side keeps the join build small; sort+limit becomes
    TakeOrderedAndProject.
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    shipped_orders = (
        lineitem.where(F.col("l_shipdate") == F.lit(ship_date))
        .select("l_orderkey")
        .distinct()
    )
    return (
        shipped_orders.join(orders, shipped_orders.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_orderkey"),
            F.col("o_orderpriority").alias("o_clerk_equiv"),
        )
        .orderBy("o_orderkey")
        .limit(top_n)
    )


def q3_part_supplier_shipped(
    spark: SparkSession,
    sf_dir: str,
    ship_date: dt.datetime = SHIP_DATE,
    top_n: int = TOP_N,
) -> DataFrame:
    """(orderkey, linenumber, part name, supplier name) for lineitems shipped
    on the date, first ``top_n`` by (orderkey, linenumber).

    Mirrors ``a6/Q3.scala:92-99``. The reference hand-broadcasts part+supplier
    maps; here both dimension joins are planned as BroadcastHashJoin
    automatically. ``l_linenumber`` is included to make the sort total (the
    reference's orderkey-only sort has nondeterministic tie order).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        lineitem.where(F.col("l_shipdate") == F.lit(ship_date))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "l_linenumber", "p_name", "s_name")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(top_n)
    )


def q4_orders_by_nation(
    spark: SparkSession,
    sf_dir: str,
    start: dt.datetime = SHIP_YEAR_START,
    end: dt.datetime = SHIP_YEAR_END,
) -> DataFrame:
    """Per-nation count of lineitems shipped in [start, end).

    Mirrors ``a6/Q4.scala:44-137`` (lineitem ⋈ orders ⋈ customer ⋈ nation →
    count by nation → sort by nationkey). The reference composes
    customer⋈nation on the driver and broadcasts by hand (``:105-112``); the
    engine declares the chain and Catalyst broadcasts customer and nation,
    leaving a single shuffle: the final per-nation aggregation (25 groups,
    partial-aggregated map-side so the shuffle is tiny at any scale).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(start)) & (F.col("l_shipdate") < F.lit(end))
        )
        .select("l_orderkey")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("*").alias("order_cnt"))
        .orderBy("n_nationkey")
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_name, revenue_cc): revenue (hundredths of a cent) from lineitems whose customer and
    supplier share a nation — the TPC-H Q5 join pattern, beyond the
    reference's a6 suite (which stops at Q4's one-sided dim chain).

    The distinctive shape is the TWO-SIDED dimension constraint
    (c_nationkey = s_nationkey): customer and supplier both join to the
    fact, and the equality between their nation keys closes the cycle.
    Declared flat and left to Catalyst/AQE: customer/supplier/nation
    broadcast, the fact never re-shuffles, and the only exchange is the
    25-group final aggregate. Revenue is computed ENTIRELY in integers:
    price quantizes to cents and discount to whole percent (both exact —
    the stored values carry two decimals), then
    ``cents · (100 − pct)`` accumulates as BIGINT hundredths-of-a-cent.
    Quantizing the double PRODUCT instead would hit the engines'
    different decimal rounding modes at half-cent boundaries (measured:
    ±1-2 cents per nation at sf0.01) — the same class of drift the
    integer-cents convention exists to kill.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    pct = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
    rev = cents * (F.lit(100) - pct)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue_cc"))
        .orderBy(F.desc("revenue_cc"), "n_name")
    )


Q6_DISCOUNT_LO, Q6_DISCOUNT_HI = 0.02, 0.04  # whole-percent band [2%, 4%]
Q6_MAX_QTY = 24


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row (revenue_cc): the TPC-H Q6 shape — pure scan + filter +
    aggregate, the canonical predicate-pushdown showcase (every predicate
    reaches the parquet scan; no join, no shuffle beyond the final 1-row
    aggregate).

    Revenue = Σ price·discount over lineitems in a discount band below a
    quantity cap, in EXACT integers (cents × whole-percent — the q5
    convention): the stored values carry two decimals, so quantizing each
    factor separately is lossless while quantizing the double product
    would hit engine rounding-mode differences. The discount-band filter
    compares quantized integers too, so band edges cannot drift.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    pct = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
    return (
        li.where(
            (F.col("l_quantity") < Q6_MAX_QTY)
        )
        .select(cents.alias("cents"), pct.alias("pct"))
        .where(
            (F.col("pct") >= int(Q6_DISCOUNT_LO * 100))
            & (F.col("pct") <= int(Q6_DISCOUNT_HI * 100))
        )
        .agg(F.sum(F.col("cents") * F.col("pct")).alias("revenue_cc"))
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(supp_nation, cust_nation, l_year, revenue_cc): cross-border trade
    volume by (supplier nation, customer nation, ship year) — the TPC-H Q7
    join pattern generalized to ALL nation pairs (no pinned-literal pair),
    continuing the beyond-a6 SQL suite (q5 closed the nation cycle; this
    opens it: supp_nation ≠ cust_nation).

    Plan: the q5 dim chain — customer/supplier broadcast onto the fact,
    nation broadcast TWICE under different aliases for the two roles —
    with the inequality as a post-broadcast filter and a
    |nations|²·|years| final aggregate. Revenue in exact integer
    hundredths-of-a-cent (the q5/q6 convention).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    pct = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
    rev = cents * (F.lit(100) - pct)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(rev).alias("revenue_cc"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(r_name, l_year, n_name, revenue_cc, share): each supplier nation's
    share of its REGION's annual revenue — the TPC-H Q8 market-share shape
    generalized to every (region, year, nation) cell.

    Completes the dimension hierarchy the suite exercises: lineitem →
    supplier → nation → region is a three-level broadcast chain (region is
    5 rows; the whole dim tree stays broadcast). Revenue is the exact
    integer convention; the share is a ratio-to-report window over the
    |regions|·|years|·|nations| aggregate — tens of rows — emitted as
    BIGINT parts-per-million via truncating integer division (the repo's
    integer-output protocol: a round(,6) DOUBLE here is exactly the shape
    that hashed driver-red in r6). The numerator goes through a
    decimal(38,0) intermediate so ``revenue_cc * 1e6`` cannot wrap int64
    at large scale factors (per-cell revenue_cc ~3e15 at sf100).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    pct = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
    rev = cents * (F.lit(100) - pct)
    per = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            "r_name",
            F.year("l_shipdate").cast("long").alias("l_year"),
            "n_name",
        )
        .agg(F.sum(rev).alias("revenue_cc"))
    )
    w = Window.partitionBy("r_name", "l_year")
    return per.withColumn("total_cc", F.sum("revenue_cc").over(w)).select(
        "r_name",
        "l_year",
        "n_name",
        "revenue_cc",
        F.expr(
            "CAST((CAST(revenue_cc AS DECIMAL(38,0)) * 1000000)"
            " DIV total_cc AS BIGINT)"
        ).alias("share_ppm"),
    )


Q10_TOP_K = 20


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_custkey, c_name, n_name, revenue_cc): the TPC-H Q10 shape — the
    top-``Q10_TOP_K`` customers by revenue LOST to returned items
    (l_returnflag = 'R'), with their nation.

    The returns-analysis join chain: the returnflag predicate pushes to
    the lineitem scan BEFORE the orders join (two-thirds of the fact
    never joins), customer and nation broadcast, revenue is the exact
    integer convention, and the top-k is TakeOrderedAndProject with
    custkey tie-break.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    pct = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
    rev = cents * (F.lit(100) - pct)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).alias("revenue_cc"))
        .orderBy(F.desc("revenue_cc"), "c_custkey")
        .limit(Q10_TOP_K)
    )


# (brand, size range, quantity range) per Q19-style branch
Q19_BRANCHES = (
    ("Brand#13", 1, 10, 1, 15),
    ("Brand#5", 5, 20, 10, 30),
    ("Brand#19", 10, 40, 20, 45),
)


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row (revenue_cc): the TPC-H Q19 shape — revenue over a DISJUNCTION
    of three mixed-table branch predicates (each constraining the part's
    brand + size AND the lineitem's quantity).

    The disjunctive-pushdown stress case: no single conjunct spans the
    whole filter, but each branch's part-side conjuncts union into a
    part filter and the quantity bounds union into a lineitem filter
    (Catalyst derives both via constraint propagation from the OR), so
    BOTH scans prune before the broadcast join and the residual OR only
    evaluates on survivors. Revenue in exact integer
    hundredths-of-a-cent.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    pct = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
    rev = cents * (F.lit(100) - pct)
    branch = None
    for brand, s_lo, s_hi, q_lo, q_hi in Q19_BRANCHES:
        b = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        branch = b if branch is None else (branch | b)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(branch)
        .agg(F.sum(rev).alias("revenue_cc"))
    )


Q1_CUTOFF = "1998-09-02 00:00:00"  # TPC-H Q1's shipdate ceiling


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL TPC-H Q1 pricing summary (the reference's a6 Q1 keeps only
    the count): per (l_returnflag, l_linestatus) over shipped lineitems —
    quantity/price/discounted/charged sums, integer-division averages, and
    the row count.

    Every money/quantity column quantizes to exact integers BEFORE
    aggregation (the q5/q6 convention, extended to the three-factor
    charge): qty and price to hundredths, discount and tax to whole
    percent — all lossless for 2-decimal stored values — so
    ``charge = cents · (100−d) · (100+t)`` accumulates as BIGINT
    ten-thousandths-of-a-cent with zero rounding-mode exposure. The
    averages are BIGINT micro-unit integer divisions (truncating, both
    engines) per the integer-output protocol. One partial-aggregated
    shuffle of ≤ |flags|·|statuses| groups; the date predicate pushes to
    the parquet scan.

    int64 headroom: the charge term is ≤ ~1.2e11 per row (price ≤ ~1e5
    → cents ≤ 1e7, ×(100−d) ≤ 1e9, ×(100+t) ≤ ~1.2e11), and Q1 groups
    into only ~6 cells, so the per-group sum reaches int64's 9.2e18 at
    ~7.5e7 rows PER CELL — ~1.3e7× TPC-H sf1's lineitem, i.e. roughly
    sf1e7 ≫ any real deployment of this 4-cell rollup... but NOT beyond a
    100 TB corpus (sf~1e5 ≈ 6e10 rows/6 cells ≈ 1e10 per cell, 2.6 OOM
    of margin — fine; sf1e7 would not be). Escape hatch if the margin
    ever thins: sum ``ch`` as ``decimal(38,0)`` (Spark and DuckDB both
    keep 128-bit decimal sums exact) and emit the total as decimal(38,0)
    on BOTH sides — the same swap embedding_covariance documents.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty_c = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("long")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    d_pct = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
    t_pct = (F.col("l_tax").cast("decimal(18,2)") * 100).cast("long")
    return (
        li.where(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .select(
            "l_returnflag",
            "l_linestatus",
            qty_c.alias("qc"),
            cents.alias("pc"),
            (cents * (F.lit(100) - d_pct)).alias("dp"),
            (cents * (F.lit(100) - d_pct) * (F.lit(100) + t_pct)).alias("ch"),
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qc").alias("sum_qty_c"),
            F.sum("pc").alias("sum_base_price_c"),
            F.sum("dp").alias("sum_disc_price_cc"),
            F.sum("ch").alias("sum_charge_ccpm"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty_c",
            "sum_base_price_c",
            "sum_disc_price_cc",
            "sum_charge_ccpm",
            F.expr("sum_qty_c * 10000 DIV count_order").alias("avg_qty_micros"),
            F.expr("sum_base_price_c * 10000 DIV count_order").alias(
                "avg_price_micros"
            ),
            "count_order",
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (identical semantics, identical output column names).
# ---------------------------------------------------------------------------

ORACLE_SQL: dict[str, str] = {
    "q6_forecast_revenue": f"""
        SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                             AS BIGINT)
                        * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                               AS BIGINT))
                    AS BIGINT) AS revenue_cc
        FROM lineitem
        WHERE l_quantity < {Q6_MAX_QTY}
          AND CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
              BETWEEN {int(Q6_DISCOUNT_LO * 100)} AND {int(Q6_DISCOUNT_HI * 100)}
    """,
    "q5_local_supplier_volume": """
        SELECT n_name,
               CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                        * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                                      AS BIGINT)))
                    AS BIGINT) AS revenue_cc
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE c_nationkey = s_nationkey
        GROUP BY n_name
        ORDER BY revenue_cc DESC, n_name
    """,
    "q1_count_shipped": """
        SELECT count(*) AS cnt
        FROM lineitem
        WHERE l_shipdate = TIMESTAMP '1998-08-23 00:00:00'
    """,
    "q2_orders_shipped": """
        SELECT o_orderkey, o_orderpriority AS o_clerk_equiv
        FROM orders
        WHERE o_orderkey IN (
            SELECT DISTINCT l_orderkey FROM lineitem
            WHERE l_shipdate = TIMESTAMP '1998-08-23 00:00:00'
        )
        ORDER BY o_orderkey
        LIMIT 20
    """,
    "q3_part_supplier_shipped": """
        SELECT l_orderkey, l_linenumber, p_name, s_name
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE l_shipdate = TIMESTAMP '1998-08-23 00:00:00'
        ORDER BY l_orderkey, l_linenumber
        LIMIT 20
    """,
    "q4_orders_by_nation": """
        SELECT n_nationkey, n_name, count(*) AS order_cnt
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY n_nationkey, n_name
        ORDER BY n_nationkey
    """,
}

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1997-06-15 00:00:00"  # orders strictly before, shipments after
Q3_TOP_K = 10


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_orderkey, o_orderdate, o_orderpriority, revenue_cc): the REAL
    TPC-H Q3 shipping-priority shape — unshipped revenue of one market
    segment's orders placed before the cutoff, top-``Q3_TOP_K`` by revenue.
    (The reference's a6 Q3, ``a6/Q3.scala:49-99``, only approximates the
    join chain with part/supplier lookups; this is the canonical
    date-disjoint form. The synthetic schema has no ``o_shippriority``, so
    ``o_orderpriority`` stands in as the carried order attribute.)

    Plan shape at 100 TB: BOTH date predicates push to their parquet scans
    BEFORE the fact-fact join (orders < cutoff keeps ~40%, lineitem >
    cutoff keeps ~60% — each pruned at the row-group level), the segment
    filter reduces customer to ~1/5 which then BROADCASTS into the orders
    side, and the only shuffle is lineitem⋈orders on high-cardinality
    ``l_orderkey`` (even partitioning, no skew). The top-k compiles to
    TakeOrderedAndProject — per-partition heaps, never a global sort.
    Revenue is the exact integer convention; tie-break (revenue desc,
    orderdate, orderkey) is total because l_orderkey is the group key.
    """
    cutoff = F.lit(Q3_CUTOFF).cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == Q3_SEGMENT)
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    pct = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
    rev = cents * (F.lit(100) - pct)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("revenue_cc"))
        .orderBy(F.desc("revenue_cc"), "o_orderdate", "l_orderkey")
        .limit(Q3_TOP_K)
    )


Q14_MONTH_START = "1997-09-01 00:00:00"
Q14_MONTH_END = "1997-10-01 00:00:00"


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(promo_revenue_cc, total_revenue_cc, promo_share_ppm): TPC-H Q14 —
    the month's revenue share of PROMO-type parts, i.e. conditional
    aggregation over a fact⋈dim join (the one agg shape the suite lacked:
    a CASE inside the sum, not a post-agg filter).

    The month predicate prunes the lineitem scan to ~1/80 of the fact
    (row-group min/max on l_shipdate); part broadcasts (it is a true
    dimension); both sums come out of ONE partial-aggregated pass —
    Catalyst folds the two conditional sums into a single aggregate
    operator, so the fact is read once. The share is BIGINT
    parts-per-million by truncating integer division through a
    decimal(38,0) intermediate (integer-output protocol; no int64 wrap
    at any scale factor).
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit(Q14_MONTH_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q14_MONTH_END).cast("timestamp"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    pct = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
    rev = cents * (F.lit(100) - pct)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(
                F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("promo_revenue_cc"),
            F.sum(rev).alias("total_revenue_cc"),
        )
        .select(
            "promo_revenue_cc",
            "total_revenue_cc",
            F.expr(
                "CAST((CAST(promo_revenue_cc AS DECIMAL(38,0)) * 1000000)"
                " DIV total_revenue_cc AS BIGINT)"
            ).alias("promo_share_ppm"),
        )
    )


Q18_MIN_QTY_C = 250 * 100  # sum(l_quantity) > 250, in exact hundredths
Q18_TOP_K = 20


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice_c,
    sum_qty_c): TPC-H Q18 — orders whose total line quantity exceeds the
    threshold, with their customer, top-``Q18_TOP_K`` by order value.

    The one join shape the suite lacked: an AGGREGATE-FILTERED semi-join —
    the qualifying-order set is itself the result of a groupBy+HAVING over
    the fact. Plan at 100 TB: the qualifier is one partial-aggregated
    shuffle on ``l_orderkey`` producing a tiny key set (~0.1% of orders at
    the calibrated threshold), which joins back to orders on the SAME key
    (AQE turns it into a broadcast once it sees the size); customer
    broadcasts; the top-k is TakeOrderedAndProject. Quantities stay exact
    integer hundredths; order value becomes cents.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    qty_c = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("long")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty_c).alias("sum_qty_c"))
        .where(F.col("sum_qty_c") > Q18_MIN_QTY_C)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    price_c = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    return (
        qualifying.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            price_c.alias("o_totalprice_c"),
            "sum_qty_c",
        )
        .orderBy(F.desc("o_totalprice_c"), "o_orderkey")
        .limit(Q18_TOP_K)
    )


Q4_QTR_START = "1997-01-01 00:00:00"
Q4_QTR_END = "1997-04-01 00:00:00"
Q4_LATE_DAYS = 60


def q4_order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderpriority, order_count): TPC-H Q4 — per-priority count of the
    quarter's orders having at least one LATE line item (the synthetic
    schema carries no commit/receipt dates, so "late" = shipped more than
    ``Q4_LATE_DAYS`` days after the order date — the same correlated-EXISTS
    shape, a condition referencing BOTH sides).

    Plan: LEFT SEMI join (EXISTS — each order emitted at most once however
    many lines are late) with a compound condition: equi on ``o_orderkey``
    + the correlated date inequality evaluated inside the join. The date
    window prunes the orders scan; the semi-join shuffles on the equi key
    only (the inequality is a post-probe filter, NOT a range-join blowup);
    aggregation is ≤ |priorities| groups, partial-aggregated.
    """
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit(Q4_QTR_START).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(Q4_QTR_END).cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (
        F.col("l_orderkey") == F.col("o_orderkey")
    ) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {Q4_LATE_DAYS} DAYS")
    )
    return (
        orders.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


Q13_EXCLUDED_PRIORITY = "1-URGENT"


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_count, custdist): TPC-H Q13 — the distribution of customers by
    how many (non-excluded) orders they placed, INCLUDING the zero bucket.
    The synthetic schema has no ``o_comment``, so the classic
    ``NOT LIKE '%special%requests%'`` exclusion becomes a priority
    exclusion — same shape: a filtered LEFT OUTER relationship where the
    left side must survive with count 0.

    Plan (the one outer-join shape the suite lacked): orders are
    pre-aggregated to ``(o_custkey, cnt)`` BEFORE the outer join — at
    100 TB orders ≫ customer, so joining the raw fact into customer and
    counting after (the naive Q13 plan) shuffles the whole fact, while
    pre-aggregation shuffles one partial-aggregated row per customer.
    The LEFT join then only fills the zero bucket via ``coalesce``.
    Both groupBys partial-aggregate; the second one has ≤ max-orders-
    per-customer groups (tiny). No skew: custkeys are high-cardinality
    and near-uniform.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        cust.join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q17_BRAND = "Brand#23"


def _q17_brand_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The brand's line items (broadcast LEFT SEMI against filtered part) —
    the pre-checkpoint frame, exposed so plan tests can assert the
    semi-join/broadcast shape that the checkpoint hides."""
    brand_parts = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_brand") == Q17_BRAND)
        .select("p_partkey")
    )
    return (
        load_table(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(brand_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(small_qty_revenue_cc, avg_yearly_cc): TPC-H Q17 — revenue from
    line items of one brand whose quantity is below 20% of that part's
    average order quantity. The reference suite had no correlated scalar
    subquery; this is the canonical one (inner ``avg(l_quantity)`` over
    the same fact, correlated on ``l_partkey``), decorrelated into a
    per-key aggregate + join-back.

    Plan: the brand filter keeps ~1/25 of parts, and that small part set
    BROADCASTS into lineitem FIRST (semi-join), so the per-part aggregate
    runs over only the brand's line items — the correlated subquery's
    "over all lineitem of that part" semantics survive because the
    correlation key is ``l_partkey`` and the filter is on part attributes
    alone. The agg and the join-back share the ``l_partkey`` key (one
    shuffle, AQE broadcasts the tiny agg side). The brand slice feeds
    BOTH the per-part aggregate and the join-back and exchange reuse does
    not deduplicate the subtrees under AQE, so the slice (1/|brands| of
    the fact, 3 narrow columns) is ``localCheckpoint``ed once instead of
    scanning the full fact twice. The 20%-of-average test
    is exact integer arithmetic: ``qty_c * 5 * n < sum_qty_c`` avoids the
    double-rounded ``0.2 * avg`` entirely (no float divergence between
    engines at any scale).
    """
    li = _q17_brand_slice(spark, sf_dir).localCheckpoint()
    qty_c = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("long")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(qty_c).alias("sum_qty_c"), F.count("*").alias("n")
    )
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    return (
        li.join(per_part, F.col("l_partkey") == F.col("pk"))
        .where(qty_c * 5 * F.col("n") < F.col("sum_qty_c"))
        .agg(F.sum(cents).alias("small_qty_revenue_cc"))
        .select(
            "small_qty_revenue_cc",
            F.expr("small_qty_revenue_cc DIV 7").alias("avg_yearly_cc"),
        )
    )


Q15_QTR_START = "1997-01-01 00:00:00"
Q15_QTR_END = "1997-04-01 00:00:00"


def _q15_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier quarter revenue (the Q15 "view") — the pre-checkpoint
    frame, exposed so plan tests can assert the date pushdown and the
    single partial-aggregated shuffle that the checkpoint hides."""
    cutoff_lo = F.lit(Q15_QTR_START).cast("timestamp")
    cutoff_hi = F.lit(Q15_QTR_END).cast("timestamp")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where((F.col("l_shipdate") >= cutoff_lo) & (F.col("l_shipdate") < cutoff_hi))
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    pct = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
    return li.groupBy("l_suppkey").agg(
        F.sum(cents * (F.lit(100) - pct)).alias("total_revenue_cc")
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s_suppkey, s_name, total_revenue_cc): TPC-H Q15 — the supplier(s)
    whose quarter revenue equals the maximum over all suppliers (the
    classic "view + scalar max subquery" shape the suite lacked).

    Plan: the date window prunes the fact scan to one quarter; per-
    supplier revenue is ONE partial-aggregated shuffle on ``l_suppkey``;
    the global max is a 1-ROW aggregate broadcast back over the same
    per-supplier frame (broadcast nested-loop over one row — no second
    shuffle, no window-function total sort); supplier names broadcast.
    The per-supplier frame feeds BOTH the max and the filter, and
    exchange reuse does not deduplicate the two subtrees under AQE
    (measured: the fact was scanned twice), so it is ``localCheckpoint``ed
    — |suppliers| rows materialized once vs a second full fact
    scan+shuffle (the repo's pair-graph pattern).
    Integer cents make the max-equality exact — the float form of this
    query is famously nondeterministic across engines. Ties (possible in
    principle) all survive and ``s_suppkey`` ordering makes the output
    total-ordered.
    """
    rev = _q15_supplier_revenue(spark, sf_dir).localCheckpoint()
    top = rev.agg(F.max("total_revenue_cc").alias("max_rev"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(top))
        .where(F.col("total_revenue_cc") == F.col("max_rev"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue_cc")
        .orderBy("s_suppkey")
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_partkey, revenue_cc): TPC-H Q11's shape — groups kept only if
    their aggregate exceeds a threshold derived from a SCALAR SUBQUERY
    over the same aggregation (the synthetic schema has no partsupp, so
    "important stock value" becomes "part revenue above 1.5× the mean
    part revenue" — same plan: agg, global scalar, HAVING vs scalar).

    The global-fraction form (``> x ppm of total``) is NOT scale-stable —
    every part's share shrinks as the catalog grows — so the threshold is
    relative to the MEAN part revenue, which is invariant under uniform
    scale-up (verified: 29 rows at sf0.01, 252 at sf0.1 — proportional).
    Plan: one partial-aggregated shuffle on ``l_partkey``; the global
    (sum, count) is a 1-row aggregate broadcast back over the per-part
    frame; the 1.5× test is exact integer cross-multiplication
    (``v * 2 * n_parts > 3 * total``), no division anywhere. The per-part
    frame feeds both the global and the filter, and exchange reuse does
    not deduplicate the subtrees under AQE, so it is ``localCheckpoint``ed
    — |parts| aggregate rows materialized once vs scanning and shuffling
    the whole fact a second time.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    per_part = (
        li.groupBy("l_partkey")
        .agg(F.sum(cents).alias("revenue_cc"))
        .localCheckpoint()
    )
    totals = per_part.agg(
        F.sum("revenue_cc").alias("total_cc"), F.count("*").alias("n_parts")
    )
    return (
        per_part.crossJoin(F.broadcast(totals))
        .where(
            F.col("revenue_cc") * 2 * F.col("n_parts") > 3 * F.col("total_cc")
        )
        .select("l_partkey", "revenue_cc")
        .orderBy(F.desc("revenue_cc"), "l_partkey")
    )


Q16_EXCLUDED_BRAND = "Brand#45"
Q16_SIZES = [1, 9, 14, 19, 23, 36, 45, 49]


def q16_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p_brand, p_type, p_size, supplier_cnt): TPC-H Q16's shape — how
    many DISTINCT suppliers ship each qualifying (brand, type, size)
    combination, excluding a brand and a supplier blocklist (no partsupp
    in the synthetic schema, so the part-supplier relation comes from
    lineitem; the classic ``NOT IN (complaint suppliers)`` becomes
    ``NOT IN (negative-balance suppliers)`` — same anti-join shape).

    Plan: the supplier blocklist is a handful of keys — it broadcasts as
    a LEFT ANTI join (never a shuffle); the part predicate (brand +
    size-IN-list) broadcasts the surviving parts into the fact;
    ``countDistinct`` compiles to Spark's two-phase distinct aggregate
    (partial distinct per partition, then merge) — the only shuffle,
    keyed by (brand, type, size). At 100 TB the distinct state per group
    is bounded by |suppliers|, not by fact rows.
    """
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    parts = (
        load_table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != Q16_EXCLUDED_BRAND)
            & F.col("p_size").isin(Q16_SIZES)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    return (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q9_PART_WORD = "red"  # p_name adjective filter (~13% of parts)


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, o_year, profit_cc): TPC-H Q9 product-type profit — per
    supplier-nation per order-year profit on pattern-matched parts. The
    synthetic schema has no partsupp/ps_supplycost, so unit cost is
    ``p_retailprice`` (the part's list price — a per-part constant, the
    same role ps_supplycost plays): profit = revenue − retailprice·qty.

    Plan shape at 100 TB: the p_name filter keeps ~13% of part, which
    BROADCASTS (with its retail cents) into the fact and prunes lineitem
    to the same fraction before anything shuffles; supplier⋈nation
    pre-joins dim-side (100 rows) and broadcasts; the only shuffle is
    lineitem⋈orders on high-cardinality ``l_orderkey`` (needed for the
    order YEAR — even partitioning, no skew), then a partial-aggregated
    rollup into ≤ |nations|·|years| cells. Exact integer protocol:
    revenue accumulates as hundredths-of-a-cent (cents × (100−pct)),
    cost as retail-cents × qty-hundredths — the same cc unit — so the
    difference is exact BIGINT.

    int64 headroom: |rev−cost| ≤ ~1e9 per row; at a 100 TB corpus
    (~6e10 rows) over ≥175 (nation, year) cells ≈ 3.4e8 rows/cell
    → ~3.4e17 per-cell sum, 27× inside int64. Escape hatch if margins
    thin: sum as decimal(38,0) on both engines (the
    embedding_covariance note's swap).
    """
    parts = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").contains(Q9_PART_WORD))
        .select(
            "p_partkey",
            (F.col("p_retailprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("retail_cents"),
        )
    )
    supp_nat = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    pct = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("long")
    qty_c = (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("long")
    profit = cents * (F.lit(100) - pct) - F.col("retail_cents") * qty_c
    return (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.sum(profit).alias("profit_cc"))
        .orderBy("nation", F.desc("o_year"))
    )


Q12_YEAR_START = "1997-01-01 00:00:00"
Q12_YEAR_END = "1998-01-01 00:00:00"
Q12_LATE_DAYS = 90
Q12_HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def q12_late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_returnflag, high_line_count, low_line_count): TPC-H Q12 shipping
    modes — conditional priority counts over LATE lineitems in a 1-year
    window. The synthetic schema has no l_shipmode/commitdate/receiptdate,
    so the grouped attribute is ``l_returnflag`` and "late" is the q4
    convention (shipped > ``Q12_LATE_DAYS`` days after the order date).
    The Q12 signature survives intact: a fact⋈fact join whose predicate
    references both sides, then TWO conditional counts folded into one
    partial-aggregated pass (CASE inside sum — Catalyst evaluates both
    branches in a single aggregate operator, one scan).

    Plan: the shipdate year window prunes the lineitem scan to ~1/7 at
    the row-group level BEFORE the join; the only shuffle is the
    ``l_orderkey`` equi-join (the late inequality is a post-probe filter,
    not a range-join blowup); final rollup is ≤ |returnflags| cells.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit(Q12_YEAR_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q12_YEAR_END).cast("timestamp"))
        )
        .select("l_orderkey", "l_returnflag", "l_shipdate")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin(*Q12_HIGH_PRIORITIES)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q12_LATE_DAYS} DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q20_YEAR_START = "1997-01-01 00:00:00"
Q20_YEAR_END = "1998-01-01 00:00:00"
Q20_PART_WORD = "red"


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s_name, n_name): TPC-H Q20 potential part promotion — suppliers
    who DOMINATED the year's shipments of some pattern-matched part. The
    synthetic schema has no partsupp.ps_availqty, so Q20's correlated
    half-of-shipped-quantity threshold becomes: supplier s qualifies if
    for some part p, s shipped MORE THAN HALF of p's total shipped
    quantity that year (``2·shipped > Σ shipped over p``) — the same
    correlated-aggregate-then-semi-join shape, compared in exact integer
    quantity-hundredths. (TPC-H also pins one nation; kept unfiltered
    here so the result exercises the full dim chain — the nation filter
    would be a trivial broadcast predicate on top.)

    Plan: the part-name filter broadcasts into the year-pruned fact;
    shuffle 1 aggregates (part, supplier) shipped totals (partial-agg);
    shuffle 2 is the window re-key by part for the per-part total —
    bounded by |parts|·|suppliers| rows, NOT fact rows, so at 100 TB the
    window input is catalog-sized. The dominance filter then semi-joins
    (distinct suppliers) and the dim chain broadcasts.
    """
    parts = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").contains(Q20_PART_WORD))
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit(Q20_YEAR_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q20_YEAR_END).cast("timestamp"))
        )
        .select(
            "l_partkey",
            "l_suppkey",
            (F.col("l_quantity").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("qty_c"),
        )
    )
    shipped = (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("qty_c").alias("shipped_c"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn("part_total_c", F.sum("shipped_c").over(w))
        .where(F.col("shipped_c") * 2 > F.col("part_total_c"))
        .select("l_suppkey")
        .distinct()
    )
    supp_nat = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    return (
        dominant.join(
            F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .select("s_name", "n_name")
        # distinct on the OUTPUT key, matching the oracle's SELECT
        # DISTINCT: two dominant suppkeys mapping to the same
        # (s_name, n_name) must collapse to one row on both sides.
        .distinct()
        .orderBy("s_name")
    )


Q21_LATE_DAYS = 180
Q21_TOP_K = 20


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s_name, numwait): TPC-H Q21 suppliers-who-kept-orders-waiting —
    for finalized ('F') multi-supplier orders, count each supplier's late
    lineitems on orders where it was the ONLY late supplier (late = the
    q4 convention, > ``Q21_LATE_DAYS`` days after order date; the
    synthetic schema has no receipt/commit dates). Top ``Q21_TOP_K`` by
    count. This is the EXISTS + NOT-EXISTS double-correlation of the
    original, re-expressed as ONE per-order aggregate: distinct-supplier
    count (the EXISTS: another supplier shipped in the order), the
    distinct set of LATE suppliers (the NOT EXISTS: exactly this one
    late), and the late-line count (Q21 counts l1 ROWS, not orders — a
    supplier twice-late on one order counts twice).

    Plan: ONE fact⋈fact shuffle on ``l_orderkey`` (status filter prunes
    orders to ~1/3 first), whose output partitioning the per-order
    groupBy REUSES (no second exchange — the groupBy key IS the join
    key); per-order state is bounded by suppliers-per-order (~4), so
    collect_list here is order-arity-bounded, never corpus-bounded; the
    culprit re-key is a ≤|orders|-row shuffle into ≤|suppliers| cells;
    the name join broadcasts; top-k compiles to TakeOrderedAndProject.
    """
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")
    ).alias("is_late")
    per_order = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", late)
        .groupBy("l_orderkey")
        .agg(
            # NOT countDistinct: that compiles to a second two-phase
            # expand-exchange on (orderkey, suppkey). Order arity is
            # bounded (~4 suppliers/order), so the distinct folds into
            # the collect_list aggregate already being computed — one
            # exchange total, reusing the join's partitioning at scale.
            F.size(F.array_distinct(F.collect_list("l_suppkey"))).alias(
                "n_supp"
            ),
            F.array_distinct(
                F.collect_list(F.when(F.col("is_late"), F.col("l_suppkey")))
            ).alias("late_supps"),
            F.sum(F.when(F.col("is_late"), 1).otherwise(0)).alias(
                "n_late_lines"
            ),
        )
    )
    culprits = per_order.where(
        (F.size("late_supps") == 1) & (F.col("n_supp") > 1)
    ).select(
        F.element_at("late_supps", 1).alias("culprit"), "n_late_lines"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        # Aggregate on s_name AFTER the broadcast name join — the same
        # grouping key the canonical Q21 (and the oracle) uses, so two
        # suppliers sharing an s_name merge identically on both sides.
        # The culprit rows are ≤|orders|, so the s_name shuffle is tiny.
        culprits.join(F.broadcast(supp), F.col("culprit") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(Q21_TOP_K)
    )


Q2_TYPE = "STANDARD"
Q2_MAX_SIZE = 15
Q2_REGION = "ASIA"
Q2_TOP_K = 100


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s_acctbal_c, s_name, n_name, p_partkey, p_name, supply_cost_cc):
    the REAL TPC-H Q2 minimum-cost-supplier shape (``q2_orders_shipped``
    is the reference a6 approximation; this is the canonical
    correlated-min form). The synthetic schema has no partsupp, so the
    part-supplier catalog is DERIVED from observed shipments: supplier
    s's cost for part p = the MINIMUM unit price (extendedprice/quantity,
    truncating integer division to hundredths-of-a-cent — exact and
    engine-identical on positive values) s ever shipped p at. Within one
    region, for small parts of one type, emit the suppliers achieving
    each part's regional minimum cost — Q2's correlated min — ordered by
    account balance (cents) like the original, top ``Q2_TOP_K``.

    Plan: both dim filters commute with the catalog aggregate (partkey
    and suppkey are its GROUP KEYS — filtering a group key before or
    after grouping is identical), so the filtered part keys (~5% of
    parts) and region-chain suppliers (~1/5) BROADCAST into lineitem
    BEFORE the groupBy — the catalog shuffle aggregates ~1% of the fact,
    not all of it, and everything after operates on catalog-sized data
    (≤ |part|·|supplier| rows, bounded the same way partsupp itself
    would be). Shuffle 2 re-keys by part for the window min — the
    correlated subquery as a single window pass, no self-join. Top-k
    compiles to TakeOrderedAndProject. (The DuckDB oracle states the
    unfiltered-catalog form; its optimizer performs the same semijoin
    pushdown, and equality of the two forms IS the commutation
    argument, checked at both scale factors.)
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
        (F.col("l_quantity").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("qty_c"),
    )
    region_nations = (
        load_table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").where(
                    F.col("r_name") == Q2_REGION
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(region_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            (F.col("s_acctbal").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("s_acctbal_c"),
        )
    )
    parts = (
        load_table(spark, sf_dir, "part")
        .where(
            (F.col("p_type") == Q2_TYPE) & (F.col("p_size") <= Q2_MAX_SIZE)
        )
        .select("p_partkey", "p_name")
    )
    ps = (
        # validity guard (P10 convention): a zero divisor yields NULL in
        # both engines (Spark DIV and DuckDB //), but the guard must be
        # in the SAME unit on both sides — qty_c (hundredths) here, so
        # the oracle filters on the identical CAST(qty*100 AS BIGINT)>0,
        # not on raw l_quantity (which differs for 0 < qty < 0.005).
        li.where(F.col("qty_c") > 0)
        # dim filters pushed BELOW the catalog aggregate (they commute:
        # both are filters on the group keys) — the groupBy sees ~1% of
        # the fact instead of all of it.
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "l_partkey",
            "l_suppkey",
            F.expr("(cents * 10000) DIV qty_c").alias("unit_cc"),
            "s_name",
            "n_name",
            "s_acctbal_c",
            "p_name",
        )
        .groupBy(
            "l_partkey",
            "l_suppkey",
            "s_name",
            "n_name",
            "s_acctbal_c",
            "p_name",
        )
        .agg(F.min("unit_cc").alias("supply_cost_cc"))
        .withColumnRenamed("l_partkey", "p_partkey")
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.withColumn("min_cost_cc", F.min("supply_cost_cc").over(w))
        .where(F.col("supply_cost_cc") == F.col("min_cost_cc"))
        .select(
            "s_acctbal_c",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "supply_cost_cc",
        )
        .orderBy(F.desc("s_acctbal_c"), "n_name", "s_name", "p_partkey")
        .limit(Q2_TOP_K)
    )


QUERIES = {
    "q1_count_shipped": q1_count_shipped,
    "q2_orders_shipped": q2_orders_shipped,
    "q3_part_supplier_shipped": q3_part_supplier_shipped,
    "q4_orders_by_nation": q4_orders_by_nation,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q1_pricing_summary": q1_pricing_summary,
    "q10_returned_items": q10_returned_items,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q3_shipping_priority": q3_shipping_priority,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q4_order_priority_checking": q4_order_priority_checking,
    "q13_customer_distribution": q13_customer_distribution,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q15_top_supplier": q15_top_supplier,
    "q11_important_parts": q11_important_parts,
    "q16_supplier_part_variety": q16_supplier_part_variety,
    "q9_product_type_profit": q9_product_type_profit,
    "q12_late_priority_lines": q12_late_priority_lines,
    "q20_potential_promotion": q20_potential_promotion,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q2_min_cost_supplier": q2_min_cost_supplier,
}

ORACLE_SQL["q18_large_volume_customers"] = f"""
    WITH qualifying AS (
      SELECT l_orderkey,
             CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS sum_qty_c
      FROM lineitem GROUP BY l_orderkey
      HAVING sum_qty_c > {Q18_MIN_QTY_C}
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
             AS o_totalprice_c,
           sum_qty_c
    FROM qualifying
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice_c DESC, o_orderkey
    LIMIT {Q18_TOP_K}
"""

ORACLE_SQL["q4_order_priority_checking"] = f"""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '{Q4_QTR_START}'
      AND o.o_orderdate <  TIMESTAMP '{Q4_QTR_END}'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL {Q4_LATE_DAYS} DAYS
      )
    GROUP BY o_orderpriority
"""

_REV_CC = """CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)
                    * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                                  AS BIGINT)))
                AS BIGINT)"""

ORACLE_SQL["q3_shipping_priority"] = f"""
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           {_REV_CC} AS revenue_cc
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = '{Q3_SEGMENT}'
      AND o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
      AND l_shipdate  > TIMESTAMP '{Q3_CUTOFF}'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue_cc DESC, o_orderdate, l_orderkey
    LIMIT {Q3_TOP_K}
"""

ORACLE_SQL["q14_promo_revenue"] = f"""
    WITH j AS (
      SELECT p_type,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                             AS BIGINT)) AS rev
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '{Q14_MONTH_START}'
        AND l_shipdate <  TIMESTAMP '{Q14_MONTH_END}'
    )
    SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev ELSE 0 END)
                AS BIGINT) AS promo_revenue_cc,
           CAST(sum(rev) AS BIGINT) AS total_revenue_cc,
           CAST((CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev ELSE 0 END)
                      AS HUGEINT) * 1000000)
                // CAST(sum(rev) AS HUGEINT) AS BIGINT) AS promo_share_ppm
    FROM j
"""

ORACLE_SQL["q19_discounted_revenue"] = f"""
    SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)
                    * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                                  AS BIGINT)))
                AS BIGINT) AS revenue_cc
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE {" OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN {slo} AND {shi} "
        f"AND l_quantity BETWEEN {qlo} AND {qhi})"
        for b, slo, shi, qlo, qhi in Q19_BRANCHES
    )}
"""

ORACLE_SQL["q10_returned_items"] = f"""
    SELECT c_custkey, c_name, n_name,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)
                    * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                                  AS BIGINT)))
                AS BIGINT) AS revenue_cc
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue_cc DESC, c_custkey
    LIMIT {Q10_TOP_K}
"""

ORACLE_SQL["q1_pricing_summary"] = f"""
    WITH q AS (
      SELECT l_returnflag, l_linestatus,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qc,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc,
             CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS dp_pct,
             CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS t_pct
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF}'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(sum(qc) AS BIGINT) AS sum_qty_c,
           CAST(sum(pc) AS BIGINT) AS sum_base_price_c,
           CAST(sum(pc * (100 - dp_pct)) AS BIGINT) AS sum_disc_price_cc,
           CAST(sum(pc * (100 - dp_pct) * (100 + t_pct)) AS BIGINT)
             AS sum_charge_ccpm,
           CAST(sum(qc) AS BIGINT) * 10000 // count(*) AS avg_qty_micros,
           CAST(sum(pc) AS BIGINT) * 10000 // count(*) AS avg_price_micros,
           count(*) AS count_order
    FROM q GROUP BY l_returnflag, l_linestatus
"""

ORACLE_SQL["q8_market_share"] = """
    WITH per AS (
      SELECT r_name, CAST(year(l_shipdate) AS BIGINT) AS l_year, n_name,
             CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)
                      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                                    AS BIGINT)))
                  AS BIGINT) AS revenue_cc
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, year(l_shipdate), n_name
    )
    SELECT r_name, l_year, n_name, revenue_cc,
           CAST((CAST(revenue_cc AS HUGEINT) * 1000000) //
                sum(revenue_cc) OVER (PARTITION BY r_name, l_year)
                AS BIGINT) AS share_ppm
    FROM per
"""

ORACLE_SQL["q7_volume_shipping"] = """
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                    * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                                  AS BIGINT)))
                AS BIGINT) AS revenue_cc
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE s_nationkey <> c_nationkey
    GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
"""

ORACLE_SQL["q13_customer_distribution"] = f"""
    WITH per_cust AS (
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt
      FROM orders WHERE o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
      GROUP BY o_custkey
    )
    SELECT CAST(coalesce(cnt, 0) AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
    GROUP BY coalesce(cnt, 0)
"""

ORACLE_SQL["q17_small_quantity_revenue"] = f"""
    WITH brand_li AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_brand = '{Q17_BRAND}')
    ),
    per_part AS (
      SELECT l_partkey AS pk,
             CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS sum_qty_c,
             CAST(count(*) AS BIGINT) AS n
      FROM brand_li GROUP BY l_partkey
    ),
    small AS (
      SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS small_qty_revenue_cc
      FROM brand_li l JOIN per_part ON l.l_partkey = pk
      WHERE CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
            * 5 * n < sum_qty_c
    )
    SELECT small_qty_revenue_cc,
           CAST(small_qty_revenue_cc // 7 AS BIGINT) AS avg_yearly_cc
    FROM small
"""

ORACLE_SQL["q15_top_supplier"] = f"""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)
                      * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                                    AS BIGINT)))
                  AS BIGINT) AS total_revenue_cc
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{Q15_QTR_START}'
        AND l_shipdate <  TIMESTAMP '{Q15_QTR_END}'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue_cc
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue_cc = (SELECT max(total_revenue_cc) FROM rev)
"""

ORACLE_SQL["q11_important_parts"] = """
    WITH per_part AS (
      SELECT l_partkey,
             CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS revenue_cc
      FROM lineitem GROUP BY l_partkey
    ),
    totals AS (
      SELECT CAST(sum(revenue_cc) AS BIGINT) AS total_cc,
             CAST(count(*) AS BIGINT) AS n_parts
      FROM per_part
    )
    SELECT l_partkey, revenue_cc
    FROM per_part, totals
    WHERE revenue_cc * 2 * n_parts > 3 * total_cc
"""

ORACLE_SQL["q16_supplier_part_variety"] = f"""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> '{Q16_EXCLUDED_BRAND}'
      AND p_size IN ({', '.join(str(s) for s in Q16_SIZES)})
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
"""

ORACLE_SQL["q9_product_type_profit"] = f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                             AS BIGINT))
             - CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               * CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
           ) AS BIGINT) AS profit_cc
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%{Q9_PART_WORD}%'
    GROUP BY n_name, year(o_orderdate)
    ORDER BY nation, o_year DESC
"""

ORACLE_SQL["q12_late_priority_lines"] = f"""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN
                    ({', '.join(repr(p) for p in Q12_HIGH_PRIORITIES)})
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN
                    ({', '.join(repr(p) for p in Q12_HIGH_PRIORITIES)})
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '{Q12_YEAR_START}'
      AND l_shipdate <  TIMESTAMP '{Q12_YEAR_END}'
      AND l_shipdate > o_orderdate + INTERVAL {Q12_LATE_DAYS} DAYS
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""

ORACLE_SQL["q20_potential_promotion"] = f"""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS shipped_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{Q20_YEAR_START}'
        AND l_shipdate <  TIMESTAMP '{Q20_YEAR_END}'
        AND l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE '%{Q20_PART_WORD}%')
      GROUP BY l_partkey, l_suppkey
    ), dom AS (
      SELECT DISTINCT l_suppkey
      FROM (SELECT l_suppkey, shipped_c,
                   sum(shipped_c) OVER (PARTITION BY l_partkey) AS total_c
            FROM shipped)
      WHERE shipped_c * 2 > total_c
    )
    SELECT DISTINCT s_name, n_name
    FROM dom
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    ORDER BY s_name
"""

ORACLE_SQL["q21_waiting_suppliers"] = f"""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN orders   ON l1.l_orderkey = o_orderkey
    JOIN supplier ON l1.l_suppkey = s_suppkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL {Q21_LATE_DAYS} DAYS
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate >
                            o_orderdate + INTERVAL {Q21_LATE_DAYS} DAYS)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT {Q21_TOP_K}
"""

ORACLE_SQL["q2_min_cost_supplier"] = f"""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             min((CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                       AS BIGINT) * 10000)
                 // CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS supply_cost_cc
      FROM lineitem
      WHERE CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) > 0
      GROUP BY l_partkey, l_suppkey
    ), regional AS (
      SELECT ps.l_partkey, ps.supply_cost_cc,
             s_name, n_name,
             CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS s_acctbal_c
      FROM ps
      JOIN supplier ON ps.l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = '{Q2_REGION}'
    )
    SELECT s_acctbal_c, s_name, n_name,
           p_partkey, p_name, CAST(supply_cost_cc AS BIGINT) AS supply_cost_cc
    FROM regional
    JOIN part ON l_partkey = p_partkey
    WHERE p_type = '{Q2_TYPE}' AND p_size <= {Q2_MAX_SIZE}
      AND supply_cost_cc = (SELECT min(r2.supply_cost_cc)
                            FROM regional r2
                            WHERE r2.l_partkey = regional.l_partkey)
    ORDER BY s_acctbal_c DESC, n_name, s_name, p_partkey
    LIMIT {Q2_TOP_K}
"""
