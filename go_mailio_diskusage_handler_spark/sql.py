"""[EXT] SQL surface: the same engine through ``spark.sql``.

Everything else in this repo declares plans with the DataFrame API;
this module proves the equivalent ANSI-SQL surface works end-to-end —
register the fixture tables as temp views, run textual SQL, get the
same Catalyst plans (views are lazy: SQL over them inherits pruning,
pushdown, broadcast decisions — there is no separate "SQL engine").

The two canned queries are the classic TPC-H shapes (Q1 pricing
summary, Q3 shipping priority) restated on the fixture schema; both
are oracle-checked like every DataFrame query, and both compile to
the plans the DataFrame API would produce (partial agg before the
shuffle for Q1; broadcast dimension joins for Q3).

Cross-engine float note: SUM(double products) differs between engines
in the last ulp (summation order), which can cross a ROUND boundary
(observed: a 1-cent revenue diff at sf0.01).  Money columns are exact
2-decimal values, so the product sums cast the INPUTS to small
decimals — decimal × decimal and decimal SUM are exact and
associative, making the aggregate bit-identical on any engine — and
only the final rounded result is cast back to double for a stable
driver-visible schema.  Casting the product (double → decimal) would
NOT work: engines disagree on that conversion's rounding path.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

from go_mailio_diskusage_handler_spark.sources.tables import TABLES, load_table

# Which sf_dir each session's fixture views currently point at.
# Weak-keyed so a stopped/replaced session drops its entry; a NEW
# session object always re-registers.  This memo holds view BINDINGS
# (name -> lazy scan plan), never rows: re-running registration for an
# unchanged (session, sf_dir) re-created byte-identical views at
# ~0.95 s per call (10 footer reads + 10 catalog writes, measured r15)
# inside the bench's timed region for every view-backed query repeat.
# Registration still runs on first use per session and whenever sf_dir
# changes (the driver's multi-SF correctness runs flip dirs mid-session).
_VIEWS_AT: "weakref.WeakKeyDictionary[SparkSession, str]" = (
    weakref.WeakKeyDictionary()
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every fixture table as a temp view named after itself.

    Idempotent per (session, sf_dir): a repeat call with the same
    directory is a no-op — nothing in this module ever mutates or
    drops these views, so re-binding them would only re-do driver-side
    catalog work.  Views stay lazy; every action scans the parquet
    inputs.
    """
    key = os.path.abspath(sf_dir)
    if _VIEWS_AT.get(spark) == key:
        return
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    _VIEWS_AT[spark] = key


def invalidate_view_memo(spark: SparkSession) -> None:
    """Drop the registration memo for ``spark`` so the next
    :func:`register_views` call re-binds every fixture view.

    The memo assumes nothing outside this module drops or shadows the
    fixture views (no current caller does — ADVICE r15).  A caller
    that manipulates the catalog anyway must invalidate here, or a
    later same-``sf_dir`` registration silently no-ops against its
    changes.  (A per-call ``spark.catalog`` existence probe was
    rejected: it would re-add a driver round-trip to every SQL-tier
    query construction — the exact cost the memo removes.)
    """
    _VIEWS_AT.pop(spark, None)


PRICING_SUMMARY_SQL = """
    SELECT l_returnflag,
           l_linestatus,
           ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                              AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE)                                             AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))
                          * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2)
                AS DOUBLE)                                             AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                   AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                              AS avg_price,
           ROUND(AVG(l_discount), 4)                                   AS avg_disc,
           COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
"""

SHIPPING_PRIORITY_SQL = """
    SELECT l_orderkey,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS revenue,
           o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-03-15'
      AND l_shipdate  > DATE '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
"""


LOCAL_SUPPLIER_VOLUME_SQL = """
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1997-01-01'
      AND o_orderdate <  DATE '1998-01-01'
    GROUP BY n_name
"""


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star with the customer-nation =
    supplier-nation correlation predicate.  The fact (lineitem)
    streams through broadcast joins against every dim; the nation
    equality is just another join predicate Catalyst evaluates inside
    the supplier hash join — no extra shuffle for the correlation."""
    register_views(spark, sf_dir)
    return spark.sql(LOCAL_SUPPLIER_VOLUME_SQL)


ORDER_PRIORITY_SQL = """
    SELECT o_orderpriority,
           COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1997-01-01'
      AND o_orderdate <  DATE '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
"""


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS.  Catalyst rewrites the
    subquery to a LEFT SEMI join on l_orderkey — one pass over each
    table, no per-row subquery probes."""
    register_views(spark, sf_dir)
    return spark.sql(ORDER_PRIORITY_SQL)


LARGE_ORDERS_SQL = """
    SELECT c_custkey,
           o_orderkey,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_custkey, o_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
"""


def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate + HAVING over the grouped measure.
    Catalyst plans HAVING as a filter above the final aggregation, so
    the predicate runs on the (already reduced) group rows — no extra
    scan or shuffle beyond the GROUP BY's own exchange."""
    register_views(spark, sf_dir)
    return spark.sql(LARGE_ORDERS_SQL)


GROUPING_SETS_SQL = """
    SELECT o_orderstatus,
           o_orderpriority,
           GROUPING_ID(o_orderstatus, o_orderpriority)                 AS gid,
           COUNT(*)                                                    AS order_count,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2)
                AS DOUBLE)                                             AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus),
                            (o_orderpriority),
                            ())
"""


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(PRICING_SUMMARY_SQL)


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SHIPPING_PRIORITY_SQL)


CORRELATED_ABOVE_AVG_SQL = """
    SELECT o.o_orderkey,
           o.o_custkey,
           o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > (SELECT 1.5 * AVG(o2.o_totalprice)
                            FROM orders o2
                            WHERE o2.o_custkey = o.o_custkey)
"""


def correlated_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — orders priced >1.5× their
    customer's average.  Catalyst decorrelates this into an aggregate
    + equi-join (no per-row subquery execution); at 100 TB that is one
    extra aggregation over the same key as the join, not O(rows)
    subquery probes.  One ANSI string runs on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(CORRELATED_ABOVE_AVG_SQL)


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — all four groupings in one Expand + a single
    aggregation shuffle (vs four scans if written as UNION ALL of
    GROUP BYs); GROUPING_ID disambiguates real NULL keys from
    rolled-up ones.  One ANSI string runs on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(GROUPING_SETS_SQL)


CUSTOMER_DISTRIBUTION_SQL = """
    SELECT order_count, COUNT(*) AS customer_count
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS order_count
        FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY order_count
"""


def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed exactly N orders —
    the one query in the tier whose join must be OUTER (zero-order
    customers are the point; COUNT(o_orderkey) counts non-null only).

    At 100 TB the inner aggregation keys the shuffle on c_custkey —
    the same key the join shuffles on, so AQE reuses one exchange for
    both; the outer GROUP BY is over the tiny (customer-count-bounded)
    histogram domain.  One ANSI string runs on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(CUSTOMER_DISTRIBUTION_SQL)


RETURNED_REVENUE_SQL = """
    SELECT c_custkey,
           c_name,
           n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS revenue_lost
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue_lost DESC, c_custkey ASC
    LIMIT 20
"""


def returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns.

    Plan at scale: the returnflag predicate pushes into the lineitem
    scan (row-group min/max skip), nation broadcasts, the
    fact-to-orders join and the aggregation share the AQE-planned
    exchanges, and the top-20 is TakeOrderedAndProject — no global
    sort.  Exact-decimal revenue per the tier's cross-engine float
    rule.  One ANSI string runs on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(RETURNED_REVENUE_SQL)


GLOBAL_SALES_OPPORTUNITY_SQL = """
    SELECT n_name,
           COUNT(*) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                       WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
"""


def global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich customers (above the positive-balance
    average) who never ordered, rolled up by nation.

    Two subquery forms in one plan: the scalar AVG compiles to a
    1-row broadcast (computed once, not per row), and NOT EXISTS
    becomes a LEFT ANTI join on c_custkey — at 100 TB that is one
    aggregate pass + one anti join, never per-row probes.  nation
    broadcasts; exact-decimal balance sum per the tier's float rule.
    One ANSI string runs on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(GLOBAL_SALES_OPPORTUNITY_SQL)


SHIPPING_MODES_SQL = """
    SELECT l_returnflag AS ship_group,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= DATE '1996-01-01'
      AND l_shipdate < DATE '1999-01-01'
    GROUP BY ship_group
"""


def shipping_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation (CASE inside SUM)
    after a fact-fact equi-join.  The date predicate pushes into the
    lineitem scan; the CASE branches cost nothing extra — both
    counters come out of the ONE aggregation pass, where a naive
    per-priority UNION would scan and join twice.  One ANSI string
    runs on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(SHIPPING_MODES_SQL)


PROMO_REVENUE_SQL = """
    SELECT ROUND(100.0
           * CAST(SUM(CASE WHEN p_type = 'PROMO'
                           THEN CAST(l_extendedprice AS DECIMAL(12,2))
                                * (1 - CAST(l_discount AS DECIMAL(4,2)))
                           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 4)
        AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo share of revenue — a ratio of two
    conditional sums in one
    aggregation over a broadcast dimension join.  Both sums are exact
    decimals (summation-order-independent), cast to DOUBLE only for
    the single division — identical exact operands → identical IEEE
    quotient in both engines (DECIMAL division would not be safe
    here: engines disagree on quotient precision/scale promotion).
    One ANSI string runs on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(PROMO_REVENUE_SQL)


TOP_SUPPLIER_SQL = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s_suppkey,
           s_name,
           CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly
    revenue, via a scalar subquery over a shared CTE.

    Plan at scale: the revenue CTE aggregates once (shuffle keyed on
    l_suppkey after map-side partial agg); Catalyst evaluates the
    MAX scalar subquery over the same aggregate and the final equality
    is a one-row broadcast comparison.  Ties: TPC-H keeps all maximal
    suppliers — no arbitrary pick, so no tie-break is needed.  Revenue
    is exact-decimal per the tier's float rule, which is what makes
    `= MAX(...)` safe across engines at all (a double sum would make
    equality at the max an ulp lottery).  One ANSI string, both
    engines."""
    register_views(spark, sf_dir)
    return spark.sql(TOP_SUPPLIER_SQL)


SMALL_QTY_REVENUE_SQL = """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) / 7.0, 2)
                AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#4'
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
"""


def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue that would be lost by dropping
    small-quantity orders — the classic correlated scalar subquery
    (per-part average quantity) against the fact table itself.

    Catalyst decorrelates this into an aggregate-then-join: one extra
    aggregation over lineitem keyed on l_partkey, then a broadcast-
    able join of per-part thresholds back to the brand-filtered rows.
    The comparison is deterministic across engines because l_quantity
    values are small exact integers in double: their SUM is exact in
    ANY order, so AVG and 0.2*AVG are the identical double in both
    engines.  One ANSI string, both engines."""
    register_views(spark, sf_dir)
    return spark.sql(SMALL_QTY_REVENUE_SQL)


WAITING_SUPPLIERS_SQL = """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL '90' DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL '90' DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 20
"""


def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    finished multi-supplier order (late = shipped >90 days after the
    order date, standing in for the reference schema's
    receipt-vs-commit lag, which the fixture lacks).

    The interesting structure is the EXISTS + NOT EXISTS pair over
    the same fact table: Catalyst turns them into a left-semi and a
    left-anti join on l_orderkey — with the NON-equality late
    predicate correlated through the outer ORDERS row.  Both
    self-joins shuffle on l_orderkey, the key the main join already
    uses, so AQE reuses the exchange; nation/supplier broadcast.
    Top-20 via TakeOrderedAndProject with a name tie-break.  One ANSI
    string, both engines."""
    register_views(spark, sf_dir)
    return spark.sql(WAITING_SUPPLIERS_SQL)


NATION_VOLUME_SQL = """
    SELECT supp_nation, cust_nation, l_year,
           CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS revenue
    FROM (SELECT n1.n_name AS supp_nation,
                 n2.n_name AS cust_nation,
                 EXTRACT(YEAR FROM l_shipdate) AS l_year,
                 CAST(l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                 OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00') shipping
    GROUP BY supp_nation, cust_nation, l_year
"""


def nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between two nations
    by year — the two-role dimension pattern (nation joins TWICE,
    once through supplier, once through customer; Catalyst plans two
    independent broadcasts of the 25-row table).  The symmetric
    nation-pair predicate sits above both joins, and the date range
    pushes into the lineitem scan.  Exact-decimal volume per the
    tier's float rule.  One ANSI string, both engines."""
    register_views(spark, sf_dir)
    return spark.sql(NATION_VOLUME_SQL)


MARKET_SHARE_SQL = """
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                               ELSE CAST(0.00 AS DECIMAL(12,2)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 4) AS mkt_share
    FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
                 CAST(l_extendedprice AS DECIMAL(12,2))
                     * (1 - CAST(l_discount AS DECIMAL(4,2))) AS volume,
                 n2.n_name AS supp_nation
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'ASIA'
            AND p_type = 'PROMO') all_nations
    GROUP BY o_year
"""


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's PROMO-part
    volume per year — conditional aggregation over a 7-table star
    (nation again in two roles).  Decimal sums keep numerator and
    denominator exact; the DIVISION happens after casting both to
    double (decimal/decimal result scale rules differ between
    engines, double division does not).  One ANSI string, both
    engines."""
    register_views(spark, sf_dir)
    return spark.sql(MARKET_SHARE_SQL)


FORECAST_REVENUE_SQL = """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * CAST(l_discount AS DECIMAL(4,2))), 2)
                AS DOUBLE) AS revenue_increase
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
"""


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate — the query whose
    entire cost is how much the scan reads.  Every predicate pushes to
    the parquet reader (date + numeric ranges → row-group min/max
    skipping), no join, no shuffle beyond the 1-row final aggregate;
    exact-decimal product per the tier's float rule.  One ANSI string,
    both engines."""
    register_views(spark, sf_dir)
    return spark.sql(FORECAST_REVENUE_SQL)


BRACKET_REVENUE_SQL = """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
"""


def bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive predicate brackets spanning both
    join sides.  The optimizer test: Catalyst must extract the
    common-side conjuncts from the OR (every bracket constrains
    p_brand/p_size and l_quantity), push the part-only disjunction
    into the part scan and the quantity bounds into lineitem, and
    still broadcast the filtered part side — instead of evaluating
    the whole OR post-join.  One ANSI string, both engines."""
    register_views(spark, sf_dir)
    return spark.sql(BRACKET_REVENUE_SQL)


IMPORTANT_NATIONS_SQL = """
    SELECT n_name,
           CAST(ROUND(SUM(CAST(s_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
               AS total_balance
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    HAVING SUM(CAST(s_acctbal AS DECIMAL(12,2)))
           > (SELECT SUM(CAST(s_acctbal AS DECIMAL(12,2))) * 0.05
              FROM supplier)
"""


def important_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (restated on supplier balances — the fixture
    has no partsupp): groups whose share of a GLOBAL total crosses a
    threshold, i.e. HAVING against an uncorrelated scalar subquery.
    Catalyst evaluates the global sum once (1-row broadcast) and the
    HAVING is a post-aggregation filter; exact decimals keep the
    threshold comparison engine-stable.  One ANSI string, both
    engines."""
    register_views(spark, sf_dir)
    return spark.sql(IMPORTANT_NATIONS_SQL)


BEST_SUPPLIER_SQL = """
    SELECT p_partkey, p_brand, s_suppkey, s_name,
           CAST(ROUND(s_acctbal, 2) AS DOUBLE) AS s_acctbal
    FROM part
    JOIN lineitem ON l_partkey = p_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE p_size <= 5
      AND s_acctbal = (SELECT MAX(s2.s_acctbal)
                       FROM supplier s2
                       JOIN lineitem l2 ON l2.l_suppkey = s2.s_suppkey
                       WHERE l2.l_partkey = p_partkey)
    GROUP BY p_partkey, p_brand, s_suppkey, s_name, s_acctbal
"""


def best_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (restated without partsupp): for each small
    part, the supplier(s) with the maximum account balance among
    suppliers that have actually shipped it — the correlated-MAX
    subquery whose decorrelation is Q2's whole point.  Catalyst
    rewrites the subquery into a per-part aggregate joined back on
    (partkey, balance); ties keep every maximal supplier, exactly as
    Q2 keeps tied minimum-cost suppliers, so no arbitrary pick.
    Balances compare EXACTLY (same double on both sides of the
    rewrite — no arithmetic touches them).  One ANSI string, both
    engines."""
    register_views(spark, sf_dir)
    return spark.sql(BEST_SUPPLIER_SQL)


PART_SUPPLIER_COUNTS_SQL = """
    SELECT p_brand, p_type,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part
    JOIN lineitem ON l_partkey = p_partkey
    WHERE p_size BETWEEN 1 AND 25
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type
    ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC
    LIMIT 20
"""


def part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (restated through lineitem): distinct supplier
    counts per part class, EXCLUDING a supplier blacklist via NOT IN —
    the null-aware anti-join (a single NULL in the subquery would
    empty a naive NOT IN; s_suppkey is non-null here, and Spark plans
    NullAwareAntiJoin to honor the semantics regardless).  One ANSI
    string, both engines."""
    register_views(spark, sf_dir)
    return spark.sql(PART_SUPPLIER_COUNTS_SQL)


EXCESS_CAPACITY_SQL = """
    WITH shipped AS (
        SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%widget%'
          AND l_shipdate >= DATE '1996-01-01'
          AND l_shipdate <  DATE '1997-01-01'
        GROUP BY l_suppkey, l_partkey),
    tot AS (SELECT l_partkey, SUM(qty) AS total_qty
            FROM shipped GROUP BY l_partkey)
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT shipped.l_suppkey
        FROM shipped JOIN tot ON shipped.l_partkey = tot.l_partkey
        WHERE 2 * shipped.qty > tot.total_qty)
    ORDER BY s_name
"""


def excess_capacity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (restated without partsupp): suppliers who are
    the DOMINANT shipper (>50% of the year's volume) of some widget
    part — the availability-vs-demand comparison Q20 does against
    partsupp stock, re-anchored to shipped share since the fixture
    has no stock table.

    Structure preserved from Q20: a LIKE-filtered part scan, a
    date-windowed nested aggregation over lineitem, a second-level
    aggregate compared against the first (here: per-(supplier, part)
    vs per-part totals), and the qualifying supplier set applied via
    IN → left-semi join to the supplier⋈nation dimension pair (both
    broadcast).  The two aggregation levels share the l_partkey
    exchange.  ``2*qty > total`` keeps the comparison in exact
    integer-valued double arithmetic (quantities are integral; 2x is
    exact) so the >50% boundary cannot split across engines.  One
    ANSI string, both engines."""
    register_views(spark, sf_dir)
    return spark.sql(EXCESS_CAPACITY_SQL)


RECURSIVE_SPINE_SQL = """
    WITH RECURSIVE spine(m) AS (
        SELECT CAST('1992-01-01' AS DATE)
        UNION ALL
        SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM spine
        WHERE m < CAST('2001-12-01' AS DATE)
    ),
    rev AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                   ROUND(SUM(o_totalprice), 2) AS revenue,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY 1)
    SELECT year(m) AS y, month(m) AS mo,
           COALESCE(revenue, 0.0) AS revenue,
           COALESCE(n_orders, 0) AS n_orders
    FROM spine LEFT JOIN rev USING (m)
"""


def recursive_spine_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE month spine (Spark 4's WITH RECURSIVE) LEFT-joined
    to monthly revenue with zero-fill — the dense-calendar resample
    (cf. relational.daily_revenue_dense, which builds its spine with
    sequence()+explode) expressed purely in ANSI SQL, exercising the
    UnionLoop recursion operator.  The spine spans the full TPC-H
    order calendar (1992-01 through 2001-12; o_orderdate ends in
    1998, so the tail years exercise the zero-fill).  The recursion
    depth is the calendar length (120 iterations of a 1-row frame) —
    bounded and driver-cheap; the fact table is touched once by the
    aggregate.  One ANSI string, both engines; Spark's recursion
    guard defaults to 100 levels, so the 120-month spine needs the
    session knob raised (the SQL text stays engine-portable —
    ``MAX RECURSION LEVEL`` is Spark-only syntax DuckDB rejects).

    ``cteRecursionLevelLimit`` is read at EXECUTION time, not plan
    time (probed on Spark 4.1 — restoring the conf right after
    ``spark.sql()`` returns makes the caller's later ``.count()``
    fail with RECURSION_LEVEL_LIMIT_EXCEEDED), so a lazy return
    cannot restore the session conf safely.  The result is bounded
    (120 month rows regardless of fact-table size: the recursion is
    a 1-row-per-iteration calendar spine and the fact table enters
    only through a pre-aggregated monthly rollup), so we materialize
    it eagerly with ``localCheckpoint`` — truncating the lineage so
    the recursion never re-executes — and restore the caller's limit
    in a ``finally``.  The shared session leaves this function with
    exactly the conf it entered with."""
    register_views(spark, sf_dir)
    conf_key = "spark.sql.cteRecursionLevelLimit"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "130")
    try:
        return spark.sql(RECURSIVE_SPINE_SQL).localCheckpoint(eager=True)
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)


LATERAL_TOPN_SQL = """
    SELECT c.c_custkey, o.o_orderkey,
           ROUND(o.o_totalprice, 2) AS o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
"""


def lateral_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each customer's top-2 orders by
    price, stated as a per-row subquery with ORDER BY + LIMIT — the
    ANSI lateral-join surface.  Catalyst DECORRELATES it: the
    physical plan is the same partitioned rank-window + join a
    DataFrame author would write by hand (no per-customer re-scan of
    orders), which is exactly why the surface is safe at scale — the
    naive reading executes orders once per customer row, the planned
    form shuffles each table once.  One ANSI string, both engines;
    ties break on o_orderkey so the LIMIT edge is deterministic."""
    register_views(spark, sf_dir)
    return spark.sql(LATERAL_TOPN_SQL)


GROUP_BY_ALL_SQL = """
    SELECT o_orderstatus, o_orderpriority,
           year(o_orderdate) AS order_year,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
"""


def group_by_all_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (the DuckDB-originated shorthand
    Spark 4 adopted): every non-aggregate select item becomes a
    grouping key, and the full select list the sort key — one ANSI
    string both engines parse natively.  Compiles to the identical
    hash aggregate an explicit column list produces; the value is the
    surface (analyst SQL ports run unmodified)."""
    register_views(spark, sf_dir)
    return spark.sql(GROUP_BY_ALL_SQL)


PARAMETERIZED_REVENUE_SQL = """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM IDENTIFIER(:tbl)
    WHERE o_orderdate >= :start_date
      AND o_totalprice > :min_price
    GROUP BY o_orderpriority
"""


def parameterized_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4): named ``:marker`` arguments bound
    through ``spark.sql(..., args=...)`` plus the ``IDENTIFIER()``
    clause resolving a TABLE NAME from a parameter — the
    injection-safe surface for templated reports (values bind as
    typed literals, never string-spliced; the identifier is validated
    as a name, so ``tbl="orders; DROP ..."`` cannot parse as SQL).

    Binding happens at PARSE time, so the plan is byte-identical to
    the literal-inlined query: same pushed filters, same partial
    aggregate — zero runtime cost for the safety.  The oracle inlines
    the same literals textually (DuckDB's binder has no IDENTIFIER
    clause)."""
    import datetime

    register_views(spark, sf_dir)
    return spark.sql(
        PARAMETERIZED_REVENUE_SQL,
        args={
            "tbl": "orders",
            "start_date": datetime.date(1995, 1, 1),
            "min_price": 100000.0,
        },
    )
