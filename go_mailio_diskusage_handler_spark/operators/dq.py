"""Declarative data-quality constraint suite (Deequ-style).

The reference validates its input implicitly — a malformed manifest or
parquet file simply kills the refresh (``handler.go:176,186,192``
``log.Fatalf``).  A 100 TB ingest needs the opposite posture: run a
DECLARED set of constraints as ordinary aggregates over the data,
emit one (rule, metric, status) row per constraint, and let the
caller gate the snapshot swap on the suite passing.  This mirrors the
public Amazon Deequ design (Schelter et al., VLDB 2018: "Automating
Large-Scale Data Quality Verification"): constraints compile to ONE
aggregation pass per table, not one scan per rule.

Distributed shape at 100 TB:

* Rules 1-4 (completeness, uniqueness, domain, bounds) are aggregate
  expressions over a single scan of the fact table — partial
  aggregation map-side, one 1-row result.  ``countDistinct`` is the
  only one that shuffles (distinct pre-aggregates per partition on
  the key before the exchange).
* Rule 5 (referential integrity) is a LEFT ANTI join fact→dimension
  on the foreign key.  At 100 TB the dimension side (customer keys)
  is still ~GB-scale, so the anti join broadcasts; if the dimension
  outgrows the broadcast threshold, the same rule degrades to the
  bloom-probe pattern (see ``sql.py:bloom_probe_revenue``) — probe a
  bloom of dimension keys first, anti-join only the survivors.
* The per-rule rows are assembled from the two 1-row aggregate
  frames with ``F.inline`` over a literal struct array — driver never
  collects anything.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Accepted order-status domain (TPC-H dbgen emits exactly these).
ORDER_STATUS_DOMAIN = ("O", "F", "P")


def constraint_suite(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Evaluate the declared constraint suite over ``orders`` (with
    ``customer`` as the referential-integrity dimension).

    Returns one row per rule: ``rule`` (string), ``metric`` (double —
    a ratio for completeness/uniqueness, a violation count for the
    rest), ``status`` ('PASS' | 'FAIL').
    """
    one_pass = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias(
            "null_custkey"
        ),
        F.countDistinct("o_orderkey").alias("distinct_orderkey"),
        # NULL IN (...) is NULL -> falls through to the violation arm,
        # matching SQL CASE WHEN ... IN ... THEN 0 ELSE 1 END.
        F.sum(
            F.when(F.col("o_orderstatus").isin(*ORDER_STATUS_DOMAIN), 0).otherwise(1)
        ).alias("bad_status"),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)).alias("neg_price"),
    )
    # NULL foreign keys are owned by the completeness rule, not the
    # referential rule (a NULL never matches the anti join and would
    # otherwise double-report as an orphan).
    orphans = (
        orders.select("o_custkey")
        .where(F.col("o_custkey").isNotNull())
        .join(
            F.broadcast(customer.select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("orphan_rows"))
    )
    facts = one_pass.crossJoin(F.broadcast(orphans))  # 1 row x 1 row

    def rule(name: str, metric, passed):
        return F.struct(
            F.lit(name).alias("rule"),
            F.round(metric.cast("double"), 6).alias("metric"),
            F.when(passed, F.lit("PASS")).otherwise(F.lit("FAIL")).alias("status"),
        )

    n = F.col("n_rows")
    return facts.select(
        F.inline(
            F.array(
                rule(
                    "completeness:o_custkey",
                    (n - F.col("null_custkey")) / n,
                    F.col("null_custkey") == 0,
                ),
                rule(
                    "uniqueness:o_orderkey",
                    F.col("distinct_orderkey") / n,
                    F.col("distinct_orderkey") == n,
                ),
                rule(
                    "domain:o_orderstatus",
                    F.col("bad_status"),
                    F.col("bad_status") == 0,
                ),
                rule(
                    "non_negative:o_totalprice",
                    F.col("neg_price"),
                    F.col("neg_price") == 0,
                ),
                rule(
                    "referential:o_custkey->c_custkey",
                    F.col("orphan_rows"),
                    F.col("orphan_rows") == 0,
                ),
            )
        )
    )


# ---------------------------------------------------------------------------
# Join-key skew diagnosis
# ---------------------------------------------------------------------------

#: Rows one task should own after salting — the denominator of the
#: recommended salt factor (local fixture value; a real cluster sizes
#: this from executor memory / row width).
TARGET_ROWS_PER_TASK = 100_000


def join_key_skew(df: DataFrame, table: str, key: str) -> DataFrame:
    """Per-key cardinality profile for one prospective join key:
    row/key counts, the heaviest key's share, and a recommended salt
    factor (``ceil(max_key_rows / TARGET_ROWS_PER_TASK)``, min 1).

    Two-level aggregation — per-key counts partial-aggregate map-side,
    then a key-count-table-sized summary — so the profile costs one
    shuffle regardless of fact size.  Run this BEFORE a big join: a
    skew_ratio in the hundreds means the naive shuffle join stalls on
    one task and the join should go through the salting path
    (``salted_event_totals``) or AQE skew splitting.
    """
    per_key = df.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    return per_key.agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").alias("max_key_rows"),
        F.round(F.sum("c") / F.count(F.lit(1)), 4).alias("avg_key_rows"),
        F.round(F.max("c") * F.count(F.lit(1)) / F.sum("c"), 4).alias(
            "skew_ratio"
        ),
        F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.max("c") / F.lit(TARGET_ROWS_PER_TASK)),
        ).alias("salt_factor"),
    ).select(
        F.lit(table).alias("table_name"),
        F.lit(key).alias("key_name"),
        "n_rows",
        "n_keys",
        "max_key_rows",
        "avg_key_rows",
        "skew_ratio",
        "salt_factor",
    )


def join_key_skew_report(
    orders: DataFrame, lineitem: DataFrame, events: DataFrame
) -> DataFrame:
    """One skew profile row per declared (table, join key) pair — the
    pre-flight report for the engine's recurring join keys."""
    return (
        join_key_skew(orders, "orders", "o_custkey")
        .unionByName(join_key_skew(lineitem, "lineitem", "l_orderkey"))
        .unionByName(join_key_skew(events, "events", "user_id"))
    )
