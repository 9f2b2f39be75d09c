"""Join operators (SURVEY.md §2.4).

The reference implements **no joins at all** — it pivots to wide
columns (consumer_postgres_streaming.py:391-393) and filters in pandas
instead. This module is the capability gap filled with the full Spark
join surface, each function choosing the join strategy that survives a
100×-scale-up:

* tiny dims (region=5, nation=25 rows, fixed size at any SF) →
  explicit ``F.broadcast`` — zero shuffle of the fact side;
* fact ⋈ fact (lineitem ⋈ orders) → sort-merge on the join key; AQE
  converts to shuffled-hash / handles skew at runtime;
* existence checks → ``left_semi`` / ``left_anti`` (no row
  multiplication, no wide row payload through the shuffle);
* temporal proximity (the as-of analog) → bounded range self-join with
  an equi-key component so Spark can still hash-partition on user_id —
  never a pure theta cross-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from big_data_exercise_spark.functions.numeric import (
    DEC,
    exact_avg,
    exact_sum,
    round_det,
)


def regional_customer_stats(
    customer: DataFrame, nation: DataFrame, region: DataFrame
) -> DataFrame:
    """Customers per region via a two-hop broadcast dimension join.

    nation and region are size-invariant tiny dims → broadcast both;
    the customer scan never shuffles for the join (only the final
    5-group aggregation does, post map-side combine).
    """
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            exact_sum(F.col("c_acctbal")).alias("total_acctbal"),
            exact_avg(F.col("c_acctbal")).alias("avg_acctbal"),
        )
    )


def order_revenue_by_priority(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Fact ⋈ fact equi-join (sort-merge / AQE-chosen) + aggregation.

    Pre-aggregating lineitem to one row per orderkey BEFORE the join
    keeps the shuffled payload minimal — at 100 TB this cuts the join
    input by the lineitem:orders fan-in (~4×) and makes the join key
    unique on both sides.
    """
    # Both aggregation levels accumulate in exact decimal so the result
    # is independent of partial-agg order (oracle-stable at any SF).
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
        ).alias("rev")
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            round_det(F.sum("rev").cast("double"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def customers_with_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT SEMI join (EXISTS): segment counts of customers that placed
    at least one high-value order. Semi join never duplicates the left
    side and drops the right payload before the shuffle."""
    big_orders = orders.filter(F.col("o_totalprice") > 100.0)
    return (
        customer.join(big_orders, customer.c_custkey == big_orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


def parts_never_ordered(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): parts that never appear in any
    lineitem. Returns the part rows themselves (projected)."""
    return (
        part.join(lineitem, part.p_partkey == lineitem.l_partkey, "left_anti")
        .select("p_partkey", "p_name", "p_brand")
    )


def prior_events_within(
    events: DataFrame,
    anchor_type: str = "error",
    prior_type: str = "click",
    minutes: int = 10,
) -> DataFrame:
    """Bounded range self-join — the as-of/temporal-proximity analog.

    For each ``anchor_type`` event, count ``prior_type`` events by the
    same user in the preceding ``minutes``. The equi-component
    (user_id) lets Spark hash-partition both sides; the range predicate
    is evaluated post-shuffle within each user's partition, so the cost
    is bounded by per-user event counts, not |events|² — the property
    that keeps this viable at 100 TB (plus AQE skew-split for hot
    users).
    """
    anchors = events.filter(F.col("event_type") == anchor_type).select(
        F.col("event_id").alias("anchor_id"),
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
    )
    priors = events.filter(F.col("event_type") == prior_type).select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    window_lo = F.col("a_ts") - F.expr(f"INTERVAL {minutes} MINUTES")
    joined = anchors.join(
        priors,
        (F.col("a_user") == F.col("p_user"))
        & (F.col("p_ts") >= window_lo)
        & (F.col("p_ts") < F.col("a_ts")),
        "left",
    )
    return (
        joined.groupBy("anchor_id", "a_user")
        .agg(F.sum(F.when(F.col("p_ts").isNotNull(), 1).otherwise(0)).alias("n_prior"))
        .select(
            F.col("anchor_id").alias("event_id"),
            F.col("a_user").alias("user_id"),
            F.col("n_prior").cast("long").alias("n_prior"),
        )
    )


def last_prior_event(
    events: DataFrame, anchor_type: str = "error", prior_type: str = "click"
) -> DataFrame:
    """True as-of join: for each anchor event, the timestamp of the
    most recent strictly-earlier prior-type event by the same user.

    Implemented as a UNION + window (max of tagged ts over preceding
    rows) instead of a range join: one shuffle on user_id, one sort —
    the classic scalable as-of plan (a range join re-scans candidates
    per anchor; the window pass is linear per user)."""
    from pyspark.sql import Window as W

    tagged = events.filter(
        F.col("event_type").isin(anchor_type, prior_type)
    ).select("event_id", "user_id", "ts", "event_type")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    last_prior = F.max(
        F.when(F.col("event_type") == prior_type, F.col("ts"))
    ).over(w)
    return (
        tagged.withColumn("last_prior_ts", last_prior)
        .filter(F.col("event_type") == anchor_type)
        .select("event_id", "user_id", "last_prior_ts")
    )


def user_segment_coverage(events: DataFrame, customer: DataFrame) -> DataFrame:
    """FULL OUTER join: active event users vs the customer dimension,
    rolled up per segment (NULL segment = users with no customer row).
    COUNT(col) vs COUNT(*) distinguishes the unmatched sides."""
    users = events.select("user_id").distinct()
    dim = customer.select(
        F.col("c_custkey").alias("cust_id"), F.col("c_mktsegment").alias("segment")
    )
    joined = users.join(dim, users.user_id == dim.cust_id, "full_outer")
    return joined.groupBy("segment").agg(
        F.count("*").alias("n_rows"),
        F.count("user_id").alias("n_active_users"),
        F.count("cust_id").alias("n_customers"),
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: 3-way join (dim-filtered customer → orders →
    lineitem) + grouped revenue + top-k. The segment filter prunes
    customer BEFORE the join (semi-join-like reduction); revenue
    accumulates in exact decimal. Composes the join surface into the
    reference's dashboard-style 'top N' answer (O1) across 3 tables."""
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    items = lineitem.filter(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        items.join(ords, items.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey, "left_semi")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            round_det(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
                ).cast("double"),
                2,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(k)
    )


def local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5 shape: 5-way join where customer and supplier must sit
    in the SAME nation, restricted to one region. nation/region are
    size-invariant dims → explicit broadcast; supplier GROWS with SF,
    so it carries no hint — Catalyst broadcasts it while small and AQE
    falls back to a shuffle join at the 100 TB regime (a forced
    broadcast there would OOM an executor). The fact chain shuffles
    once per equi-key; the same-nation predicate rides the supplier
    join (no extra pass)."""
    nations = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            nation.n_regionkey == region.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            supplier.select("s_suppkey", "s_nationkey"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            round_det(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
                ).cast("double"),
                2,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def returned_item_report(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer —
    lineitem filtered to returnflag='R' BEFORE the join chain, nation
    broadcast, top-k customers by lost revenue."""
    returned = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        returned.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.select("c_custkey", "c_name", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            round_det(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
                ).cast("double"),
                2,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(k)
    )


def late_shipment_priority_counts(
    orders: DataFrame,
    lineitem: DataFrame,
    start: str = "1996-01-01",
    end: str = "1996-07-01",
    grace_days: int = 60,
) -> DataFrame:
    """TPC-H Q4 shape: orders in a date window having at least one item
    shipped more than ``grace_days`` after the order date, counted per
    priority. (The testdata lacks commit/receipt dates, so "late" is
    defined against o_orderdate.)

    LEFT SEMI keeps the probe side free of row multiplication — an
    order with 7 late items counts once, and the lineitem payload never
    travels past the join. The date window prunes orders at the scan;
    the final groupBy is 5 groups after map-side combine.
    """
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    items = lineitem.select("l_orderkey", "l_shipdate")
    late = (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {grace_days} DAYS")
    )
    return (
        ords.join(items, (F.col("o_orderkey") == F.col("l_orderkey")) & late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def priority_flag_counts(
    orders: DataFrame,
    lineitem: DataFrame,
    start: str = "1996-01-01",
    end: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q12 shape: per lineitem attribute (returnflag stands in
    for the missing shipmode column), how many lines belong to
    high-priority vs low-priority orders. Conditional SUM(CASE) per
    group — one fact ⋈ fact sort-merge join, then a 3-group agg."""
    items = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        items.join(
            orders.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


def promo_revenue_ratio(
    lineitem: DataFrame,
    part: DataFrame,
    start: str = "1996-09-01",
    end: str = "1996-10-01",
) -> DataFrame:
    """TPC-H Q14 shape: % of one month's revenue from PROMO parts.
    Both conditional sums accumulate in exact decimal within ONE
    aggregation pass; the ratio is finished in double and rounded
    engine-stably. part grows with SF (not broadcastable at 100 TB) —
    plain equi-join, AQE picks the strategy."""
    items = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC))
    return (
        items.join(
            part.select("p_partkey", "p_type"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            round_det(
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_revenue_pct")
        )
    )


_Q19_BRACKETS = [
    ("Brand#1", 1, 5, 1, 11),
    ("Brand#13", 1, 10, 10, 20),
    ("Brand#23", 1, 15, 20, 30),
]


def bracket_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue from an OR-of-ANDs bracket predicate
    over (brand, size range, quantity range). The classic Q19 trap is
    embedding the disjunction in the join condition, which blocks the
    hash join; here the join is a clean equi-join on partkey and the
    brackets are a post-join filter Catalyst can still use for
    pushdown of the common bounds."""
    bracket = None
    for brand, smin, smax, qmin, qmax in _Q19_BRACKETS:
        clause = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(smin, smax)
            & F.col("l_quantity").between(qmin, qmax)
        )
        bracket = clause if bracket is None else (bracket | clause)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    return (
        lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(
            part.select("p_partkey", "p_brand", "p_size"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(bracket)
        .agg(
            F.count("*").alias("n_items"),
            round_det(F.sum(rev).cast("double"), 2).alias("revenue"),
        )
    )


def customer_order_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed k orders, for every
    k — including k=0, which is why the join must be LEFT OUTER (an
    inner join silently drops the order-less customers the question is
    usually about). Two aggregations: per-customer count, then the
    count-of-counts; both are map-side combinable, and the second
    one's key space is tiny (distinct order counts)."""
    per_cust = (
        customer.select("c_custkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))  # count skips NULLs
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").alias("n_customers")
    )


def small_quantity_revenue(lineitem: DataFrame, frac: float = 0.5) -> DataFrame:
    """TPC-H Q17 shape: revenue from items whose quantity is below
    ``frac`` × that part's average quantity. The per-part average is a
    derived aggregate joined back to the fact — a self-agg-join, NOT a
    correlated subquery per row. Both sides shuffle on l_partkey (at
    scale: bucket lineitem by partkey and neither side shuffles); the
    threshold is computed with the decimal-exact average so both
    engines agree on boundary rows."""
    from big_data_exercise_spark.functions.numeric import DEC

    per_part = lineitem.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(frac)
            * (F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count("l_quantity"))
        ).alias("qty_lim")
    )
    joined = lineitem.join(
        per_part,
        (F.col("l_partkey") == F.col("pk")) & (F.col("l_quantity") < F.col("qty_lim")),
    )
    return joined.agg(
        F.count("*").alias("n_items"),
        round_det(
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / F.lit(7.0), 2
        ).alias("avg_yearly"),
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 250.0,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a
    threshold (HAVING over a grouped fact), enriched with customer
    identity. The HAVING filter runs on the aggregated (small) side
    BEFORE the joins, so only qualifying orders travel; top-k by
    totalprice finishes with TakeOrderedAndProject."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(exact_sum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > min_qty)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(k)
    )


def dormant_rich_customers(customer: DataFrame, events: DataFrame) -> DataFrame:
    """TPC-H Q22 shape: per-nation count of above-average-balance
    customers who never made a purchase. The global average is a
    one-row aggregate broadcast back over the scan (a scalar subquery,
    never a driver-side collect); the "never purchased" predicate is a
    LEFT ANTI join against the filtered event stream. Decimal-exact
    average so the threshold is identical in both engines."""
    from big_data_exercise_spark.functions.numeric import DEC

    threshold = (
        customer.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(F.col("c_acctbal").cast(DEC)).cast("double") / F.count("c_acctbal"))
            .alias("avg_bal")
        )
    )
    purchasers = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("buyer_id")
    )
    return (
        customer.join(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(purchasers, F.col("c_custkey") == F.col("buyer_id"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            exact_sum(F.col("c_acctbal")).alias("total_acctbal"),
        )
    )


def supplier_variety(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q16 shape (partsupp-free analog): how many distinct
    suppliers ship each (brand, size-bucket) of part. COUNT DISTINCT
    after a join is the expensive form — Spark expands to a two-phase
    aggregate (dedup on the full grouping+supplier key, then count),
    so the shuffle carries the distinct triples, not the raw rows."""
    sized = part.select(
        "p_partkey", "p_brand", (F.col("p_size") - F.col("p_size") % 10).alias("size_bucket")
    )
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(sized, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "size_bucket")
        .agg(F.count_distinct("l_suppkey").alias("n_suppliers"))
    )


def min_cost_part_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    lineitem: DataFrame,
    region_name: str = "EUROPE",
    min_size: int = 40,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q2 shape: for each large part, the in-region supplier(s)
    offering the minimum unit price. The classic correlated MIN
    subquery, decorrelated into agg + equi-join: per-(part, supplier)
    min unit price, then per-part min, then an equality join back —
    three shuffles on l_partkey that AQE collapses onto one exchange
    reuse. Unit price is a raw IEEE double division (identical bits in
    any engine), so the min-equality join is exact with no rounding.
    nation⋈region broadcast (size-invariant dims); the regional
    supplier slice grows with SF, so it carries no broadcast hint —
    Catalyst broadcasts it while small, AQE degrades to a shuffle join
    at scale."""
    regional_supp = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        lineitem.select(
            "l_partkey",
            "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        )
        .join(
            regional_supp.select("s_suppkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("unit_price").alias("supp_cost"))
    )
    best = offers.groupBy(F.col("l_partkey").alias("bp")).agg(
        F.min("supp_cost").alias("min_cost")
    )
    return (
        offers.join(
            best,
            (F.col("l_partkey") == F.col("bp"))
            & (F.col("supp_cost") == F.col("min_cost")),
        )
        .join(
            part.filter(F.col("p_size") >= min_size).select("p_partkey", "p_name"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(regional_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "min_cost")
        .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
        .limit(k)
    )


def nation_trade_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7 shape: shipped revenue between two nations, by
    direction and ship year. Two broadcast copies of the nation dim
    (supplier side, customer side) with the OR'd pair filter applied
    AFTER both joins — Catalyst pushes each nation's IN-list down to
    its own join input, so the fact tables shuffle only for the
    lineitem⋈orders⋈customer equi-joins. supplier scales with SF and
    carries no broadcast hint (Catalyst/AQE choose)."""
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b)
    ) | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("revenue")
        )
    )


def nation_market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    target_nation: str = "NATION_5",
    region_name: str = "AMERICA",
    p_type: str = "ECONOMY",
) -> DataFrame:
    """TPC-H Q8 shape: the target nation's share of one region's
    ECONOMY-part order revenue, per order year. The share is a
    conditional aggregate ratio — both numerator and denominator
    accumulate in DECIMAL(30,8) within one grouped pass (a single
    shuffle), divided in double and rounded at the edge."""
    cust_region = (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = supplier.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"),
                                  F.col("n_name").alias("supp_nation"))),
        supplier.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        lineitem.join(part.filter(F.col("p_type") == p_type).select("p_partkey"),
                      F.col("l_partkey") == F.col("p_partkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ).select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust_region, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    num = F.sum(
        F.when(F.col("supp_nation") == target_nation, vol).otherwise(F.lit(0.0))
        .cast(DEC)
    ).cast("double")
    den = F.sum(vol.cast(DEC)).cast("double")
    return (
        base.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(round_det(num / den, 4).alias("mkt_share"))
    )


def product_type_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_word: str = "red",
) -> DataFrame:
    """TPC-H Q9 shape: profit on 'red' parts per supplier nation and
    order year. The reference schema has no partsupp, so supply cost
    is modeled as 10% of p_retailprice — the plan shape (4-way fact ⋈
    dim join, substring predicate pushed to the part scan, two-key
    grouped decimal agg) is what matters, not the cost constant."""
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        lineitem.join(
            part.filter(F.col("p_name").contains(name_word))
            .select("p_partkey", "p_retailprice"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(exact_sum(amount).alias("sum_profit"))
    )


def important_parts(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_3",
    fraction: float = 0.001,
) -> DataFrame:
    """TPC-H Q11 shape: parts whose stocked value from one nation's
    suppliers exceeds a fraction of that nation's total. The HAVING
    threshold is a global scalar over the SAME filtered scan —
    computed as a one-row aggregate cross-broadcast back over the
    per-part rollup (never a driver collect). Both the per-part value
    and the global total accumulate in decimal; the comparison runs on
    the unrounded doubles identically in both engines."""
    nat_supp = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        supplier.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey")
    # nat_supp is a supplier slice (scales with SF): no broadcast hint.
    scoped = lineitem.join(
        nat_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    per_part = scoped.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("value_d")
    )
    total = scoped.agg(
        F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("total_d")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_d") > F.col("total_d") * F.lit(fraction))
        .select("l_partkey", round_det(F.col("value_d"), 2).alias("part_value"))
    )


def top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly
    revenue. The revenue view aggregates once; the max is a one-row
    aggregate OVER that view, broadcast back for the equality filter
    (Spark reuses the shuffle via AQE exchange reuse). Revenue is
    rounded deterministically BEFORE the max comparison so ties break
    identically across engines."""
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        # the filtered rev side is ~1 row; supplier scales with SF — no
        # hint, Catalyst/AQE broadcast the genuinely small side
        .join(supplier, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def part_promotion_suppliers(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_prefix: str = "small",
    min_qty: float = 40.0,
    nation_name: str = "NATION_3",
) -> DataFrame:
    """TPC-H Q20 shape: suppliers of one nation who shipped more than
    a threshold quantity of any 'small%' part in 1996 — the nested-IN
    form (IN over a grouped HAVING subquery) decorrelated to a
    grouped filter + LEFT SEMI join. The quantity sum accumulates in
    decimal; the HAVING compares unrounded doubles identically in
    both engines."""
    qualifying = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            part.filter(F.col("p_name").startswith(name_prefix))
            .select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty"))
        .filter(F.col("qty") > min_qty)
        .select("l_suppkey")
    )
    return (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == nation_name)),
            supplier.s_nationkey == nation.n_nationkey,
            "left_semi",
        )
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


def waiting_suppliers(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    late_days: int = 90,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper on a
    finished multi-supplier order. EXISTS (another supplier in the
    order) and NOT EXISTS (another LATE supplier) decorrelate into two
    per-order aggregates — distinct-supplier count ≥ 2, late-supplier
    count == 1 — joined back on o_orderkey, so the whole query is
    three shuffles on the order key instead of four correlated probes.
    'Late' is shipdate > orderdate + 90 days (this schema carries no
    commit/receipt dates; reference lineitem has only l_shipdate)."""
    li = lineitem.join(
        orders.filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    late = li.filter(
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
    )
    multi_supp = (
        li.groupBy(F.col("l_orderkey").alias("mo_key"))
        .agg(F.count_distinct("l_suppkey").alias("n_supp"))
        .filter(F.col("n_supp") >= 2)
        .select("mo_key")
    )
    sole_late = (
        late.groupBy(F.col("l_orderkey").alias("so_key"))
        .agg(F.count_distinct("l_suppkey").alias("n_late"))
        .filter(F.col("n_late") == 1)
        .select("so_key")
    )
    return (
        late.join(multi_supp, F.col("l_orderkey") == F.col("mo_key"), "left_semi")
        .join(sole_late, F.col("l_orderkey") == F.col("so_key"), "left_semi")
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(k)
    )


def fuzzy_supplier_matches(supplier: DataFrame) -> DataFrame:
    """Exact edit-distance-≤1 self-join via deletion-neighborhood
    blocking (the SymSpell construction): every name generates itself
    plus its |s| single-character deletions; two strings within edit
    distance 1 MUST share one of these variants (substitution → delete
    the differing position from both; insert/delete → the shorter
    string is itself a deletion of the longer), so the variant
    equi-join finds every qualifying pair with zero recall loss and a
    bounded |s|+1 fanout per row — no all-pairs Levenshtein, which is
    the difference between O(n²·L²) and O(n·L) work at catalog scale.
    Candidates sharing a variant can still be distance 2 (two
    different deletions colliding), so each is verified with one exact
    Levenshtein — integer DP, engine-identical by definition.

    This is the scalable record-linkage sibling of the bounded
    all-pairs kernel (prefix_edit_distances); the fixture's
    sequential supplier names make a dense distance-1 graph, a good
    stress of the dedup-by-blocking shape."""
    base = supplier.select(
        F.col("s_suppkey").alias("sk"), F.col("s_name").alias("name")
    )
    variants = base.select(
        "sk",
        "name",
        F.explode(
            F.concat(
                F.array(F.col("name")),
                F.expr(
                    "transform(sequence(1, length(name)), i ->"
                    " concat(substring(name, 1, i - 1),"
                    " substring(name, i + 1, length(name))))"
                ),
            )
        ).alias("v"),
    )
    a = variants.select(
        F.col("sk").alias("id1"), F.col("name").alias("n1"), "v"
    )
    b = variants.select(
        F.col("sk").alias("id2"), F.col("name").alias("n2"), "v"
    )
    return (
        a.join(b, "v")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", "n1", "n2")
        .distinct()
        .filter(F.levenshtein("n1", "n2") <= 1)
        .select(
            "id1",
            "id2",
            F.levenshtein("n1", "n2").cast("int").alias("edit_distance"),
        )
    )


def fulfillment_lag_stats(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Order-to-ship lag per order priority: the operational SLA
    report (did urgent orders actually ship faster?). One fact⋈fact
    equi-join on the order key, then integer day-lag stats — min/max
    exact, the mean from an exact integer sum over one IEEE division,
    and an exact p90 (mergeable percentile_approx at 100 TB)."""
    from big_data_exercise_spark.functions.numeric import round_det

    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    joined = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).select("o_orderpriority", lag.alias("lag_days"))
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.min("lag_days").cast("int").alias("min_lag"),
            F.max("lag_days").cast("int").alias("max_lag"),
            round_det(
                F.sum("lag_days").cast("double") / F.count("*"), 4
            ).alias("avg_lag"),
            round_det(F.expr("percentile(lag_days, 0.9)"), 4).alias("p90_lag"),
        )
    )
