"""TPC-H-shaped integration queries (SURVEY.md §5 "TPC-H-style
end-to-end"): multi-operator pipelines over the star schema, restricted
to the columns the fixtures actually have (FIXTURES.md — e.g. no
o_shippriority, so Q3 carries o_orderpriority).  The flagship Q1 shape
lives in relational.py (``flagship_q1_pricing_summary``).

Money arithmetic follows the exact-cents policy (functions/exact.py):
sums shuffle integer cents — order-independent, so AQE/partitioning
cannot flip the hash.  Scale: dims broadcast, facts shuffle on join
keys only, aggregates are map-side combinable, top-k fuses to
TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparketl.registry import query
from sparketl.tables import load_tables, table

# revenue = sum(l_extendedprice * (1 - l_discount)) in exact cents:
# price has 2 decimals, discount 2 decimals -> price*(1-disc) has <= 4
# decimal digits; scale by 10^4 before rounding to integer units.
_REV_S = (
    "round(sum(cast(round(l_extendedprice * (1 - l_discount) * 10000) as bigint))"
    " / cast(10000 as double), 6)"
)
_REV_D = (
    "round(sum(cast(round(l_extendedprice * (1 - l_discount) * 10000) as bigint))"
    " / cast(10000 as double), 6)"
)


@query(
    "tpch_q3_shape",
    oracle=f"""
        select l.l_orderkey,
               {_REV_D} as revenue,
               strftime(o.o_orderdate, '%Y-%m-%d') as order_date,
               o.o_orderpriority
        from customer c
        join orders o on c.c_custkey = o.o_custkey
        join lineitem l on o.o_orderkey = l.l_orderkey
        where c.c_mktsegment = 'BUILDING'
          and o.o_orderdate < timestamp '1997-01-01'
          and l.l_shipdate > timestamp '1997-01-01'
        group by l.l_orderkey, o.o_orderdate, o.o_orderpriority
        order by revenue desc, l.l_orderkey asc
        limit 10
    """,
)
def tpch_q3_shape(spark, sf_dir):
    """Q3 shape (shipping priority): segment-filtered customers x
    unshipped orders x late-shipping lineitems, top-10 by revenue.
    Deterministic top-k: revenue is an exact cents sum; ties broken by
    l_orderkey.  Plan: both dims (filtered customer, orders) hash-join
    the lineitem fact; ORDER BY+LIMIT fuses to TakeOrderedAndProject."""
    c = table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(_REV_S).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "tpch_q6_forecast",
    oracle="""
        select round(sum(cast(round(l_extendedprice * l_discount * 10000) as bigint))
                     / cast(10000 as double), 6) as revenue_delta,
               count(*) as n_lines
        from lineitem
        where l_shipdate >= timestamp '1996-01-01'
          and l_shipdate < timestamp '1997-01-01'
          and l_discount between 0.05 and 0.07
          and l_quantity < 24
    """,
)
def tpch_q6_forecast(spark, sf_dir):
    """Q6 (forecasting revenue change): pure scan-filter-aggregate —
    the pushdown showcase: every predicate reaches the parquet scan
    (test_plans.py asserts PushedFilters) and the sum is a single
    map-side-combined agg with no join at all."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * F.col("l_discount") * 10000
                    ).cast("bigint")
                )
                / F.lit(10000).cast("double"),
                6,
            ).alias("revenue_delta"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "tpch_q10_returns",
    oracle=f"""
        select c.c_custkey, c.c_name, n.n_name as nation,
               {_REV_D} as lost_revenue,
               count(*) as n_return_lines
        from customer c
        join orders o on c.c_custkey = o.o_custkey
        join lineitem l on o.o_orderkey = l.l_orderkey
        join nation n on c.c_nationkey = n.n_nationkey
        where l.l_returnflag = 'R'
          and o.o_orderdate >= timestamp '1996-01-01'
          and o.o_orderdate < timestamp '1996-07-01'
        group by c.c_custkey, c.c_name, n.n_name
        order by lost_revenue desc, c.c_custkey asc
        limit 20
    """,
)
def tpch_q10_returns(spark, sf_dir):
    """Q10 shape (returned-item reporting): top-20 customers by revenue
    lost to returns in a half-year window.  Plan: nation broadcasts;
    customer/orders/lineitem chain on keys; AQE reorders/converts as
    stats arrive."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.expr(_REV_S).alias("lost_revenue"), F.count("*").alias("n_return_lines"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Decorrelation suite (round 3): the TPC-H shapes a Presto-ETL user
# actually has in their pipeline repo — EXISTS / NOT EXISTS, IN /
# NOT IN, correlated scalar subqueries, disjunctive join predicates,
# outer-join + double aggregation.  Adapted to the fixture columns
# (FIXTURES.md: no partsupp / commitdate / receiptdate / shipmode /
# phone, so the correlating predicates use the columns that exist).
#
# Subquery-shaped queries are written as Spark SQL on purpose: the
# point is that Catalyst's RewriteCorrelatedScalarSubquery /
# RewritePredicateSubquery turn them into the same distributed
# joins a hand-written DataFrame plan would use (SURVEY.md §4 row
# "subquery decorrelation") — asserted in tests/test_plans.py.
# Aggregate-heavy shapes without subqueries stay DataFrame-API.
# ---------------------------------------------------------------------------


@query(
    "tpch_q4_priority_exists",
    oracle="""
        select o.o_orderpriority, count(*) as order_count
        from orders o
        where o.o_orderdate >= timestamp '1996-01-01'
          and o.o_orderdate < timestamp '1996-04-01'
          and exists (
              select 1 from lineitem l
              where l.l_orderkey = o.o_orderkey
                and l.l_shipdate > o.o_orderdate + interval 60 day
          )
        group by o.o_orderpriority
        order by o.o_orderpriority
    """,
)
def tpch_q4_priority_exists(spark, sf_dir):
    """Q4 shape (order-priority checking) via correlated EXISTS: count
    orders per priority having at least one line shipped >60 days
    after order date (commitdate/receiptdate don't exist in the
    fixtures; the ship-lag predicate keeps the correlated two-column
    comparison).  Catalyst rewrites the EXISTS to a LEFT SEMI hash
    join on l_orderkey — the lineitem fact is scanned once, the
    ship-lag predicate evaluates join-side, and the count is a
    map-side-combined agg over ~5 groups.  Scale: semi join shuffles
    only (orderkey, orderdate) pairs, never wide rows."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        select o.o_orderpriority, count(*) as order_count
        from orders o
        where o.o_orderdate >= timestamp '1996-01-01'
          and o.o_orderdate < timestamp '1996-04-01'
          and exists (
              select 1 from lineitem l
              where l.l_orderkey = o.o_orderkey
                and l.l_shipdate > o.o_orderdate + interval 60 day
          )
        group by o.o_orderpriority
        order by o.o_orderpriority
    """)


@query(
    "tpch_q5_local_supplier",
    oracle=f"""
        select n.n_name as nation, {_REV_D} as revenue
        from customer c
        join orders o on c.c_custkey = o.o_custkey
        join lineitem l on o.o_orderkey = l.l_orderkey
        join supplier s on l.l_suppkey = s.s_suppkey
                       and c.c_nationkey = s.s_nationkey
        join nation n on s.s_nationkey = n.n_nationkey
        join region r on n.n_regionkey = r.r_regionkey
        where r.r_name = 'ASIA'
          and o.o_orderdate >= timestamp '1996-01-01'
          and o.o_orderdate < timestamp '1997-01-01'
        group by n.n_name
        order by revenue desc, nation asc
    """,
)
def tpch_q5_local_supplier(spark, sf_dir):
    """Q5 shape (local-supplier volume): revenue by nation where the
    supplier and customer share a nation inside one region — the
    classic 6-table join with a SECOND, non-hierarchical equi-condition
    (c_nationkey = s_nationkey) that prunes the join graph.  Plan:
    region+nation+supplier collapse to a broadcast dim; the
    customer->orders->lineitem chain shuffles on its keys once; the
    nationkey equality rides the supplier join as an extra conjunct
    (no new shuffle).  Exact-cents revenue -> order-independent."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    dim = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(dim),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.expr(_REV_S).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("nation").asc())
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
        select n1.n_name as supp_nation, n2.n_name as cust_nation,
               year(l.l_shipdate) as l_year, {_REV_D} as revenue
        from supplier s
        join lineitem l on s.s_suppkey = l.l_suppkey
        join orders o on o.o_orderkey = l.l_orderkey
        join customer c on c.c_custkey = o.o_custkey
        join nation n1 on s.s_nationkey = n1.n_nationkey
        join nation n2 on c.c_nationkey = n2.n_nationkey
        where ((n1.n_name = 'NATION_3' and n2.n_name = 'NATION_7')
            or (n1.n_name = 'NATION_7' and n2.n_name = 'NATION_3'))
          and l.l_shipdate >= timestamp '1996-01-01'
          and l.l_shipdate < timestamp '1998-01-01'
        group by supp_nation, cust_nation, l_year
        order by supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """Q7 shape (volume shipping): bilateral trade between two nations
    by year — the self-joined-dimension shape (nation appears twice
    under different roles) with a disjunctive cross-pair predicate.
    Plan: the disjunction implies ``n_name IN (N3, N7)`` on EACH nation
    role independently, so both broadcast copies are pre-filtered to 2
    rows — the inner broadcast-hash probes then prune ~92% of supplier
    and customer fact rows DURING the joins (2 of 25 nations survive),
    and only the cross-pair residual (which references both roles and
    genuinely cannot be pushed below either join) evaluates above.
    Supplier⨝nation joins before lineitem so the big fact probe is
    against the pruned supplier build side.  Facts shuffle once per
    equi-key."""
    both = ("NATION_3", "NATION_7")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    n1 = table(spark, sf_dir, "nation").where(F.col("n_name").isin(*both)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").where(F.col("n_name").isin(*both)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s = table(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key")
    )
    c = table(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key")
    )
    return (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .where(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.expr(_REV_S).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q13_cust_distribution",
    oracle="""
        select c_count, count(*) as custdist
        from (
            select c.c_custkey, count(o.o_orderkey) as c_count
            from customer c
            left outer join (
                select * from orders where o_orderpriority <> '5-LOW'
            ) o on c.c_custkey = o.o_custkey
            group by c.c_custkey
        )
        group by c_count
        order by custdist desc, c_count desc
    """,
)
def tpch_q13_cust_distribution(spark, sf_dir):
    """Q13 shape (customer order-count distribution): left outer join
    with a right-side-only predicate (priority filter stands in for
    the comment filter), then TWO stacked aggregations — per-customer
    count including the zero-order customers the outer join preserves,
    then the distribution over those counts.  Plan: the filter
    evaluates below the join (equivalent to the ON-clause placement
    for outer joins on the preserved side); agg #1 shuffles on
    c_custkey, agg #2 on the tiny c_count domain — the second shuffle
    is a few hundred bytes regardless of SF."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "5-LOW")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q14_promo_revenue",
    oracle="""
        select round(
            100.0 * sum(case when p.p_type = 'PROMO'
                  then cast(round(l.l_extendedprice * (1 - l.l_discount) * 10000) as bigint)
                  else 0 end)
            / sum(cast(round(l.l_extendedprice * (1 - l.l_discount) * 10000) as bigint)),
            6) as promo_pct
        from lineitem l
        join part p on p.p_partkey = l.l_partkey
        where l.l_shipdate >= timestamp '1996-09-01'
          and l.l_shipdate < timestamp '1996-10-01'
    """,
)
def tpch_q14_promo_revenue(spark, sf_dir):
    """Q14 shape (promotion effect): percent of one month's revenue
    from PROMO-type parts — conditional aggregation over a fact-dim
    join.  Both numerator and denominator sum exact integer cents*100
    (order-independent), and the single double division happens once
    on the final pair, so the percentage is bit-stable under any
    partitioning.  Plan: part broadcasts; one map-side-combined agg,
    no shuffle of the fact beyond the scan."""
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("bigint")
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0)))
                / F.sum(cents),
                6,
            ).alias("promo_pct")
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
        with rev as (
            select l_suppkey as supplier_no, {_REV_D} as total_revenue
            from lineitem
            where l_shipdate >= timestamp '1996-01-01'
              and l_shipdate < timestamp '1996-04-01'
            group by l_suppkey
        )
        select s.s_suppkey, s.s_name, r.total_revenue
        from supplier s
        join rev r on s.s_suppkey = r.supplier_no
        where r.total_revenue = (select max(total_revenue) from rev)
        order by s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    """Q15 shape (top supplier): CTE consumed twice — once as the join
    input, once inside an uncorrelated scalar subquery (max revenue).
    The revenue is an exact-cents sum, so the max and the equality
    against it are deterministic doubles (identical integer->double
    arithmetic on both engines; no epsilon needed).  Catalyst turns
    the scalar subquery into a one-row broadcast joined against the
    aggregated CTE.  Scale: the CTE output is |suppliers| rows — the
    double evaluation costs one extra pass over a key-sized aggregate,
    not over the fact."""
    load_tables(spark, sf_dir)
    return spark.sql(f"""
        with rev as (
            select l_suppkey as supplier_no, {_REV_S} as total_revenue
            from lineitem
            where l_shipdate >= timestamp '1996-01-01'
              and l_shipdate < timestamp '1996-04-01'
            group by l_suppkey
        )
        select s.s_suppkey, s.s_name, r.total_revenue
        from supplier s
        join rev r on s.s_suppkey = r.supplier_no
        where r.total_revenue = (select max(total_revenue) from rev)
        order by s.s_suppkey
    """)


@query(
    "tpch_q16_supplier_cnt",
    oracle="""
        select p.p_brand, p.p_type, p.p_size,
               count(distinct l.l_suppkey) as supplier_cnt
        from lineitem l
        join part p on p.p_partkey = l.l_partkey
        where p.p_brand <> 'Brand#13'
          and p.p_type <> 'PROMO'
          and p.p_size in (1, 9, 14, 19, 23, 36, 45, 49)
          and l.l_suppkey not in (
              select s_suppkey from supplier where s_acctbal < 0.0
          )
        group by p.p_brand, p.p_type, p.p_size
        order by supplier_cnt desc, p.p_brand, p.p_type, p.p_size
        limit 20
    """,
)
def tpch_q16_supplier_cnt(spark, sf_dir):
    """Q16 shape (parts/supplier relationship): distinct supplier
    count per part attribute bucket, excluding suppliers from a NOT IN
    subquery (negative account balance stands in for the complaints
    comment scan; lineitem stands in for partsupp).  s_suppkey is
    non-nullable so the null-aware NOT IN degenerates to a clean LEFT
    ANTI join — Catalyst's RewritePredicateSubquery does exactly that
    (plan-asserted).  Deterministic top-20: full key tiebreak."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        select p.p_brand, p.p_type, p.p_size,
               count(distinct l.l_suppkey) as supplier_cnt
        from lineitem l
        join part p on p.p_partkey = l.l_partkey
        where p.p_brand <> 'Brand#13'
          and p.p_type <> 'PROMO'
          and p.p_size in (1, 9, 14, 19, 23, 36, 45, 49)
          and l.l_suppkey not in (
              select s_suppkey from supplier where s_acctbal < 0.0
          )
        group by p.p_brand, p.p_type, p.p_size
        order by supplier_cnt desc, p.p_brand, p.p_type, p.p_size
        limit 20
    """)


@query(
    "tpch_q17_small_qty_order",
    oracle="""
        select round(
            sum(cast(round(l.l_extendedprice * 100) as bigint)) / 100.0 / 7.0,
            6) as avg_yearly
        from lineitem l
        join part p on p.p_partkey = l.l_partkey
        where p.p_brand = 'Brand#13'
          and l.l_quantity < (
              select 0.2 * avg(l2.l_quantity)
              from lineitem l2
              where l2.l_partkey = p.p_partkey
          )
    """,
)
def tpch_q17_small_qty_order(spark, sf_dir):
    """Q17 shape (small-quantity-order revenue): CORRELATED SCALAR
    subquery — each lineitem compares against 20% of the per-part
    average quantity.  Catalyst's RewriteCorrelatedScalarSubquery
    turns it into a per-partkey aggregate joined back on the
    correlation key: one extra map-side-combined agg over the fact,
    zero per-row subquery executions.  Determinism: l_quantity is
    integral doubles, so sum/avg are exact (no fp-order sensitivity);
    the revenue sum goes through exact cents.  Scale: the rewritten
    plan shuffles (partkey, sum, count) pairs — key-sized."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        select round(
            sum(cast(round(l.l_extendedprice * 100) as bigint))
              / cast(100 as double) / cast(7 as double),
            6) as avg_yearly
        from lineitem l
        join part p on p.p_partkey = l.l_partkey
        where p.p_brand = 'Brand#13'
          and l.l_quantity < (
              select 0.2 * avg(l2.l_quantity)
              from lineitem l2
              where l2.l_partkey = p.p_partkey
          )
    """)


@query(
    "tpch_q18_large_orders",
    oracle="""
        select c.c_name, c.c_custkey, o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') as order_date,
               o.o_totalprice, sum(l.l_quantity) as total_qty
        from customer c
        join orders o on c.c_custkey = o.o_custkey
        join lineitem l on o.o_orderkey = l.l_orderkey
        where o.o_orderkey in (
            select l_orderkey from lineitem
            group by l_orderkey having sum(l_quantity) > 300
        )
        group by c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        order by o.o_totalprice desc, o.o_orderkey asc
        limit 20
    """,
)
def tpch_q18_large_orders(spark, sf_dir):
    """Q18 shape (large-volume customers): IN over an aggregated-
    HAVING subquery on the same fact.  Catalyst rewrites the IN to a
    LEFT SEMI join against the grouped subquery — the fact aggregates
    once into key-sized (orderkey, sum) pairs, the semi join prunes,
    then the surviving orders re-aggregate with their customer.
    Deterministic top-20: totalprice is a raw column (no float
    arithmetic) with orderkey tiebreak; qty sums are integral."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        select c.c_name, c.c_custkey, o.o_orderkey,
               date_format(o.o_orderdate, 'yyyy-MM-dd') as order_date,
               o.o_totalprice, sum(l.l_quantity) as total_qty
        from customer c
        join orders o on c.c_custkey = o.o_custkey
        join lineitem l on o.o_orderkey = l.l_orderkey
        where o.o_orderkey in (
            select l_orderkey from lineitem
            group by l_orderkey having sum(l_quantity) > 300
        )
        group by c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        order by o.o_totalprice desc, o.o_orderkey asc
        limit 20
    """)


@query(
    "tpch_q19_disjunctive_join",
    oracle=f"""
        select {_REV_D} as revenue, count(*) as n_lines
        from lineitem l
        join part p on p.p_partkey = l.l_partkey
        where (p.p_brand = 'Brand#12' and p.p_size between 1 and 5
               and l.l_quantity between 1 and 11)
           or (p.p_brand = 'Brand#23' and p.p_size between 1 and 10
               and l.l_quantity between 10 and 20)
           or (p.p_brand = 'Brand#34' and p.p_size between 1 and 15
               and l.l_quantity between 20 and 30)
    """,
)
def tpch_q19_disjunctive_join(spark, sf_dir):
    """Q19 shape (discounted revenue, disjunctive predicates): an
    equi-join whose residual condition is an OR of three brand/size/
    quantity conjunctions referencing BOTH sides.  The optimizer must
    (a) keep the p_partkey equi-join hashable, (b) evaluate the
    disjunction as a post-join filter, and (c) infer the pushable
    single-side envelopes (CNF conversion gives part: size 1-15 and
    brand IN the three; lineitem: quantity 1-30).  Plan: part
    broadcasts, lineitem scans once."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey")).where(
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.agg(
        F.expr(_REV_S).alias("revenue"), F.count("*").alias("n_lines")
    )


@query(
    "tpch_q20_nested_in",
    oracle="""
        select s.s_name, s.s_acctbal
        from supplier s
        where s.s_suppkey in (
            select l.l_suppkey from lineitem l
            where l.l_partkey in (
                select p_partkey from part where p_name like 'red%'
            )
              and l.l_shipdate >= timestamp '1996-01-01'
              and l.l_shipdate < timestamp '1997-01-01'
            group by l.l_suppkey
            having sum(l.l_quantity) > 100
        )
        order by s.s_name
    """,
)
def tpch_q20_nested_in(spark, sf_dir):
    """Q20 shape (potential part promotion): NESTED IN subqueries —
    suppliers who moved >100 units of red parts in 1996 (lineitem
    stands in for partsupp; p_name LIKE keeps the pattern-scan inner
    query).  Catalyst rewrites both IN levels to LEFT SEMI joins: part
    filters by the LIKE, semi-joins lineitem on partkey, aggregates to
    (suppkey, qty), semi-joins supplier.  Every intermediate is
    key-sized; the LIKE is a pushed parquet filter."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        select s.s_name, s.s_acctbal
        from supplier s
        where s.s_suppkey in (
            select l.l_suppkey from lineitem l
            where l.l_partkey in (
                select p_partkey from part where p_name like 'red%'
            )
              and l.l_shipdate >= timestamp '1996-01-01'
              and l.l_shipdate < timestamp '1997-01-01'
            group by l.l_suppkey
            having sum(l.l_quantity) > 100
        )
        order by s.s_name
    """)


@query(
    "tpch_q21_waiting_supplier",
    oracle="""
        with fl as (
            select l.l_orderkey, l.l_suppkey
            from lineitem l
            join orders o on o.o_orderkey = l.l_orderkey
            where o.o_orderstatus = 'F'
              and l.l_shipdate > o.o_orderdate + interval 90 day
        )
        select s.s_name, count(*) as numwait
        from supplier s
        join fl l1 on s.s_suppkey = l1.l_suppkey
        where exists (
            select 1 from lineitem l2
            where l2.l_orderkey = l1.l_orderkey
              and l2.l_suppkey <> l1.l_suppkey
        )
        and not exists (
            select 1 from fl l3
            where l3.l_orderkey = l1.l_orderkey
              and l3.l_suppkey <> l1.l_suppkey
        )
        group by s.s_name
        order by numwait desc, s.s_name asc
        limit 10
    """,
)
def tpch_q21_waiting_supplier(spark, sf_dir):
    """Q21 shape (suppliers who kept orders waiting): EXISTS and NOT
    EXISTS against the same derived table — the supplier was LATE
    (shipped >90 days after order date, standing in for receipt>
    commit) on a multi-supplier finished order where NO OTHER supplier
    was late.  The late-lines set is a CTE so both correlated
    predicates decorrelate to semi/anti joins on l_orderkey against
    key-sized inputs.  Scale: worst shape in the suite by design —
    two extra joins over the fact — but every join is equi on
    orderkey and the CTE rows are 16 bytes."""
    load_tables(spark, sf_dir)
    # Aggregate decorrelation (the classic optimized Q21 plan), fused
    # to ONE pass: per F-status order, the EXISTS ("some OTHER supplier
    # on the order") is min(suppkey) <> max(suppkey) over ALL its
    # lines, and the NOT EXISTS ("no OTHER late supplier") is min =
    # max over its LATE lines — so one lineitem⋈orders join + one
    # per-orderkey aggregation with conditional min/max/count replaces
    # three fact-table consumptions (the fl CTE inlined per correlated
    # predicate) and never pays a count-distinct expansion.  Restricting
    # the "other supplier" test to F orders is sound: the final join
    # keeps F orders only.  Row multiplicity is preserved exactly: the
    # original counts one row per late LINE of the lone late supplier
    # => sum(n_late).
    return spark.sql("""
        with agg as (
            select l.l_orderkey,
                   min(l.l_suppkey) as smin,
                   max(l.l_suppkey) as smax,
                   min(case when l.l_shipdate > o.o_orderdate + interval 90 day
                            then l.l_suppkey end) as lmin,
                   max(case when l.l_shipdate > o.o_orderdate + interval 90 day
                            then l.l_suppkey end) as lmax,
                   sum(case when l.l_shipdate > o.o_orderdate + interval 90 day
                            then 1 else 0 end) as n_late
            from lineitem l
            join orders o on o.o_orderkey = l.l_orderkey
            where o.o_orderstatus = 'F'
            group by l.l_orderkey
        )
        select s.s_name, cast(sum(a.n_late) as bigint) as numwait
        from agg a
        join supplier s on s.s_suppkey = a.lmin
        where a.n_late > 0
          and a.lmin = a.lmax
          and a.smin <> a.smax
        group by s.s_name
        order by numwait desc, s.s_name asc
        limit 10
    """)


@query(
    "tpch_q22_dormant_customers",
    oracle="""
        select cast(c.c_nationkey % 10 as integer) as cntrycode,
               count(*) as numcust,
               round(sum(cast(round(c.c_acctbal * 100) as bigint)) / 100.0,
                     6) as totacctbal
        from customer c
        where c.c_acctbal > (
            select sum(cast(round(c2.c_acctbal * 100) as bigint))
                   / (100.0 * count(*))
            from customer c2 where c2.c_acctbal > 0.0
        )
        and not exists (
            select 1 from orders o
            where o.o_custkey = c.c_custkey
              and o.o_orderdate >= timestamp '1999-01-01'
        )
        group by cntrycode
        order by cntrycode
    """,
)
def tpch_q22_dormant_customers(spark, sf_dir):
    """Q22 shape (global sales opportunity): rich customers with no
    RECENT orders (the fixture's order coverage is dense, so "never
    ordered" would be empty at every SF; the dormancy cutoff keeps the
    anti join non-trivial) — an uncorrelated scalar subquery (mean positive balance)
    feeding a filter, plus NOT EXISTS -> LEFT ANTI join on custkey
    (nationkey%10 stands in for the phone country code).  The mean is
    computed as exact integer cents / (100*count) so the threshold
    double is bit-identical across engines and partitionings —
    avg(double) would be fp-order-sensitive and could flip boundary
    rows.  Plan: scalar broadcasts; anti join shuffles custkeys only."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        select cast(c.c_nationkey % 10 as int) as cntrycode,
               count(*) as numcust,
               round(sum(cast(round(c.c_acctbal * 100) as bigint))
                     / cast(100 as double),
                     6) as totacctbal
        from customer c
        where c.c_acctbal > (
            select sum(cast(round(c2.c_acctbal * 100) as bigint))
                   / (cast(100 as double) * count(*))
            from customer c2 where c2.c_acctbal > 0.0
        )
        and not exists (
            select 1 from orders o
            where o.o_custkey = c.c_custkey
              and o.o_orderdate >= timestamp '1999-01-01'
        )
        group by cntrycode
        order by cntrycode
    """)


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
        select distinct
               s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
               cast(round(l.l_extendedprice / l.l_quantity * 100) as bigint)
                   as supply_cost_cents
        from part p
        join lineitem l on p.p_partkey = l.l_partkey
        join supplier s on s.s_suppkey = l.l_suppkey
        join nation n on s.s_nationkey = n.n_nationkey
        join region r on n.n_regionkey = r.r_regionkey
        where r.r_name = 'EUROPE'
          and p.p_type = 'STANDARD'
          and cast(round(l.l_extendedprice / l.l_quantity * 100) as bigint) = (
              select min(cast(round(l2.l_extendedprice / l2.l_quantity * 100)
                              as bigint))
              from lineitem l2
              join supplier s2 on s2.s_suppkey = l2.l_suppkey
              join nation n2 on s2.s_nationkey = n2.n_nationkey
              join region r2 on n2.n_regionkey = r2.r_regionkey
              where l2.l_partkey = p.p_partkey and r2.r_name = 'EUROPE'
          )
        order by s.s_acctbal desc, n.n_name, s.s_name, p.p_partkey
        limit 100
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """Q2 shape (minimum-cost supplier): for each STANDARD-type part,
    the EUROPE supplier(s) offering the minimum unit cost — a
    CORRELATED scalar subquery whose body is itself a 4-table join
    (lineitem stands in for partsupp, unit cost = extendedprice /
    quantity in exact cents, as q16 stands lineitem in for partsupp).
    Catalyst's RewriteCorrelatedScalarSubquery turns the per-part min
    into one region-filtered aggregate joined back on partkey: the
    fact is scanned twice but shuffles only (partkey, min_cents) pairs
    for the subquery side.  DISTINCT collapses repeat lineitems of the
    same (part, supplier) at the same unit cost, so the result is
    supplier-relationship-shaped exactly like partsupp.  Deterministic
    top-100: every output column is functionally determined by the
    (s_acctbal, n_name, s_name, p_partkey) full-tiebreak sort key.
    Scale: dims broadcast; both fact passes prune to 4 columns."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        select distinct
               s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
               cast(round(l.l_extendedprice / l.l_quantity * 100) as bigint)
                   as supply_cost_cents
        from part p
        join lineitem l on p.p_partkey = l.l_partkey
        join supplier s on s.s_suppkey = l.l_suppkey
        join nation n on s.s_nationkey = n.n_nationkey
        join region r on n.n_regionkey = r.r_regionkey
        where r.r_name = 'EUROPE'
          and p.p_type = 'STANDARD'
          and cast(round(l.l_extendedprice / l.l_quantity * 100) as bigint) = (
              select min(cast(round(l2.l_extendedprice / l2.l_quantity * 100)
                              as bigint))
              from lineitem l2
              join supplier s2 on s2.s_suppkey = l2.l_suppkey
              join nation n2 on s2.s_nationkey = n2.n_nationkey
              join region r2 on n2.n_regionkey = r2.r_regionkey
              where l2.l_partkey = p.p_partkey and r2.r_name = 'EUROPE'
          )
        order by s.s_acctbal desc, n.n_name, s.s_name, p.p_partkey
        limit 100
    """)


@query(
    "tpch_q8_market_share",
    oracle="""
        select o_year,
               round(sum(case when nation = 'NATION_18' then vol else 0 end)
                     / cast(sum(vol) as double), 6) as mkt_share
        from (
            select year(o.o_orderdate) as o_year,
                   cast(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                        as bigint) as vol,
                   n2.n_name as nation
            from part p
            join lineitem l on p.p_partkey = l.l_partkey
            join supplier s on s.s_suppkey = l.l_suppkey
            join orders o on o.o_orderkey = l.l_orderkey
            join customer c on c.c_custkey = o.o_custkey
            join nation n1 on c.c_nationkey = n1.n_nationkey
            join region r on n1.n_regionkey = r.r_regionkey
            join nation n2 on s.s_nationkey = n2.n_nationkey
            where r.r_name = 'EUROPE'
              and p.p_type = 'ECONOMY'
              and o.o_orderdate between timestamp '1996-01-01'
                                    and timestamp '1997-12-31'
        ) all_nations
        group by o_year
        order by o_year
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    """Q8 shape (national market share): NATION_18's share of EUROPE
    ECONOMY-part order volume per year — an 8-table star join (nation
    joined TWICE: customer side restricts the market, supplier side
    tags the competitor) feeding a conditional-share aggregate.

    Determinism: volumes are summed as exact integer 10^-4 units, so
    both engines divide the IDENTICAL pair of bigints — the only
    double op is that final division (bit-deterministic), never an
    fp-order-sensitive running sum.  Plan: all five dims broadcast;
    the lineitem-orders join is the one real shuffle; the share
    aggregate carries (year, nation, partial sums) — map-side
    combinable at any scale."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        select o_year,
               round(sum(case when nation = 'NATION_18' then vol else 0 end)
                     / cast(sum(vol) as double), 6) as mkt_share
        from (
            select year(o.o_orderdate) as o_year,
                   cast(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                        as bigint) as vol,
                   n2.n_name as nation
            from part p
            join lineitem l on p.p_partkey = l.l_partkey
            join supplier s on s.s_suppkey = l.l_suppkey
            join orders o on o.o_orderkey = l.l_orderkey
            join customer c on c.c_custkey = o.o_custkey
            join nation n1 on c.c_nationkey = n1.n_nationkey
            join region r on n1.n_regionkey = r.r_regionkey
            join nation n2 on s.s_nationkey = n2.n_nationkey
            where r.r_name = 'EUROPE'
              and p.p_type = 'ECONOMY'
              and o.o_orderdate between timestamp '1996-01-01'
                                    and timestamp '1997-12-31'
        ) all_nations
        group by o_year
        order by o_year
    """)


@query(
    "tpch_q9_product_profit",
    oracle="""
        select nation, o_year,
               round(sum(amount) / cast(10000 as double), 6) as sum_profit
        from (
            select n.n_name as nation,
                   year(o.o_orderdate) as o_year,
                   cast(round((l.l_extendedprice * (1 - l.l_discount)
                               - p.p_retailprice * l.l_quantity * 0.1)
                              * 10000) as bigint) as amount
            from part p
            join lineitem l on p.p_partkey = l.l_partkey
            join supplier s on s.s_suppkey = l.l_suppkey
            join orders o on o.o_orderkey = l.l_orderkey
            join nation n on s.s_nationkey = n.n_nationkey
            where p.p_name like '%red%'
        ) profit
        group by nation, o_year
        order by nation, o_year desc
    """,
)
def tpch_q9_product_profit(spark, sf_dir):
    """Q9 shape (product-type profit): per supplier-nation, per year,
    profit on 'red' parts = revenue minus a 10%-of-retail unit cost
    (p_retailprice stands in for the missing ps_supplycost, scaled so
    profit is usually positive).  Every profit term has <= 4 decimal
    digits (price 2dp x discount 2dp; retail 2dp x integral qty x one
    0.1 factor), so amounts are exact integer 10^-4 units and the
    grouped sum is order-independent — AQE cannot flip the hash.
    Plan: part/supplier/nation broadcast, lineitem-orders is the only
    fact-fact shuffle, no order-side filter (full-history scan like
    the real Q9)."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        select nation, o_year,
               round(sum(amount) / cast(10000 as double), 6) as sum_profit
        from (
            select n.n_name as nation,
                   year(o.o_orderdate) as o_year,
                   cast(round((l.l_extendedprice * (1 - l.l_discount)
                               - p.p_retailprice * l.l_quantity * 0.1)
                              * 10000) as bigint) as amount
            from part p
            join lineitem l on p.p_partkey = l.l_partkey
            join supplier s on s.s_suppkey = l.l_suppkey
            join orders o on o.o_orderkey = l.l_orderkey
            join nation n on s.s_nationkey = n.n_nationkey
            where p.p_name like '%red%'
        ) profit
        group by nation, o_year
        order by nation, o_year desc
    """)


@query(
    "tpch_q11_important_stock",
    oracle="""
        with val as (
            select l.l_partkey,
                   sum(cast(round(l.l_extendedprice * (1 - l.l_discount)
                                  * 10000) as bigint)) as value_u
            from lineitem l
            join supplier s on l.l_suppkey = s.s_suppkey
            join nation n on s.s_nationkey = n.n_nationkey
            join region r on n.n_regionkey = r.r_regionkey
            where r.r_name = 'MIDDLE EAST'
            group by l.l_partkey
        )
        select l_partkey,
               round(value_u / cast(10000 as double), 6) as part_value
        from val
        where value_u > (select sum(value_u) * 2.0 / count(*) from val)
        order by value_u desc, l_partkey
    """,
)
def tpch_q11_important_stock(spark, sf_dir):
    """Q11 shape (important stock identification): parts whose
    MIDDLE-EAST-supplied value exceeds 2x the mean per-part value —
    the HAVING-against-uncorrelated-scalar-subquery pattern (lineitem
    value stands in for partsupp cost x availqty).  The real Q11
    scales its fraction by 1/SF; a fixed fraction here would be empty
    at sf0.001 and sf0.1, so the threshold is mean-relative (2x mean
    share), which is provably scale-free — measured non-empty at
    every fixture SF (2 / 21 / 497 rows).  The region (not a single
    nation) keeps the supplier side populated at sf0.001's 10
    suppliers.  The same grouped CTE feeds both the per-part rows and
    the global threshold; Catalyst plans the scalar as a one-row
    broadcast subquery result.  Determinism: per-part values are
    exact bigint 10^-4 sums; the threshold multiply/divide is the
    only double op and both engines derive it from the identical
    bigint pair.  Scale: the heavy groupBy shuffles (partkey,
    partial-sum) pairs, map-side combinable; the region filter
    reaches the supplier scan via the broadcast dim join."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        with val as (
            select l.l_partkey,
                   sum(cast(round(l.l_extendedprice * (1 - l.l_discount)
                                  * 10000) as bigint)) as value_u
            from lineitem l
            join supplier s on l.l_suppkey = s.s_suppkey
            join nation n on s.s_nationkey = n.n_nationkey
            join region r on n.n_regionkey = r.r_regionkey
            where r.r_name = 'MIDDLE EAST'
            group by l.l_partkey
        )
        select l_partkey,
               round(value_u / cast(10000 as double), 6) as part_value
        from val
        where value_u > (select sum(value_u) * 2.0 / count(*) from val)
        order by value_u desc, l_partkey
    """)


@query(
    "tpch_q12_shipmode_priority",
    oracle="""
        select l.l_returnflag as ship_group,
               cast(sum(case when o.o_orderpriority in ('1-URGENT', '2-HIGH')
                             then 1 else 0 end) as bigint) as high_line_count,
               cast(sum(case when o.o_orderpriority not in ('1-URGENT', '2-HIGH')
                             then 1 else 0 end) as bigint) as low_line_count
        from orders o
        join lineitem l on o.o_orderkey = l.l_orderkey
        where l.l_returnflag in ('A', 'R')
          and l.l_shipdate >= timestamp '1996-01-01'
          and l.l_shipdate < timestamp '1997-01-01'
        group by l.l_returnflag
        order by l.l_returnflag
    """,
)
def tpch_q12_shipmode_priority(spark, sf_dir):
    """Q12 shape (shipping modes vs priority): count urgent-priority
    vs other orders per shipping bucket within a one-year ship window
    (l_returnflag in ('A','R') stands in for l_shipmode in
    ('MAIL','SHIP') — the fixtures carry no shipmode/commitdate/
    receiptdate, FIXTURES.md).  The classic orders-lineitem join with
    conditional counts: integer CASE sums, so nothing is
    fp-sensitive.  Plan: the shipdate+flag filter pushes to the
    lineitem parquet scan; one equi-join shuffle on orderkey (or a
    broadcast of the date-filtered side under AQE at small SF);
    2-group aggregate is trivially map-side combined."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        select l.l_returnflag as ship_group,
               cast(sum(case when o.o_orderpriority in ('1-URGENT', '2-HIGH')
                             then 1 else 0 end) as bigint) as high_line_count,
               cast(sum(case when o.o_orderpriority not in ('1-URGENT', '2-HIGH')
                             then 1 else 0 end) as bigint) as low_line_count
        from orders o
        join lineitem l on o.o_orderkey = l.l_orderkey
        where l.l_returnflag in ('A', 'R')
          and l.l_shipdate >= timestamp '1996-01-01'
          and l.l_shipdate < timestamp '1997-01-01'
        group by l.l_returnflag
        order by l.l_returnflag
    """)
