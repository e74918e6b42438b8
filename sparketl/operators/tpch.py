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
from sparketl.tables import table

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
