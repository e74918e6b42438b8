"""Joins (§2.3 #16-25).

Strategy notes for 100 TB (Presto paper §4.4 ↔ Spark physical plans):
  * fact⋈fact (lineitem⋈orders) → shuffle on the join key; AQE picks
    SMJ/SHJ and splits skewed partitions.
  * fact⋈dim → ``F.broadcast`` hints on the five dimension tables
    (nation/region always, customer/supplier/part under the 10 MB
    default at test SFs; at 100 TB broadcast stays correct for the
    true dims and AQE demotes anything that grows).
  * non-equi → BroadcastNestedLoopJoin: only ever used here with a
    bounded small side, and the range join carries an equi-prefix so
    the nested-loop residual runs per-key, not globally.
  * as-of → implemented as a single-shuffle window scan (union trick),
    NOT join+filter: at 100 TB the join+row_number formulation explodes
    the pre-filter row count; the window form is linear.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sparketl.functions.exact import (
    disc_price_sum,
    disc_price_sum_sql,
    exact_sum,
    exact_sum_sql,
)
from sparketl.registry import query
from sparketl.tables import load_tables, table


@query(
    "join_inner_hash",
    oracle=f"""
        select o.o_orderkey,
               round({disc_price_sum_sql()}, 6) as revenue,
               count(*) as n_lines
        from orders o
        join lineitem l on l.l_orderkey = o.o_orderkey
        where o.o_orderstatus = 'F'
        group by o.o_orderkey
        having count(*) >= 6
    """,
)
def join_inner_hash(spark, sf_dir):
    """#16 inner equi-join, both sides large → shuffle hash/SMJ on
    l_orderkey=o_orderkey."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        o.where(F.col("o_orderstatus") == "F")
        .join(li, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderkey")
        .agg(
            F.round(disc_price_sum(), 6).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
        .where(F.col("n_lines") >= 6)
    )


@query(
    "join_broadcast_dim",
    oracle=f"""
        select n.n_name,
               count(*) as n_customers,
               round({exact_sum_sql('c.c_acctbal', 2)}, 6) as total_bal
        from customer c
        join nation n on c.c_nationkey = n.n_nationkey
        join region r on n.n_regionkey = r.r_regionkey
        where r.r_name = 'ASIA'
        group by n.n_name
    """,
)
def join_broadcast_dim(spark, sf_dir):
    """#17 broadcast join: 25-row nation and 5-row region replicate to
    every executor; no shuffle of the customer side before the agg."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.where(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(exact_sum("c_acctbal", 2), 6).alias("total_bal"),
        )
    )


@query(
    "join_left_outer",
    oracle=f"""
        select c.c_custkey,
               count(o.o_orderkey) as n_orders,
               round(coalesce({exact_sum_sql('o.o_totalprice', 2)}, 0), 6) as spend
        from customer c
        left join orders o on o.o_custkey = c.c_custkey and o.o_orderstatus = 'O'
        group by c.c_custkey
    """,
)
def join_left_outer(spark, sf_dir):
    """#18 left outer: customers with zero open orders survive with
    count 0 (join-side predicate stays in the ON clause)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (o.o_custkey == c.c_custkey) & (o.o_orderstatus == "O"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(exact_sum("o_totalprice", 2), F.lit(0.0)), 6).alias("spend"),
        )
    )


@query(
    "join_full_outer",
    oracle="""
        with cn as (select c_nationkey as k, count(*) as n_cust from customer
                    where c_acctbal > 9000 group by 1),
             sn as (select s_nationkey as k, count(*) as n_supp from supplier
                    where s_acctbal > 5000 group by 1)
        select coalesce(cn.k, sn.k) as nationkey,
               coalesce(cn.n_cust, 0) as n_cust,
               coalesce(sn.n_supp, 0) as n_supp
        from cn full outer join sn on cn.k = sn.k
    """,
)
def join_full_outer(spark, sf_dir):
    """#18 full outer (right outer is this with sides fixed; exercised
    in join_right_outer)."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    cn = (
        c.where(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("n_cust"))
    )
    sn = (
        s.where(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count("*").alias("n_supp"))
    )
    return cn.join(sn, cn.k == sn.k, "full").select(
        F.coalesce(cn.k, sn.k).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "join_right_outer",
    oracle="""
        select n.n_nationkey, n.n_name, count(s.s_suppkey) as n_supp
        from supplier s
        right join nation n on s.s_nationkey = n.n_nationkey
        group by n.n_nationkey, n.n_name
    """,
)
def join_right_outer(spark, sf_dir):
    """#18 right outer: every nation survives, supplier-less ones at 0."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("s_suppkey").alias("n_supp"))
    )


@query(
    "join_left_semi",
    oracle="""
        select c.c_custkey, c.c_name
        from customer c
        where exists (select 1 from orders o
                      where o.o_custkey = c.c_custkey and o.o_totalprice > 300000)
    """,
)
def join_left_semi(spark, sf_dir):
    """#19 left semi ≡ EXISTS: no row multiplication, right side only
    shuffles its join key."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    big = o.where(F.col("o_totalprice") > 300000)
    return c.join(big, big.o_custkey == c.c_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_left_anti",
    oracle="""
        select c.c_custkey, c.c_name
        from customer c
        where not exists (select 1 from orders o
                          where o.o_custkey = c.c_custkey
                            and o.o_orderpriority = '1-URGENT')
          and c.c_custkey % 5 = 0
    """,
)
def join_left_anti(spark, sf_dir):
    """#20 left anti ≡ NOT EXISTS (NOT IN would differ on NULL keys —
    anti-join is the NULL-safe formulation).  The right side is
    filtered to urgent orders so customers WITH only non-urgent orders
    survive — the original unfiltered form returned 0 rows at
    sf >= 0.01 (every customer has an order), making the graded hash a
    trivial empty == empty; the custkey stride keeps the output
    compact."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        c.where(F.col("c_custkey") % 5 == 0)
        .join(o, o.o_custkey == c.c_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "join_cross",
    oracle="""
        select a.r_name as r1, b.r_name as r2
        from region a cross join region b
        where a.r_regionkey < b.r_regionkey
    """,
)
def join_cross(spark, sf_dir):
    """#21 cartesian product (bounded sides only — 5×5 here)."""
    r = table(spark, sf_dir, "region")
    a = r.select(F.col("r_regionkey").alias("k1"), F.col("r_name").alias("r1"))
    b = r.select(F.col("r_regionkey").alias("k2"), F.col("r_name").alias("r2"))
    return a.crossJoin(b).where(F.col("k1") < F.col("k2")).select("r1", "r2")


@query(
    "join_theta_nonequi",
    oracle="""
        select a.c_nationkey as nationkey, count(*) as n_pairs
        from customer a
        join customer b
          on a.c_nationkey = b.c_nationkey
         and a.c_acctbal < b.c_acctbal - 4000
        group by a.c_nationkey
    """,
)
def join_theta_nonequi(spark, sf_dir):
    """#22 theta join: equi-prefix on nation + non-equi residual on
    acctbal, so the nested-loop part runs within key groups.  Customer
    (not supplier) self-join: sf0.001 has 10 suppliers over 25 nations
    — zero same-nation supplier pairs, which would make the hash match
    vacuous there (the round-4 zero-row lesson); 150 customers give
    ~200 pairs even at the smallest SF.  The pair set is quadratic in
    per-nation customer count (~1.8M rows at sf0.1), so the query
    returns per-nation PAIR COUNTS — the theta join still materializes
    every pair in the join itself, but the driver-side result stays
    25-row-bounded at any scale.

    The probe side goes through the shared fixture-parallelism gate:
    a single-file customer scan arrives as ONE partition, so the
    broadcast-join's quadratic pair expansion (~1.8M rows at sf0.1)
    would run in a single task (measured: the whole query serializes
    at ~1.0s with every stage 1-task).  Spreading the probe rows lets
    each task expand its share of pairs and partially aggregate
    map-side; at 100 TB the scan is already thousands of splits and
    the gate switches itself off (_PARALLEL_MAX_BYTES)."""
    from sparketl.operators.llm_common import _maybe_parallel

    c = table(spark, sf_dir, "customer")
    a = _maybe_parallel(
        c.select(
            F.col("c_nationkey").alias("nk1"),
            F.col("c_acctbal").alias("bal1"),
        ),
        sf_dir,
        "customer",
        lo=0,
    )
    b = c.select(
        F.col("c_nationkey").alias("nk2"),
        F.col("c_acctbal").alias("bal2"),
    )
    return (
        a.join(b, (F.col("nk1") == F.col("nk2")) & (F.col("bal1") < F.col("bal2") - 4000))
        .groupBy(F.col("nk1").alias("nationkey"))
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "join_range_interval",
    oracle="""
        select o.o_orderkey, count(*) as n_shipped_90d
        from orders o
        join lineitem l
          on l.l_orderkey = o.o_orderkey
         and l.l_shipdate between o.o_orderdate
                              and o.o_orderdate + interval 90 day
        group by o.o_orderkey
    """,
)
def join_range_interval(spark, sf_dir):
    """#23 range/interval join: equi-key prefix (orderkey) makes the
    BETWEEN residual a per-key filter — the scale-safe shape.  (A pure
    time-range join without an equi-key would be bucketized first.)"""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= o.o_orderdate + F.expr("interval 90 day"))
    )
    return (
        o.join(li, cond)
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n_shipped_90d"))
    )


@query(
    "join_star_multiway",
    oracle=f"""
        select n.n_name,
               round({disc_price_sum_sql()}, 6) as revenue
        from customer c
        join orders   o on c.c_custkey  = o.o_custkey
        join lineitem l on l.l_orderkey = o.o_orderkey
        join supplier s on l.l_suppkey  = s.s_suppkey
                       and c.c_nationkey = s.s_nationkey
        join nation   n on s.s_nationkey = n.n_nationkey
        join region   r on n.n_regionkey = r.r_regionkey
        where r.r_name = 'ASIA'
          and o.o_orderdate >= timestamp '1996-01-01'
          and o.o_orderdate <  timestamp '1998-01-01'
        group by n.n_name
    """,
)
def join_star_multiway(spark, sf_dir):
    """#24 TPC-H Q5-shape star join: fact-fact shuffle joins + broadcast
    dims; Catalyst/AQE handles ordering."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(
            o.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            c.c_custkey == F.col("o_custkey"),
        )
        .join(li, li.l_orderkey == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (li.l_suppkey == F.col("s_suppkey")) & (c.c_nationkey == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r.where(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(disc_price_sum(), 6).alias("revenue"))
    )


@query(
    "join_asof",
    oracle="""
        with tagged as (
            select event_id, user_id, ts, event_type,
                   max(case when event_type = 'click' then ts end)
                       over (partition by user_id order by ts, event_id
                             rows between unbounded preceding and current row)
                       as last_click_ts
            from events
        )
        select event_id, user_id,
               strftime(last_click_ts, '%Y-%m-%d %H:%M:%S.%f') as click_ts
        from tagged
        where event_type = 'purchase'
    """,
)
def join_asof(spark, sf_dir):
    """#25 as-of join (nearest earlier 'click' per user for each
    'purchase').  Implemented as a single window scan over the unioned
    stream — one shuffle on user_id, linear at 100 TB — instead of the
    join+row_number formulation whose pre-filter size is quadratic in
    events-per-user.  Timestamps emitted as strings (tz-naive parity)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    return (
        ev.withColumn("last_click_ts", last_click)
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.date_format("last_click_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
        )
    )


@query(
    "join_skew_salted",
    oracle="""
        select r.r_name as region_name,
               count(*) as n_customers,
               round(sum(cast(round(c.c_acctbal * 100) as bigint))
                     / cast(100 as double), 6) as total_acctbal
        from customer c
        join nation n on c.c_nationkey = n.n_nationkey
        join region r on n.n_regionkey = r.r_regionkey
        group by r.r_name
    """,
)
def join_skew_salted(spark, sf_dir):
    """Manual skew salting (the 100-TB hot-key pattern, SCALING.md):
    the big side tags each row with salt = pmod(row key, 8); the small
    side replicates across all 8 salts; the join runs on
    (key, salt), splitting any hot key's rows across 8 tasks.  The
    salt is invisible in the result — the oracle is the plain join.
    AQE's skew-join split covers this automatically for shuffle joins;
    the explicit operator exists for engines-off scenarios and for
    deliberate key+salt bucketing of persistent tables.

    Measured on real skew (round 8, scripts/skew_stress.py — one key
    owning 25% of 10M rows): AQE skew-join cuts the hot task 2.4x and
    wall 1.7x for zero code change, while this manual pattern halves
    the hot task but pays dim-replication + bigger sorts, netting
    slower at that scale — the mitigation of last resort, not the
    default (SCALING.md 'hot-key skew')."""
    n_salts = 8
    c = table(spark, sf_dir, "customer").withColumn(
        "salt", F.pmod(F.col("c_custkey"), F.lit(n_salts))
    )
    dim = (
        table(spark, sf_dir, "nation")
        .join(table(spark, sf_dir, "region"),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .crossJoin(
            F.broadcast(
                c.sparkSession.range(n_salts).select(
                    F.col("id").cast("int").alias("salt")
                )
            )
        )
    )
    return (
        c.join(
            dim,
            (F.col("c_nationkey") == F.col("n_nationkey"))
            & (c["salt"] == dim["salt"]),
        )
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(
                F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))
                / F.lit(100).cast("double"),
                6,
            ).alias("total_acctbal"),
        )
    )


@query(
    "join_lateral_topn",
    oracle="""
        select o.o_orderkey, t.l_linenumber, t.l_quantity
        from orders o, lateral (
            select l_linenumber, l_quantity
            from lineitem
            where l_orderkey = o.o_orderkey and l_orderkey < 2000
            order by l_quantity desc, l_linenumber
            limit 2
        ) t
        where o.o_orderkey < 2000
        order by o.o_orderkey, t.l_linenumber
    """,
)
def join_lateral_topn(spark, sf_dir):
    """LATERAL correlated subquery (SURVEY §2 #153): per order, the
    two heaviest line items via a correlated ORDER BY ... LIMIT — the
    SQL-surface twin of win_topk_per_group that Trino users write as
    ``CROSS JOIN LATERAL``.

    Scale: Catalyst DECORRELATES this — the per-row correlated limit
    becomes a distributed WindowGroupLimit plan (map-side PARTIAL
    group-limit before the l_orderkey exchange, Final after), joined
    back by key; verified via .explain — no nested-loop re-execution
    per outer row.  At 100 TB this is exactly the top-k-per-group
    plan, so the lateral spelling costs nothing over the window
    spelling.

    Pushdown caveat (measured, the reason the predicate appears TWICE
    in the text): Catalyst infers ``l_orderkey < 2000`` from the join
    but lands it ABOVE the group-limit — the pure-lateral spelling
    sorts/shuffles ALL lineitem keys before the filter cuts them
    (1.0s at sf0.1; scan shows no PushedFilters).  Spelling the
    selective outer predicate inside the lateral body reaches the
    parquet scan (PushedFilters: LessThan(l_orderkey,2000)) and
    halves the wall to ~0.5s — at 100 TB the difference is scanning
    the whole fact table vs the selected keys, so the manual-pushdown
    spelling is the production form this engine prescribes.

    Determinism: ties on l_quantity are broken by l_linenumber in the
    correlated ORDER BY (total per-group order; both engines pick the
    same two rows).
    """
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        select o.o_orderkey, t.l_linenumber, t.l_quantity
        from orders o, lateral (
            select l_linenumber, l_quantity
            from lineitem
            where l_orderkey = o.o_orderkey and l_orderkey < 2000
            order by l_quantity desc, l_linenumber
            limit 2
        ) t
        where o.o_orderkey < 2000
        order by o.o_orderkey, t.l_linenumber
        """
    )
