"""Window functions (§2.6 #44-52).

Presto default null ordering is NULLS LAST (ASC); Spark's is NULLS
FIRST — every ordered window here spells ordering + frame explicitly so
Spark ≡ oracle (SURVEY.md §2.6).  Ties: any ordering that feeds
row_number/ntile/limit carries a unique-key tiebreak.

Scale: a window over partitionBy(k) is one shuffle on k — same cost
class as a groupBy.  Nothing here materializes per-partition state
beyond the frame, so skew handling is AQE's problem, same as joins.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sparketl.registry import query
from sparketl.tables import table


@query(
    "win_row_number",
    oracle="""
        select o_custkey, o_orderkey,
               row_number() over (partition by o_custkey
                                  order by o_orderdate asc nulls last, o_orderkey asc) as rn
        from orders
        where o_custkey < 200
    """,
)
def win_row_number(spark, sf_dir):
    """#44 row_number with unique tiebreak (o_orderkey)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc_nulls_last(), F.col("o_orderkey").asc()
    )
    return (
        o.where(F.col("o_custkey") < 200)
        .select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rn"))
    )


@query(
    "win_rank_dense_rank",
    oracle="""
        select o_custkey, o_orderkey,
               rank()       over (partition by o_custkey order by o_orderpriority asc nulls last) as rnk,
               dense_rank() over (partition by o_custkey order by o_orderpriority asc nulls last) as drnk
        from orders
        where o_custkey < 100
    """,
)
def win_rank_dense_rank(spark, sf_dir):
    """#45 rank/dense_rank — tie-stable values (equal keys get equal
    ranks), so priority ties are deterministic."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderpriority").asc_nulls_last())
    return (
        o.where(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
    )


@query(
    "win_ntile",
    oracle="""
        select o_orderkey,
               ntile(4) over (order by o_totalprice asc nulls last, o_orderkey asc) as quartile
        from orders
        where o_orderkey < 2000
    """,
)
def win_ntile(spark, sf_dir):
    """#46 ntile over a total order — scale-safe distributed-rank plan.

    A bare ``ntile(k) OVER (ORDER BY ...)`` funnels the whole relation
    through a single task (Spark warns ``WindowExec: No Partition
    Defined``).  Instead we reproduce ntile's exact bucket arithmetic
    on a distributed global rank:

    1. ``repartitionByRange`` on the sort key — the same mechanism as
       Spark's global sort, so ranges are ordered across partitions;
    2. per-partition ``row_number`` (window partitioned by partition
       id — parallel, no global funnel);
    3. per-partition counts → cumulative offsets (tiny table, ~#parts
       rows, broadcast back);
    4. global rank r = offset + local row number, then the ntile rule:
       with n rows and k buckets, the first ``n mod k`` buckets take
       ``floor(n/k)+1`` rows and the rest ``floor(n/k)``.

    Exactly equal to ntile(k) for any input with a unique total order
    (the o_orderkey tiebreak guarantees that here).
    """
    k = 4
    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") < 2000)
        .select("o_orderkey", "o_totalprice")
    )
    nparts = spark.sparkContext.defaultParallelism
    parts = o.repartitionByRange(
        nparts, F.col("o_totalprice").asc_nulls_last(), F.col("o_orderkey").asc()
    ).withColumn("__pid", F.spark_partition_id())
    w_local = Window.partitionBy("__pid").orderBy(
        F.col("o_totalprice").asc_nulls_last(), F.col("o_orderkey").asc()
    )
    ranked = parts.withColumn("__rn", F.row_number().over(w_local))
    counts = ranked.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    # cumulative offsets over the tiny per-partition count table (~nparts
    # rows) — the only unpartitioned window, and it is metadata-sized
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    total = counts.agg(F.sum("__cnt").alias("__n"))
    r = F.col("__off") + F.col("__rn")
    n = F.col("__n")
    q = F.floor(n / k)
    rem = n % k
    big = rem * (q + 1)  # rows covered by the oversized leading buckets
    bucket = F.when(r <= big, F.floor((r - 1) / (q + 1)) + 1).otherwise(
        rem + F.floor((r - big - 1) / q) + 1
    )
    return (
        ranked.join(F.broadcast(offsets), "__pid")
        .join(F.broadcast(total))
        .select("o_orderkey", bucket.cast("int").alias("quartile"))
    )


@query(
    "win_percent_rank_cume_dist",
    oracle="""
        select c_nationkey, c_custkey,
               round(percent_rank() over (partition by c_nationkey
                                          order by c_acctbal asc nulls last), 6) as pr,
               round(cume_dist()   over (partition by c_nationkey
                                          order by c_acctbal asc nulls last), 6) as cd
        from customer
        where c_custkey < 500
    """,
)
def win_percent_rank_cume_dist(spark, sf_dir):
    """#47 percent_rank / cume_dist (acctbal unique within nation)."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").asc_nulls_last())
    return (
        c.where(F.col("c_custkey") < 500)
        .select(
            "c_nationkey",
            "c_custkey",
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
        )
    )


@query(
    "win_lag_lead",
    oracle="""
        select user_id, event_id,
               round(lag(value, 1, -1.0)  over (partition by user_id
                                                order by ts asc nulls last, event_id asc), 6) as prev_value,
               round(lead(value, 2)       over (partition by user_id
                                                order by ts asc nulls last, event_id asc), 6) as next2_value
        from events
        where user_id < 40
    """,
)
def win_lag_lead(spark, sf_dir):
    """#48 lag/lead with offset + default."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), F.col("event_id").asc()
    )
    return (
        ev.where(F.col("user_id") < 40)
        .select(
            "user_id",
            "event_id",
            F.round(F.lag("value", 1, -1.0).over(w), 6).alias("prev_value"),
            F.round(F.lead("value", 2).over(w), 6).alias("next2_value"),
        )
    )


@query(
    "win_first_last_nth",
    oracle="""
        select c_nationkey, c_custkey,
               first_value(c_name) over w as first_name,
               last_value(c_name)  over w as last_name,
               nth_value(c_name, 3) over w as third_name
        from customer
        where c_custkey < 300
        window w as (partition by c_nationkey
                     order by c_acctbal asc nulls last
                     rows between unbounded preceding and unbounded following)
    """,
)
def win_first_last_nth(spark, sf_dir):
    """#49 first/last/nth_value with the full-partition frame
    (last_value over the default frame is a footgun in every engine)."""
    c = table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        c.where(F.col("c_custkey") < 300)
        .select(
            "c_nationkey",
            "c_custkey",
            F.first("c_name").over(w).alias("first_name"),
            F.last("c_name").over(w).alias("last_name"),
            F.nth_value("c_name", 3).over(w).alias("third_name"),
        )
    )


@query(
    "win_running_sum",
    oracle="""
        select o_custkey, o_orderkey,
               round(sum(o_totalprice) over (partition by o_custkey
                                             order by o_orderdate asc nulls last, o_orderkey asc
                                             rows between unbounded preceding and current row), 6)
                   as running_spend,
               count(*) over (partition by o_custkey
                              order by o_orderdate asc nulls last, o_orderkey asc
                              rows between unbounded preceding and current row) as nth_order
        from orders
        where o_custkey < 150
    """,
)
def win_running_sum(spark, sf_dir):
    """#50 running aggregate — prefix sums accumulate in identical
    order on both engines, so round(6) is belt-and-braces."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc_nulls_last(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        o.where(F.col("o_custkey") < 150)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 6).alias("running_spend"),
            F.count("*").over(w).alias("nth_order"),
        )
    )


@query(
    "win_sliding_frames",
    oracle="""
        select user_id, event_id,
               round(avg(value) over (partition by user_id
                                      order by ts asc nulls last, event_id asc
                                      rows between 3 preceding and current row), 6) as avg_last4,
               round(sum(value) over (partition by user_id
                                      order by value asc nulls last
                                      range between 5.0 preceding and current row), 6) as sum_near
        from events
        where user_id < 30
    """,
)
def win_sliding_frames(spark, sf_dir):
    """#51 sliding ROWS frame + numeric RANGE frame."""
    ev = table(spark, sf_dir, "events")
    w_rows = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc_nulls_last(), F.col("event_id").asc())
        .rowsBetween(-3, Window.currentRow)
    )
    # fractional RANGE bounds aren't expressible through the PySpark
    # Window builder (int-only py4j signature) — use the SQL form.
    sum_near = F.expr(
        """sum(value) over (partition by user_id
                              order by value asc nulls last
                              range between 5.0 preceding and current row)"""
    )
    return (
        ev.where(F.col("user_id") < 30)
        .select(
            "user_id",
            "event_id",
            F.round(F.avg("value").over(w_rows), 6).alias("avg_last4"),
            F.round(sum_near, 6).alias("sum_near"),
        )
    )


@query(
    "win_topk_per_group",
    oracle="""
        select o_custkey, o_orderkey, round(o_totalprice, 6) as total
        from orders
        qualify row_number() over (partition by o_custkey
                                   order by o_totalprice desc nulls last, o_orderkey asc) <= 3
    """,
)
def win_topk_per_group(spark, sf_dir):
    """#52 top-k per group: row_number + filter (Spark) ≡ QUALIFY
    (DuckDB).  At scale this is the shuffle-once pattern; no sort of
    the full table, only per-partition heaps via the window sort."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 6).alias("total"))
    )


@query(
    "win_range_interval",
    oracle="""
        select user_id, event_id,
               round(sum(cast(round(value * 100) as bigint)) over (
                         partition by user_id order by ts
                         range between interval '1 hour' preceding
                               and current row)
                     / cast(100 as double), 6) as sum_1h,
               count(*) over (partition by user_id order by ts
                              range between interval '1 hour' preceding
                                    and current row) as n_1h
        from events
        where user_id < 50
    """,
)
def win_range_interval(spark, sf_dir):
    """#51-family time-interval RANGE frame: per-user rolling 1-hour
    sum and count ordered by event time — the time-series rolling
    window Presto/Trino users write as ``RANGE BETWEEN INTERVAL '1'
    HOUR PRECEDING AND CURRENT ROW``.  Spark supports the interval
    frame only through SQL expression text (the PySpark Window
    builder's rangeBetween is long-only), so the frame is declared
    via ``F.expr``.

    Determinism: a RANGE frame is defined by the ORDER BY *value*
    interval, so ts ties all share one frame (peers included) — no
    tiebreak needed; the summed measure folds to integer cents so
    accumulation order can't wiggle the 6th decimal at any scale.

    Scale: one shuffle on user_id + one per-partition sort, then a
    streaming frame scan (Spark's sliding-frame window buffers only
    the frame's rows, here bounded by events-per-hour-per-user).
    Identical cost class to the ROWS frame at #51."""
    ev = table(spark, sf_dir, "events")
    frame = """partition by user_id order by ts
               range between interval 1 hour preceding and current row"""
    return ev.where(F.col("user_id") < 50).select(
        "user_id",
        "event_id",
        F.round(
            F.expr(
                f"sum(cast(round(value * 100) as bigint)) over ({frame})"
            )
            / F.lit(100).cast("double"),
            6,
        ).alias("sum_1h"),
        F.expr(f"count(*) over ({frame})").alias("n_1h"),
    )


@query(
    "win_locf_fill",
    oracle="""
        select user_id, event_id,
               last_value(obs ignore nulls) over (
                   partition by user_id order by ts, event_id
                   rows between unbounded preceding and current row) as locf_value,
               last_value(obs ignore nulls) over (
                   partition by user_id order by ts, event_id
                   rows between unbounded preceding and 1 preceding)  as prev_obs,
               first_value(obs ignore nulls) over (
                   partition by user_id order by ts, event_id
                   rows between current row and unbounded following)  as nocb_value
        from (
            select user_id, event_id, ts,
                   case when event_type = 'purchase' then value end as obs
            from events
        )
    """,
)
def win_locf_fill(spark, sf_dir):
    """#154 IGNORE NULLS window navigation — LOCF forward fill (and
    its two siblings) over a sparsely-observed measure: treating
    `value` as observed only on purchase events, carry the last
    observation forward per user (`last_value IGNORE NULLS`, the
    Presto LOCF idiom every feature-engineering pipeline uses),
    expose the strictly-previous observation (the `lag ... IGNORE
    NULLS` face, spelled as the same navigator over an
    end-at-1-preceding frame so both engines agree on frame
    semantics), and the next-observation backfill (NOCB,
    `first_value IGNORE NULLS` over the suffix frame).

    Determinism: ts ties are broken by event_id (unique), so the
    navigator picks the same physical row on both engines; the value
    is CARRIED, never summed — bit-identical parquet doubles need no
    cents folding.

    Scale: one shuffle on user_id + one sort, then three navigators
    over the same ordered pass (Spark evaluates same-spec window
    functions in a single WindowExec); state per partition is one
    scalar per navigator (the running last-seen observation), not
    the frame — the same O(1) law as the running agg at #50."""
    ev = table(spark, sf_dir, "events")
    obs = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("obs"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return obs.select(
        "user_id",
        "event_id",
        F.last("obs", ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("locf_value"),
        F.last("obs", ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prev_obs"),
        F.first("obs", ignorenulls=True)
        .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
        .alias("nocb_value"),
    )


@query(
    "win_frame_exclude",
    oracle="""
        select user_id, event_id,
               sum(cents) over (
                   partition by user_id order by ts, event_id
                   rows between 3 preceding and 3 following
                   exclude current row) / cast(100 as double) as neighbor_sum,
               count(*) over (
                   partition by user_id order by ts, event_id
                   rows between 3 preceding and 3 following
                   exclude current row) as n_neighbors
        from (
            select user_id, event_id, ts,
                   cast(round(value * 100) as bigint) as cents
            from events
        )
    """,
)
def win_frame_exclude(spark, sf_dir):
    """#155 window frame EXCLUDE (SQL:2011, Trino/DuckDB `EXCLUDE
    CURRENT ROW`): each event's ±3-row neighborhood sum WITHOUT
    itself — the leave-one-out local baseline anomaly detectors
    compute.  Spark's frame grammar has no EXCLUDE clause, so the
    engine composes it exactly: full-frame aggregate minus the
    current row's contribution (sum − cents; count − 1).  For
    EXCLUDE GROUP/TIES the same subtraction runs against a
    peer-frame aggregate (RANGE over the ORDER BY key); only
    EXCLUDE NO OTHERS (the default) is a no-op — divergence
    documented here rather than hidden.

    The naive subtraction is NOT exact at two edges (review-caught):
    a frame whose neighbors contribute no non-null measure must
    yield NULL (SQL sum over the empty/all-null excluded frame),
    where sum−cents yields 0; and a NULL current-row measure must
    subtract NOTHING (sum skips it), where cents-as-NULL would
    poison the difference.  Composition below handles both: count
    the non-null neighbor measures explicitly and gate the
    subtraction (coalesced) on it — now value-equal to the native
    clause on every input, not just null-free fixtures.

    Determinism: the summed measure folds to integer cents BEFORE
    the window (subtraction is then exact — the x10 lesson from the
    recursion money sums), and ts ties carry the event_id tiebreak
    so ROWS frames align across engines.

    Scale: one shuffle + sort on user_id, streaming 7-row frame
    buffer; the subtraction is a per-row scalar — no second window
    pass, so EXCLUDE costs nothing over the plain sliding frame."""
    ev = table(spark, sf_dir, "events")
    cents = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 3)
    )
    self_vals = F.when(F.col("cents").isNotNull(), 1).otherwise(0)
    n_vals = F.count("cents").over(w) - self_vals
    return cents.select(
        "user_id",
        "event_id",
        F.when(
            n_vals > 0,
            (F.sum("cents").over(w) - F.coalesce(F.col("cents"), F.lit(0)))
            / F.lit(100).cast("double"),
        ).alias("neighbor_sum"),
        (F.count("*").over(w) - F.lit(1)).cast("bigint").alias("n_neighbors"),
    )


@query(
    "win_groups_frame",
    oracle="""
        select user_id, event_id,
               cast(sum(cents) over (
                   partition by user_id order by grp
                   range between 1 preceding and 1 following) as bigint)
                   as adj_group_sum,
               cast(grp as bigint) as grp
        from (
            select user_id, event_id,
                   cast(round(value * 100) as bigint) as cents,
                   dense_rank() over (
                       partition by user_id
                       order by date_trunc('hour', ts)) as grp
            from events
        )
    """,
)
def win_groups_frame(spark, sf_dir):
    """#160 SQL:2011 GROUPS frame mode (Trino ``GROUPS BETWEEN 1
    PRECEDING AND 1 FOLLOWING``) — the frame counts PEER GROUPS (rows
    tied on the ORDER BY key), not rows or key distance: each event's
    sum over its own hour-group plus the adjacent (by position, not
    by time — quiet hours collapse) hour-groups per user.

    Neither Spark nor DuckDB implements GROUPS, so both sides run the
    DEFINITIONAL composition: ``dense_rank()`` over the order key
    numbers each peer group consecutively, and a RANGE frame of ±1 on
    that rank IS the ±1-groups frame (group-position distance ≡
    dense-rank distance, no gaps by construction).  Same-bug-both-
    engines risk is covered by the pure-Python brute-force model in
    tests/test_window_nav.py, which builds peer groups from raw rows
    without SQL.  The measure folds to integer cents (exact.py
    policy).

    Scale: both windows share partitionBy(user_id) so Catalyst plans
    ONE exchange (plan-asserted in tests, with the sort count bounded
    at two — the orderBy keys differ: hour(ts) for the rank, grp for
    the frame, so the second window re-sorts within the partition but
    never re-shuffles); the RANGE-on-rank frame buffers only the
    three adjacent groups."""
    ev = table(spark, sf_dir, "events")
    wg = Window.partitionBy("user_id").orderBy(F.date_trunc("hour", "ts"))
    ranked = ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.dense_rank().over(wg).alias("grp"),
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("grp")
        .rangeBetween(-1, 1)
    )
    return ranked.select(
        "user_id",
        "event_id",
        F.sum("cents").over(wf).alias("adj_group_sum"),
        F.col("grp").cast("bigint").alias("grp"),
    )


def _exclude_base(spark, sf_dir):
    """Shared base for the EXCLUDE GROUP/TIES pair: hour-bucket epoch
    seconds as the RANGE order key (peers = same hour, so peer groups
    are non-trivial), and a purchase-only measure so the NULL gates
    are exercised by the fixture itself, not only by edge tests."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("h"),
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("bigint"),
        ).alias("obs_cents"),
    )


def _excluded_frame_cols(obs: str, wf, wp, keep_self: bool):
    """The #155 NULL-gated EXCLUDE composition, shared by the GROUP /
    TIES / GROUPS-mode faces (review r10 — the gate logic was already
    review-fixed once, so it must live in ONE place): full-frame
    aggregate minus peer-frame aggregate over integer cents, the value
    gated on the count of REMAINING non-null measures (an
    empty/all-null remaining frame is SQL NULL, not 0), and the peer
    sum coalesced (an all-null peer group subtracts nothing).
    ``keep_self`` adds the current row back — EXCLUDE TIES.  Returns
    (value /100-as-double, remaining-row-count-as-bigint)."""
    n_vals = F.count(obs).over(wf) - F.count(obs).over(wp)
    total = F.sum(obs).over(wf) - F.coalesce(F.sum(obs).over(wp), F.lit(0))
    n_rest = F.count("*").over(wf) - F.count("*").over(wp)
    if keep_self:
        n_vals = n_vals + F.when(F.col(obs).isNotNull(), 1).otherwise(0)
        total = total + F.coalesce(F.col(obs), F.lit(0))
        n_rest = n_rest + F.lit(1)
    return (
        F.when(n_vals > 0, total / F.lit(100).cast("double")),
        n_rest.cast("bigint"),
    )


_EXCLUDE_ORACLE_BASE = """
        from (
            select user_id, event_id,
                   cast(epoch(date_trunc('hour', ts)) as bigint) as h,
                   case when event_type = 'purchase'
                        then cast(round(value * 100) as bigint) end
                       as obs_cents
            from events
        )
"""


@query(
    "win_frame_exclude_group",
    oracle="""
        select user_id, event_id,
               sum(obs_cents) over (
                   partition by user_id order by h
                   range between 7200 preceding and 7200 following
                   exclude group) / cast(100 as double) as excl_group_sum,
               count(*) over (
                   partition by user_id order by h
                   range between 7200 preceding and 7200 following
                   exclude group) as n_rest
"""
    + _EXCLUDE_ORACLE_BASE,
)
def win_frame_exclude_group(spark, sf_dir):
    """#155 SQL:2011 frame ``EXCLUDE GROUP`` (graded, r9 verdict #2):
    each event's purchase sum over its ±2-hour RANGE neighborhood
    EXCLUDING the current row AND all its peers (rows in the same
    hour bucket) — the "everything around my bucket" baseline.

    Spark's frame grammar has no EXCLUDE clause; the composition is
    the #155 subtraction run against a PEER-FRAME aggregate instead
    of the current row: full RANGE frame minus the RANGE(0,0) frame
    (exactly the peer group, because RANGE peers tie on the order
    key).  Both windows share (partitionBy, orderBy), so Catalyst
    plans ONE exchange + ONE sort + ONE WindowExec evaluating both
    frames (plan-asserted in tests/test_window_nav.py).

    NULL gates (the #155 review lessons, applied to the group case):
    the remaining frame's non-null measure count gates the
    subtraction — when every non-null observation in the frame sits
    inside the excluded peer group, SQL yields NULL where naive
    subtraction yields 0; and a NULL-heavy peer group must subtract
    only its non-null sum (coalesce).  DuckDB grades with its NATIVE
    ``EXCLUDE GROUP`` clause, so the composition is checked against
    an independent implementation, not a re-spelling of itself.

    Scale: one shuffle + sort on user_id; both frames stream within
    the sorted partition (a ±2h bounded buffer), and the subtraction
    is a per-row scalar — EXCLUDE GROUP costs nothing over the plain
    sliding frame."""
    base = _exclude_base(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("h")
    val, n_rest = _excluded_frame_cols(
        "obs_cents", w.rangeBetween(-7200, 7200), w.rangeBetween(0, 0),
        keep_self=False,
    )
    return base.select(
        "user_id",
        "event_id",
        val.alias("excl_group_sum"),
        n_rest.alias("n_rest"),
    )


@query(
    "win_frame_exclude_ties",
    oracle="""
        select user_id, event_id,
               sum(obs_cents) over (
                   partition by user_id order by h
                   range between 7200 preceding and 7200 following
                   exclude ties) / cast(100 as double) as excl_ties_sum,
               count(*) over (
                   partition by user_id order by h
                   range between 7200 preceding and 7200 following
                   exclude ties) as n_rest
"""
    + _EXCLUDE_ORACLE_BASE,
)
def win_frame_exclude_ties(spark, sf_dir):
    """#155 SQL:2011 frame ``EXCLUDE TIES`` (graded, r9 verdict #2):
    like EXCLUDE GROUP but the current row itself STAYS in the frame
    — peers are excluded, self is kept ("my value against the other
    buckets").

    Composition: the GROUP subtraction plus the current row added
    back — full-frame sum − peer-group sum + coalesce(self, 0), with
    the NULL gate counting the remaining non-null measures
    (count(full) − count(peers) + self-is-not-null): when the
    current row is the frame's only non-null observation the result
    is its own value (gate = 1 > 0), and when self is NULL and all
    other observations are peers the result is NULL, exactly the
    native semantics.  Same single (exchange, sort, WindowExec)
    plan as the GROUP face; DuckDB grades with native ``EXCLUDE
    TIES``."""
    base = _exclude_base(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("h")
    val, n_rest = _excluded_frame_cols(
        "obs_cents", w.rangeBetween(-7200, 7200), w.rangeBetween(0, 0),
        keep_self=True,
    )
    return base.select(
        "user_id",
        "event_id",
        val.alias("excl_ties_sum"),
        n_rest.alias("n_rest"),
    )


@query(
    "win_groups_frame_bounds",
    oracle="""
        select user_id, event_id,
               cast(sum(cents) over (
                   partition by user_id order by grp
                   range between 2 preceding and 2 following) as bigint)
                   as wide_group_sum,
               cast(sum(cents) over (
                   partition by user_id order by grp
                   range between unbounded preceding and current row)
                   as bigint) as run_group_sum,
               cast(grp as bigint) as grp
        from (
            select user_id, event_id,
                   cast(round(value * 100) as bigint) as cents,
                   dense_rank() over (
                       partition by user_id
                       order by date_trunc('hour', ts)) as grp
            from events
        )
    """,
)
def win_groups_frame_bounds(spark, sf_dir):
    """#160 GROUPS frame mode, widened bounds (r9 verdict #5): the
    n>1 shape ``GROUPS BETWEEN 2 PRECEDING AND 2 FOLLOWING`` and the
    running shape ``GROUPS BETWEEN UNBOUNDED PRECEDING AND CURRENT
    ROW`` — which in GROUPS (as in RANGE) mode closes the frame at
    the end of the current PEER GROUP, so every row of a group sees
    the same running sum.

    Same definitional composition as #160's ±1 face: dense_rank()
    numbers peer groups consecutively, so group-position distance ≡
    rank distance and RANGE ±2 on the rank IS the ±2-groups frame;
    the running bound maps to RANGE UNBOUNDED PRECEDING..CURRENT ROW
    on the rank, whose peers-inclusive CURRENT ROW is exactly the
    GROUPS semantics (both close at the current group's end).
    Neither engine parses GROUPS, so DuckDB runs the same
    composition; the same-bug risk is covered by the pure-Python
    brute force over raw (user, hour) groups in
    tests/test_window_nav.py, now asserting BOTH bounds.

    Scale: identical to #160 — one exchange on user_id, two sorts
    (hour(ts) for the rank, grp for the frames), and the two frame
    aggregates share one WindowExec since their (partition, order)
    match; the running frame is O(1) state, the ±2 frame buffers
    five adjacent groups."""
    ev = table(spark, sf_dir, "events")
    wg = Window.partitionBy("user_id").orderBy(F.date_trunc("hour", "ts"))
    ranked = ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        F.dense_rank().over(wg).alias("grp"),
    )
    w = Window.partitionBy("user_id").orderBy("grp")
    return ranked.select(
        "user_id",
        "event_id",
        F.sum("cents").over(w.rangeBetween(-2, 2)).alias("wide_group_sum"),
        F.sum("cents")
        .over(w.rangeBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("run_group_sum"),
        F.col("grp").cast("bigint").alias("grp"),
    )


@query(
    "win_groups_exclude",
    oracle="""
        select user_id, event_id,
               sum(obs_cents) over (
                   partition by user_id order by grp
                   range between 1 preceding and 1 following
                   exclude group) / cast(100 as double) as adj_excl_sum,
               count(*) over (
                   partition by user_id order by grp
                   range between 1 preceding and 1 following
                   exclude group) as n_rest,
               cast(grp as bigint) as grp
        from (
            select user_id, event_id,
                   case when event_type = 'purchase'
                        then cast(round(value * 100) as bigint) end
                       as obs_cents,
                   dense_rank() over (
                       partition by user_id
                       order by date_trunc('hour', ts)) as grp
            from events
        )
    """,
)
def win_groups_exclude(spark, sf_dir):
    """#155 × #160 combination (r10 capstone): ``GROUPS BETWEEN 1
    PRECEDING AND 1 FOLLOWING EXCLUDE GROUP`` — each event's purchase
    sum over the ADJACENT hour-groups only, the current group (self
    AND its peers) excluded entirely: "my neighbors' buckets, not
    mine", per user.

    Both SQL:2011 features Spark lacks compose through the SAME two
    pieces already graded separately: the dense_rank definitional
    composition turns GROUPS into RANGE-on-rank (#160), and the
    peer-frame subtraction with NULL gates turns EXCLUDE GROUP into
    full-frame minus RANGE(0,0) (#155) — on the rank axis the peer
    frame IS the current group, so the subtraction removes exactly
    what EXCLUDE GROUP names.  DuckDB grades with its NATIVE
    ``EXCLUDE GROUP`` clause over the same rank composition
    (exclusion independent, rank composition shared — the shared half
    is covered by the pure-Python peer-group brute force in
    tests/test_window_nav.py).  The purchase-only measure exercises
    both NULL-gate branches on the fixture itself.

    Scale: the rank window and both frame aggregates share one
    exchange on user_id (two sorts: hour(ts) then grp — the #160
    plan, plan-asserted); the subtraction is a per-row scalar, so the
    combined feature costs exactly what the plain ±1-group frame
    costs."""
    ev = table(spark, sf_dir, "events")
    wg = Window.partitionBy("user_id").orderBy(F.date_trunc("hour", "ts"))
    ranked = ev.select(
        "user_id",
        "event_id",
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("bigint"),
        ).alias("obs_cents"),
        F.dense_rank().over(wg).alias("grp"),
    )
    w = Window.partitionBy("user_id").orderBy("grp")
    val, n_rest = _excluded_frame_cols(
        "obs_cents", w.rangeBetween(-1, 1), w.rangeBetween(0, 0),
        keep_self=False,
    )
    return ranked.select(
        "user_id",
        "event_id",
        val.alias("adj_excl_sum"),
        n_rest.alias("n_rest"),
        F.col("grp").cast("bigint").alias("grp"),
    )


@query(
    "win_minmax_by_n",
    oracle="""
        select l_orderkey, l_linenumber,
               array_to_string(
                   list_transform(
                       list_slice(
                           list_reverse_sort(
                               list(struct_pack(
                                        nf := false,
                                        k := l_extendedprice * 10
                                             + l_linenumber,
                                        v := cast(l_linenumber as varchar)))
                               over (partition by l_orderkey
                                     order by l_linenumber,
                                              l_extendedprice, l_quantity
                                     rows between 2 preceding
                                              and current row)),
                           1, 2),
                       s -> s.v), ',') as top2_price_lines,
               array_to_string(
                   list_transform(
                       list_sort(
                           list(struct_pack(
                                    nf := l_quantity is null,
                                    k := l_quantity,
                                    k2 := l_linenumber,
                                    v := cast(l_linenumber as varchar)))
                           over (partition by l_orderkey
                                 order by l_linenumber,
                                          l_extendedprice, l_quantity
                                 rows between unbounded preceding
                                          and current row)),
                       s -> s.v), ',') as lines_by_qty
        from lineitem
        where l_orderkey < 300
    """,
)
def win_minmax_by_n(spark, sf_dir):
    """#34/#37 depth (round 12, VERDICT r11 #4): WINDOWED 3-arg
    ``max_by(x, y, n) OVER (frame)`` and WINDOWED ordered
    ``array_agg(x ORDER BY k) OVER (frame)`` — the forms round 11
    refused.  The dialect's parts-based rewrites now relocate the OVER
    clause onto the bare collect_list (dialect._rewrite_agg_over_calls),
    so the frame feeds the collection and the sort/slice/project runs
    per output row.  The max_by sort key composes price*10 + linenumber
    — 3-arg min_by/max_by tie order is unspecified on every engine.
    Determinism rule this face encodes (found at x10, where the random
    corpus DUPLICATES l_linenumber within an order): a ROWS frame over
    a non-unique ORDER BY has engine-arbitrary peer order, so the
    window ORDER BY lists every column the measures read — rows tying
    on all of them are interchangeable, making frame contents
    value-identical under any peer arrangement.  DuckDB grades with an independent
    composition: windowed list() of struct_pack, list_reverse_sort /
    list_sort, slice, transform — mirroring the struct field order and
    types exactly (lexicographic struct comparison on both engines).

    Scale: one window exchange (partition by order key); per-row state
    is the frame's collected structs — bounded by the frame (3 rows /
    the partition's ≤ 7 rows here).  An unbounded-frame collect on a
    huge partition is the same memory contract as any windowed
    collect_list, stated rather than hidden."""
    from sparketl import dialect
    from sparketl.tables import load_tables

    load_tables(spark, sf_dir)
    return dialect.sql(
        spark,
        """
        select l_orderkey, l_linenumber,
               array_join(max_by(cast(l_linenumber as string),
                                 l_extendedprice * 10 + l_linenumber, 2)
                   over (partition by l_orderkey order by l_linenumber, l_extendedprice, l_quantity
                         rows between 2 preceding and current row),
                   ',') as top2_price_lines,
               array_join(array_agg(cast(l_linenumber as string)
                                    order by l_quantity, l_linenumber)
                   over (partition by l_orderkey order by l_linenumber, l_extendedprice, l_quantity
                         rows between unbounded preceding
                                  and current row),
                   ',') as lines_by_qty
        from lineitem
        where l_orderkey < 300
        """,
    )
