"""Aggregations (§2.4 #26-39) and approximate aggregations (§2.5 #40-43),
plus the flagship TPC-H-Q1-shape pricing summary used by ``entry()``.

Spark's groupBy().agg() already plans partial→final hash aggregation
with map-side combine and sort-based spill fallback — the same shape
Presto describes (paper §4.6) — so at 100 TB the only tunables are
shuffle partition count (AQE coalesces) and key skew (AQE skew-join).

Determinism: floating aggregates are rounded to 6 decimals on BOTH
engines; moment/corr queries use small-magnitude columns (discount,
tax) so cross-engine summation-order error stays far below the rounding
granularity (SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparketl.functions.exact import (
    charge_sum,
    charge_sum_sql,
    disc_price_sum,
    disc_price_sum_sql,
    exact_avg,
    exact_avg_sql,
    exact_sum,
    exact_sum_sql,
)
from sparketl.registry import query
from sparketl.tables import table


@query(
    "flagship_q1_pricing_summary",
    oracle=f"""
        select l_returnflag, l_linestatus,
               {exact_sum_sql('l_quantity', 2)}      as sum_qty,
               {exact_sum_sql('l_extendedprice', 2)} as sum_base_price,
               {disc_price_sum_sql()}                as sum_disc_price,
               {charge_sum_sql()}                    as sum_charge,
               {exact_avg_sql('l_quantity', 2)}      as avg_qty,
               {exact_avg_sql('l_extendedprice', 2)} as avg_price,
               {exact_avg_sql('l_discount', 4)}      as avg_disc,
               count(*)                                        as count_order
        from lineitem
        where l_shipdate <= timestamp '1998-09-01'
        group by l_returnflag, l_linestatus
    """,
)
def flagship_q1_pricing_summary(spark, sf_dir):
    """Flagship (t1 smoke + headline bench query): scan→filter→agg.

    Plan shape to preserve at scale: parquet scan with the shipdate
    filter pushed down, partial agg on 6 groups map-side, tiny final
    shuffle.  No join, no sort — pure aggregation throughput.  Money
    sums use the exact integer-unit decomposition (functions/exact.py)
    so results are independent of partitioning/accumulation order.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # NO round() wrappers here: the exact-integer decomposition is
            # already bit-identical across engines, and round(x, 6) on a
            # >1e9 value is itself engine-divergent (x*1e6 nears 2^53;
            # DuckDB rounds via float scaling, Spark via exact decimal —
            # the last digit flips; found at sf0.1).  Rule: round only
            # values whose |x| * 10^d stays far below 2^53.
            exact_sum("l_quantity", 2).alias("sum_qty"),
            exact_sum("l_extendedprice", 2).alias("sum_base_price"),
            disc_price_sum().alias("sum_disc_price"),
            charge_sum().alias("sum_charge"),
            exact_avg("l_quantity", 2).alias("avg_qty"),
            exact_avg("l_extendedprice", 2).alias("avg_price"),
            exact_avg("l_discount", 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_counts",
    oracle="""
        select count(*)                     as n_rows,
               count(o_custkey)             as n_custkey,
               count(distinct o_custkey)    as n_distinct_cust,
               count(distinct o_orderstatus) as n_status
        from orders
    """,
)
def agg_counts(spark, sf_dir):
    """#26 count(*) / count(col) / count(distinct)."""
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.count("o_custkey").alias("n_custkey"),
        F.countDistinct("o_custkey").alias("n_distinct_cust"),
        F.countDistinct("o_orderstatus").alias("n_status"),
    )


@query(
    "agg_basic_grouped",
    oracle=f"""
        select o_orderstatus,
               round({exact_sum_sql('o_totalprice', 2)}, 6) as sum_price,
               round({exact_avg_sql('o_totalprice', 2)}, 6) as avg_price,
               round(min(o_totalprice), 6) as min_price,
               round(max(o_totalprice), 6) as max_price,
               round(sum(distinct cast(o_custkey % 100 as double)), 6) as sum_dist_bucket
        from orders
        group by o_orderstatus
    """,
)
def agg_basic_grouped(spark, sf_dir):
    """#27 + #28 sum/avg/min/max (+ DISTINCT variant) over a hash agg."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(exact_sum("o_totalprice", 2), 6).alias("sum_price"),
        F.round(exact_avg("o_totalprice", 2), 6).alias("avg_price"),
        F.round(F.min("o_totalprice"), 6).alias("min_price"),
        F.round(F.max("o_totalprice"), 6).alias("max_price"),
        F.round(F.sum_distinct((F.col("o_custkey") % 100).cast("double")), 6).alias(
            "sum_dist_bucket"
        ),
    )


#: NOTE the money column carries NO trailing round(x, 6): the
#: integer-cents sum divided by 100 is already exact to 2 decimals,
#: and DuckDB's round(x, 6) itself CORRUPTS values past ~9e9 (it
#: computes x*1e6 which exceeds 2^53 there, while Spark rounds via
#: BigDecimal — found by the round-14 x100 gate, where this face's
#: sums reach 4.8e11).  round(,6) stays only where it has a job:
#: absorbing float accumulation noise on SMALL-magnitude aggregates.
_FILTER_CLAUSE_SQL = """
    select l_returnflag,
           sum(cast(round(l_extendedprice * 100) as bigint))
               filter (where l_discount > 0.05)
               / cast(100 as double) as sum_discounted,
           count(*) filter (where l_quantity >= 30)               as n_bulk,
           round(avg(l_tax) filter (where l_linestatus = 'F'), 6) as avg_tax_f
    from lineitem
    group by l_returnflag
"""


@query("agg_filter_clause", oracle=_FILTER_CLAUSE_SQL)
def agg_filter_clause(spark, sf_dir):
    """#29 agg FILTER clause — SQL entry point (E2): Spark parses the
    ANSI FILTER syntax natively, so the exact same text runs on both
    engines."""
    table(spark, sf_dir, "lineitem")  # ensure view registered
    return spark.sql(_FILTER_CLAUSE_SQL)


@query(
    "agg_moments",
    oracle="""
        select l_returnflag,
               round(stddev_samp(l_discount), 6) as sd_disc,
               round(stddev_pop(l_discount), 6)  as sdp_disc,
               round(var_samp(l_tax), 6)         as var_tax,
               round(var_pop(l_tax), 6)          as varp_tax
        from lineitem
        group by l_returnflag
    """,
)
def agg_moments(spark, sf_dir):
    """#30 stddev / variance (sample + population) on small-magnitude
    columns so cross-engine accumulation error << round(6)."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_discount"), 6).alias("sd_disc"),
        F.round(F.stddev_pop("l_discount"), 6).alias("sdp_disc"),
        F.round(F.var_samp("l_tax"), 6).alias("var_tax"),
        F.round(F.var_pop("l_tax"), 6).alias("varp_tax"),
    )


@query(
    "agg_higher_moments",
    oracle="""
        select l_returnflag,
               round(skewness(l_discount), 6) as skew_disc,
               round(kurtosis(l_discount), 6) as kurt_disc,
               round(skewness(l_tax), 6)      as skew_tax,
               round(kurtosis(l_tax), 6)      as kurt_tax
        from lineitem
        group by l_returnflag
    """,
)
def agg_higher_moments(spark, sf_dir):
    """#30 extension (round 11, VERDICT r10 #4): skewness / kurtosis.

    Estimator-convention trap (the reason this is not a bare name map):
    Spark's skewness/kurtosis are POPULATION moments (g1 = m3/m2^1.5,
    g2 = m4/m2^2 - 3) while Presto/Trino and DuckDB both return the
    SAMPLE-corrected estimators (G1 = g1·sqrt(n(n-1))/(n-2); excess
    G2 = ((n+1)g2 + 6)(n-1)/((n-2)(n-3)) — Trino documents exactly
    these bias-corrected formulas, and DuckDB's skewness/kurtosis
    match them, probed live: g1=1.0952→G1=1.499693 on {1,2,4,8,16,32},
    bit-equal across all three after round(6)).  The Spark face applies
    the corrections explicitly; the dialect front door rewrites the
    Presto names to the same corrected expressions.

    Small-magnitude columns per the module determinism note; n >= 4
    guaranteed by the 3-group fixture split (the corrections divide by
    (n-2)(n-3)).

    Scale: one partial→final hash aggregate — Spark's moment
    aggregates carry (n, m1..m4) as the merge state, so map-side
    combine works and the shuffle is 3 groups × a 5-double state."""
    li = table(spark, sf_dir, "lineitem")

    def g1_sample(col):
        n = F.count(col)
        return F.skewness(col) * F.sqrt(n * (n - 1)) / (n - 2)

    def g2_sample(col):
        n = F.count(col)
        return ((n + 1) * F.kurtosis(col) + 6) * (n - 1) / ((n - 2) * (n - 3))

    return li.groupBy("l_returnflag").agg(
        F.round(g1_sample("l_discount"), 6).alias("skew_disc"),
        F.round(g2_sample("l_discount"), 6).alias("kurt_disc"),
        F.round(g1_sample("l_tax"), 6).alias("skew_tax"),
        F.round(g2_sample("l_tax"), 6).alias("kurt_tax"),
    )


def reduce_agg(col, init, merge, max_group_rows: int = 1_000_000):
    """Presto ``reduce_agg(x, s0, input, combine)`` as a BOUNDED sorted
    fold: ``aggregate(array_sort(collect_list(x)), s0, input)``.

    Soundness: Presto requires the input/combine pair to be
    commutative-associative (its docs define the result as a fold in
    unspecified order), so a sequential fold over the group IS the
    reference semantics; sorting pins one order so results are
    deterministic and engine-portable even where the caller's merge is
    only approximately associative (floating point).  The combine
    function is not needed — sequential folding never merges two
    partial states.

    MEMORY BOUND (the reason Presto implements this as a true partial
    aggregate and this composition does not): collect_list materializes
    the whole group on one executor — O(group size) heap, no map-side
    combine.  The ``max_group_rows`` guard turns a group past the bound
    into a loud USER_RAISED_EXCEPTION instead of an executor OOM; at
    100 TB, callers with unbounded groups should use a native aggregate
    (sum/min/max/...) or a two-level pre-aggregation, not reduce_agg.
    The size() branch reuses the same collect_list expression — Spark
    deduplicates identical aggregate functions in one Aggregate node,
    so the group is collected once."""
    arr = F.array_sort(F.collect_list(col))
    return F.when(
        F.size(arr) > max_group_rows,
        F.expr(
            f"raise_error('reduce_agg: group exceeds {max_group_rows} rows"
            " — the sequential-fold composition materializes the group;"
            " use a native aggregate or raise the bound')"
        ),
    ).otherwise(F.aggregate(arr, init, merge))


@query(
    "agg_reduce_agg",
    oracle="""
        select l_returnflag,
               round(list_reduce(
                   list_prepend(cast(1.0 as double),
                                list_sort(list(l_discount))),
                   (s, x) -> s * (1 + x)), 6)               as compounded,
               list_reduce(
                   list_prepend(cast(0 as bigint),
                                list_sort(list(l_linenumber))),
                   (s, x) -> s + x * x)                     as sum_sq_line
        from lineitem
        where l_orderkey < 2000
        group by l_returnflag
    """,
)
def agg_reduce_agg(spark, sf_dir):
    """Presto ``reduce_agg`` (round 11, VERDICT r10 #3): a compounding
    product fold Σ-free aggregates can't express (state := state·(1+x))
    and a bigint sum-of-squares fold, via the bounded sorted-fold
    composition (see ``reduce_agg`` above).  DuckDB grades with its
    ``list_reduce`` — no initial-state parameter, so the oracle
    prepends s0 to the sorted list (fold starts at the same state,
    same order → exact equality; the double fold is bit-identical
    because both engines fold the identical sorted sequence).

    The key filter keeps groups ~10^2 rows — reduce_agg is for
    BOUNDED groups by contract; the declared guard (1M rows) is the
    refuse-loudly path for unbounded ones (unit-tested with a tiny
    bound in tests/test_dialect.py::test_reduce_agg_guard_fires_on_unbounded_group).

    Scale: one shuffle to the 3 groups; the fold is a JVM HOF over the
    collected array.  The collect_list state is the documented memory
    bound — this is the sanctioned shape ONLY because the contract
    bounds the group, exactly like Presto's own array_agg."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_orderkey") < 2000)
        .groupBy("l_returnflag")
        .agg(
            F.round(
                reduce_agg(
                    "l_discount",
                    F.lit(1.0).cast("double"),
                    lambda s, x: s * (1 + x),
                ),
                6,
            ).alias("compounded"),
            reduce_agg(
                "l_linenumber",
                F.lit(0).cast("bigint"),
                lambda s, x: s + x * x,
            ).alias("sum_sq_line"),
        )
    )


@query(
    "agg_bivariate",
    oracle="""
        select l_linestatus,
               round(corr(l_discount, l_tax), 6)       as corr_dt,
               round(covar_samp(l_discount, l_tax), 6) as cov_dt,
               round(covar_pop(l_discount, l_tax), 6)  as covp_dt
        from lineitem
        group by l_linestatus
    """,
)
def agg_bivariate(spark, sf_dir):
    """#31 corr / covar_samp / covar_pop."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.corr("l_discount", "l_tax"), 6).alias("corr_dt"),
        F.round(F.covar_samp("l_discount", "l_tax"), 6).alias("cov_dt"),
        F.round(F.covar_pop("l_discount", "l_tax"), 6).alias("covp_dt"),
    )


@query(
    "agg_min_by_max_by",
    oracle="""
        with ranked as (
            select c_nationkey, c_name,
                   row_number() over (partition by c_nationkey
                       order by c_acctbal asc, c_name asc) as rn_min,
                   row_number() over (partition by c_nationkey
                       order by c_acctbal desc, c_name desc) as rn_max
            from customer
        )
        select c_nationkey,
               max(case when rn_min = 1 then c_name end) as poorest,
               max(case when rn_max = 1 then c_name end) as richest
        from ranked
        group by c_nationkey
    """,
)
def agg_min_by_max_by(spark, sf_dir):
    """#32 min_by / max_by (argmin/argmax).  The ordering key is the
    COMPOSITE (acctbal, name) on both engines — lexicographic struct/
    row comparison — so equal acctbals tie-break deterministically by
    name.  The driver fixtures happen to have unique acctbals within a
    nation, but the generated x10 corpus does not, and a bare-acctbal
    argmin there is engine-defined (caught by the round-14 full x10
    gate run: one nation's 'poorest' diverged on a tied balance)."""
    c = table(spark, sf_dir, "customer")
    key = F.struct("c_acctbal", "c_name")
    return c.groupBy("c_nationkey").agg(
        F.min_by("c_name", key).alias("poorest"),
        F.max_by("c_name", key).alias("richest"),
    )


@query(
    "agg_bool",
    oracle="""
        select o_orderstatus,
               bool_and(o_totalprice > 1000)   as all_over_1k,
               bool_or(o_totalprice > 400000)  as any_over_400k
        from orders
        group by o_orderstatus
    """,
)
def agg_bool(spark, sf_dir):
    """#33 bool_and / bool_or."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
    )


@query(
    "agg_array_agg",
    oracle="""
        select n_regionkey,
               array_to_string(array_agg(n_name order by n_name), ',') as nations
        from nation
        group by n_regionkey
    """,
)
def agg_array_agg(spark, sf_dir):
    """#34 array_agg — always sorted in declared queries (Presto's
    array_agg is order-nondeterministic; the value-hash is not), and
    serialized to a string in the final select: the driver's pandas
    canonicalizer cannot hash list cells (r1 ADVICE.md + the recorded
    TypeError in CORRECTNESS_r01.json)."""
    n = table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
    )


@query(
    "agg_array_agg_ordered",
    oracle="""
        select l_orderkey,
               array_to_string(array_agg(l_quantity
                                         order by l_linenumber,
                                                  l_quantity), ',')
                   as qty_by_line,
               array_to_string(array_agg(l_linenumber
                                         order by l_quantity desc,
                                                  l_linenumber desc), ',')
                   as lines_by_qty_desc,
               array_to_string(array_agg(l_returnflag
                                         order by l_shipdate,
                                                  l_linenumber,
                                                  l_returnflag), ',')
                   as flags_by_ship
        from lineitem
        where l_orderkey < 2000
        group by l_orderkey
    """,
)
def agg_array_agg_ordered(spark, sf_dir):
    """#34 depth (round 11): Presto's ``array_agg(x ORDER BY k)`` —
    the within-aggregate ORDER BY Spark lacks — via the dialect front
    door's sort-then-project composition (dialect._array_agg_parts:
    collect_list of (null-flag, keys, value) structs, array_sort,
    reverse for DESC, transform down to the value).  Single-key ASC,
    multi-key DESC, and multi-key mixed-type ASC faces; (Presto leaves tie order
    unspecified, the value hash does not — and the fixture's
    l_linenumber DUPLICATES within an order, so every key list ends
    with the aggregated value itself: tied keys then imply tied
    values, making the output tie-insensitive).  DuckDB grades with its
    native within-aggregate ORDER BY — an independent implementation
    of the same semantics.

    Scale: one partial→final hash aggregate; the per-group sort is
    O(group log group) JVM-side on collected arrays — same memory
    contract as any array_agg (groups must fit; the fixture's orders
    hold ≤ 7 lineitems)."""
    from sparketl import dialect
    from sparketl.tables import load_tables

    load_tables(spark, sf_dir)
    return dialect.sql(
        spark,
        """
        select l_orderkey,
               array_join(array_agg(l_quantity
                                    order by l_linenumber,
                                             l_quantity), ',')
                   as qty_by_line,
               array_join(array_agg(l_linenumber
                                    order by l_quantity desc,
                                             l_linenumber desc), ',')
                   as lines_by_qty_desc,
               array_join(array_agg(l_returnflag
                                    order by l_shipdate,
                                             l_linenumber,
                                             l_returnflag), ',')
                   as flags_by_ship
        from lineitem
        where l_orderkey < 2000
        group by l_orderkey
        """,
    )


@query(
    "agg_minmax_by_n",
    oracle="""
        select o_orderstatus,
               array_to_string(
                   (array_agg(o_totalprice order by o_orderkey))[1:5],
                   ',') as first5_prices,
               array_to_string(
                   (array_agg(o_totalprice order by o_orderkey desc))[1:5],
                   ',') as last5_prices,
               array_to_string(
                   (array_agg(o_orderkey order by o_totalprice desc,
                                               o_orderkey desc))[1:3],
                   ',') as top3_price_keys
        from orders
        where o_orderkey < 3000
        group by o_orderstatus
    """,
)
def agg_minmax_by_n(spark, sf_dir):
    """#32 depth (round 11): Presto's 3-arg ``min_by/max_by(x, y, n)``
    — the n values of x at the n smallest/largest y — via the dialect
    front door's sorted-struct composition (dialect._minmax_by_n_parts;
    Spark's builtins are 2-ary).  DuckDB 1.0 has no 3-arg arg_min, so
    the oracle states the same semantics independently as ordered
    array_agg + list slicing.  The top3 face's ties in o_totalprice
    are broken by appending the VALUE (o_orderkey) to the oracle's
    sort — Presto leaves tie order unspecified; the Spark composition
    sorts (y, x) structs, so its tie order IS value order, which the
    two-key oracle mirrors.

    Scale: one partial→final hash aggregate; per-group sort on the
    collected structs — the array_agg memory contract, bounded here by
    the key filter."""
    from sparketl import dialect
    from sparketl.tables import load_tables

    load_tables(spark, sf_dir)
    return dialect.sql(
        spark,
        """
        select o_orderstatus,
               array_join(min_by(o_totalprice, o_orderkey, 5), ',')
                   as first5_prices,
               array_join(max_by(o_totalprice, o_orderkey, 5), ',')
                   as last5_prices,
               array_join(max_by(o_orderkey, o_totalprice, 3), ',')
                   as top3_price_keys
        from orders
        where o_orderkey < 3000
        group by o_orderstatus
        """,
    )


@query(
    "agg_map_agg",
    oracle="""
        with c as (
            select o_orderstatus, o_orderpriority, count(*) as cnt
            from orders group by 1, 2
        )
        select o_orderstatus,
               array_to_string(
                   array_agg(o_orderpriority || ':' || cast(cnt as varchar)
                             order by o_orderpriority), ',') as prio_counts
        from c
        group by o_orderstatus
    """,
)
def agg_map_agg(spark, sf_dir):
    """#35 map_agg: build the map with map_from_entries(collect_list),
    then serialize sorted 'key:value' entries to one string — map cells
    are unhashable in the driver's pandas canonicalizer (r1 ADVICE.md),
    so the map itself never reaches the final select."""
    o = table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("cnt"))
    mapped = counts.groupBy("o_orderstatus").agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("o_orderpriority").alias("key"),
                        F.col("cnt").alias("value"),
                    )
                )
            )
        ).alias("prio_map")
    )
    return mapped.select(
        "o_orderstatus",
        F.array_join(
            F.transform(
                F.sort_array(F.map_entries("prio_map")),
                lambda e: F.concat(e["key"], F.lit(":"), e["value"].cast("string")),
            ),
            ",",
        ).alias("prio_counts"),
    )


@query(
    "agg_map_union",
    oracle="""
        with per_order as (
            select o_orderstatus, o_orderpriority,
                   cast(round(o_totalprice * 100) as bigint) as cents
            from orders
        ),
        merged as (
            select o_orderstatus, o_orderpriority, max(cents) as cents
            from per_order
            group by o_orderstatus, o_orderpriority
        )
        select o_orderstatus,
               array_to_string(
                   array_agg(o_orderpriority || ':' || cast(cents as varchar)
                             order by o_orderpriority), ',') as merged_map
        from merged
        group by o_orderstatus
    """,
)
def agg_map_union(spark, sf_dir):
    """#35/#122-family map_union: merge per-row maps across each group
    (every order contributes a one-entry map {priority: exact cents};
    the group's result is the union).  Presto's map_union leaves the
    winner of colliding keys engine-defined — unacceptable under the
    hash gate — so the policy is pinned to MAX-wins, the common
    "latest/largest observation" merge.

    Spark-first shape (and the 100-TB shape): maps never shuffle —
    entries are exploded to (group, key, value) ROWS, merged by a
    map-side-combinable max aggregation, and the map is rebuilt only
    at the end (serialized sorted, since map cells are unhashable in
    the driver's canonicalizer).  A map-typed UDAF would carry whole
    maps through the shuffle and cannot partial-aggregate."""
    o = table(spark, sf_dir, "orders")
    per_row = o.select(
        "o_orderstatus",
        F.create_map(
            F.col("o_orderpriority"),
            F.round(F.col("o_totalprice") * 100).cast("bigint"),
        ).alias("m"),
    )
    entries = per_row.select(
        "o_orderstatus", F.explode("m").alias("key", "value")
    )
    merged = entries.groupBy("o_orderstatus", "key").agg(
        F.max("value").alias("value")
    )
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("key", "value")))
            ).alias("m")
        )
        .select(
            "o_orderstatus",
            # map_entries preserves the build order, which is already
            # sorted — serialize directly, no second sort
            F.array_join(
                F.transform(
                    F.map_entries("m"),
                    lambda e: F.concat(
                        e["key"], F.lit(":"), e["value"].cast("string")
                    ),
                ),
                ",",
            ).alias("merged_map"),
        )
    )


@query(
    "agg_set_agg",
    oracle="""
        select l_returnflag,
               array_to_string(array_agg(distinct l_linestatus
                                         order by l_linestatus), ',')
                   as statuses,
               cast(count(distinct l_linestatus) as bigint) as n_distinct
        from lineitem
        group by l_returnflag
    """,
)
def agg_set_agg(spark, sf_dir):
    """Presto set_agg(x) (= array_agg(DISTINCT x)): the distinct value
    set per group, emitted sorted so the result is partition-order-
    free.  collect_set's partial aggregation dedups map-side, so the
    shuffle carries per-mapper distinct sets, not the raw rows."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(
            F.sort_array(F.collect_set("l_linestatus")), ","
        ).alias("statuses"),
        F.size(F.collect_set("l_linestatus")).cast("bigint").alias(
            "n_distinct"
        ),
    )


@query(
    "agg_multimap_agg",
    oracle="""
        with g as (
            select o_orderstatus, o_orderpriority,
                   array_to_string(array_agg(o_orderkey order by o_orderkey),
                                   ',') as keys
            from orders
            where o_orderkey < 500
            group by o_orderstatus, o_orderpriority
        )
        select o_orderstatus,
               array_to_string(
                   array_agg(o_orderpriority || ':[' || keys || ']'
                             order by o_orderpriority), ';') as prio_orders
        from g
        group by o_orderstatus
    """,
)
def agg_multimap_agg(spark, sf_dir):
    """Presto multimap_agg(k, v): map from key to ALL values seen —
    the one-to-many companion of map_agg.  Spark-first shape: a
    two-level groupBy (key-level collect with a deterministic sort,
    then group-level assembly) — the per-key value lists build via
    map-side-combinable collect_list rather than merging whole maps
    through the shuffle.  Serialized sorted (map/array cells are
    unhashable in the driver's canonicalizer).  The group-level sort
    collects (key, payload) STRUCTS and orders on the key field alone
    — sorting the concatenated 'key:[...]' strings would diverge from
    the oracle's ORDER BY key whenever one key is a prefix of another
    (e.g. 'A' vs 'A1': ':' > '1' lexicographically)."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    per_key = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.array_join(
            F.sort_array(F.collect_list("o_orderkey")), ","
        ).alias("keys")
    )
    return per_key.groupBy("o_orderstatus").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("o_orderpriority").alias("k"),
                            F.concat(
                                F.col("o_orderpriority"),
                                F.lit(":["),
                                F.col("keys"),
                                F.lit("]"),
                            ).alias("s"),
                        )
                    )
                ),
                lambda e: e["s"],
            ),
            ";",
        ).alias("prio_orders")
    )


@query(
    "agg_linear_regression",
    oracle="""
        select l_returnflag,
               cast(regr_count(l_extendedprice, l_quantity) as bigint) as n,
               round(regr_slope(l_extendedprice, l_quantity), 6) as slope,
               round(regr_intercept(l_extendedprice, l_quantity), 6)
                   as intercept
        from lineitem
        group by l_returnflag
    """,
)
def agg_linear_regression(spark, sf_dir):
    """Presto/ANSI regr_slope / regr_intercept / regr_count: one-pass
    linear-regression moments per group (the same merge-formula moment
    accumulation as corr/covar in agg_bivariate, which is proven
    hash-exact across engines on this suite).

    Scale: map-side-combinable moment accumulation — sum/count shuffle
    profile, no second pass."""
    li = table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.regr_count(y, x).cast("bigint").alias("n"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
    )


# engine-portable 60-bit row hash for checksum(): integer-exact fields
# only (orderkey, linenumber, price CENTS) — double-to-string printing
# is the one cross-engine formatting trap this avoids.
_H_CK_S = (
    "cast(conv(substr(md5(concat_ws('|', cast(l_orderkey as string), "
    "cast(l_linenumber as string), "
    "cast(cast(round(l_extendedprice * 100) as bigint) as string))), "
    "1, 15), 16, 10) as bigint)"
)
_H_CK_D = (
    "(('0x' || substr(md5(l_orderkey::varchar || '|' || "
    "l_linenumber::varchar || '|' || "
    "cast(round(l_extendedprice * 100) as bigint)::varchar), 1, 15))::bigint)"
)


@query(
    "agg_geometric_mean",
    oracle="""
        select o_orderpriority,
               count(*) as n,
               round(exp(sum(cast(round(ln(o_totalprice) * 1e9) as bigint))
                         / (count(*) * 1e9)), 6) as geo_mean_price
        from orders
        where o_totalprice > 0
        group by o_orderpriority
    """,
)
def agg_geometric_mean(spark, sf_dir):
    """Presto geometric_mean(x), composed as exp(avg(ln(x))) — Spark
    has no native geometric mean, and a naive avg of doubles would be
    partition-order-sensitive.  Per-row ln contributions round to
    integer NANO-units and sum as bigint (the exact-cents policy, as
    in llm_word_entropy), so the mean is order-free and the final
    exp/round is one IEEE-deterministic scalar step per group.

    Scale: a plain map-side-combinable hash aggregation — identical
    shuffle profile to sum/avg."""
    o = table(spark, sf_dir, "orders")
    nano_ln = F.round(F.log(F.col("o_totalprice")) * 1e9).cast("bigint")
    return (
        o.where(F.col("o_totalprice") > 0)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.exp(F.sum(nano_ln) / (F.count("*") * F.lit(1e9))), 6
            ).alias("geo_mean_price"),
        )
    )


@query(
    "agg_checksum",
    oracle=f"""
        select l_returnflag,
               count(*) as n,
               bit_xor({_H_CK_D}) as row_checksum
        from lineitem
        group by l_returnflag
    """,
)
def agg_checksum(spark, sf_dir):
    """Presto checksum(x): an order-insensitive group checksum for
    result-set comparison.  Composed as bit_xor over the engine-
    portable 60-bit md5 row hash (XOR is commutative/associative, so
    any partitioning or AQE re-plan yields the same value — exactly
    the property Presto's checksum guarantees).

    Scale: map-side-combinable bit_xor aggregation; the shuffle
    carries one 8-byte accumulator per group per mapper.  Banded
    spread (round-7 review, llm._maybe_parallel): a fixture-small
    scan arrives in 1-3 splits and the md5 work serializes on 3 of 32
    cores (measured 2.4s -> sub-1s with the spread); above the byte
    band a 100-TB scan is already thousands of splits, where the
    repartition would both shuffle the whole projection AND collapse
    parallelism down to core count — so it must not run there."""
    from sparketl.operators.llm import _maybe_parallel

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    li = _maybe_parallel(li, sf_dir, "lineitem", lo=0)
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.bit_xor(F.expr(_H_CK_S)).alias("row_checksum"),
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
        select coalesce(l_returnflag, 'ALL') as rflag,
               coalesce(l_linestatus, 'ALL') as lstatus,
               round({exact_sum_sql('l_quantity', 2)}, 6) as sum_qty,
               count(*)                      as n
        from lineitem
        group by grouping sets ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """#36 GROUPING SETS in one pass (SQL entry point; fixtures are
    NULL-free so coalesce markers are unambiguous)."""
    table(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        select coalesce(l_returnflag, 'ALL') as rflag,
               coalesce(l_linestatus, 'ALL') as lstatus,
               round({exact_sum_sql('l_quantity', 2)}, 6) as sum_qty,
               count(*)                      as n
        from lineitem
        group by grouping sets ((l_returnflag, l_linestatus), (l_returnflag), ())
    """)


@query(
    "agg_cube_rollup",
    oracle="""
        select coalesce(l_returnflag, 'ALL') as rflag,
               coalesce(l_linestatus, 'ALL') as lstatus,
               grouping(l_returnflag) + 2 * grouping(l_linestatus) as gid,
               count(*) as n
        from lineitem
        group by cube (l_returnflag, l_linestatus)
    """,
)
def agg_cube_rollup(spark, sf_dir):
    """#37 CUBE + grouping() markers (rollup is the sets-subset case,
    exercised by agg_grouping_sets)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            (
                F.grouping("l_returnflag") + F.lit(2) * F.grouping("l_linestatus")
            ).cast("int").alias("gid"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            "gid",
            "n",
        )
    )


@query(
    "agg_having",
    oracle=f"""
        select o_custkey, count(*) as n_orders,
               round({exact_sum_sql('o_totalprice', 2)}, 6) as spend
        from orders
        group by o_custkey
        having count(*) >= 15
    """,
)
def agg_having(spark, sf_dir):
    """#38 HAVING — post-aggregation filter."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(exact_sum("o_totalprice", 2), 6).alias("spend"),
        )
        .where(F.col("n_orders") >= 15)
    )


@query(
    "agg_count_if",
    oracle=f"""
        select l_returnflag,
               cast(count_if(l_discount > 0.05) as bigint) as n_discounted,
               cast(count_if(l_quantity >= 45) as bigint)  as n_huge,
               round({exact_sum_sql("case when l_linestatus = 'F' then l_extendedprice else 0 end", 2)}, 6) as sum_f
        from lineitem
        group by l_returnflag
    """,
)
def agg_count_if(spark, sf_dir):
    """#39 count_if + sum(case when) conditional idioms."""
    li = table(spark, sf_dir, "lineitem")
    cond_price = F.when(F.col("l_linestatus") == "F", F.col("l_extendedprice")).otherwise(0.0)
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.count_if(F.col("l_quantity") >= 45).alias("n_huge"),
        F.round(exact_sum(cond_price, 2), 6).alias("sum_f"),
    )


# --------------------------------------------------------------------------
# §2.5 approximate aggregations — engine sketches differ by design, so
# the declared queries compare each engine's OWN sketch to its OWN exact
# value and emit the tolerance boolean (SURVEY.md §2.5).
# --------------------------------------------------------------------------

@query(
    "approx_count_distinct",
    oracle="""
        select count(distinct l_partkey) as exact_nd,
               abs(approx_count_distinct(l_partkey) - count(distinct l_partkey))
                   <= 0.05 * count(distinct l_partkey) as hll_within_5pct
        from lineitem
    """,
)
def approx_count_distinct(spark, sf_dir):
    """#40 approx_distinct (HLL): Spark's HLL++ vs Presto's HLL vs
    DuckDB's HLL all give different estimates; the graded value is the
    exact count plus the ±5% accuracy contract (true on both engines)."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("exact_nd"),
        (
            F.abs(F.approx_count_distinct("l_partkey") - F.countDistinct("l_partkey"))
            <= 0.05 * F.countDistinct("l_partkey")
        ).alias("hll_within_5pct"),
    )


@query(
    "approx_top_k_sketch",
    oracle="""
        with exact as (
            select event_type, count(*) as n from events group by 1
        ),
        top as (
            select event_type, n,
                   row_number() over (order by n desc, event_type asc) as rnk
            from exact
            qualify rnk <= 3
        )
        select event_type, cast(n as bigint) as n, rnk,
               true as in_sketch
        from top
    """,
)
def approx_top_k_sketch(spark, sf_dir):
    """Presto approx family: frequent-items / approx_top_k sketch
    (Spark 4 built-in, Filtered Space-Saving).  Same tolerance-boolean
    scheme as #40/#41: the Spark side checks its OWN sketch against
    its OWN exact top-k (count desc, value asc) and emits the
    membership boolean; the oracle states the accuracy contract
    directly (``true`` — the true top-3 must appear in the sketch;
    DuckDB 1.0.0 has no approx_top_k to replay, so unlike #40 the
    oracle's boolean is the contract rather than a second sketch).
    event_type has 5 distinct values with distinct counts at every SF,
    so k=3 has no tie at the boundary and the Spark boolean is
    deterministically true.

    Scale: the sketch aggregate is map-side combinable (mergeable FSS
    summaries, like HLL) — one narrow pass + tiny merges; the exact
    side is a 5-group count.  At 100 TB the sketch path is the one
    that survives: top-k over high-cardinality keys without a global
    sort or full groupBy materialization.
    """
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    # bounded global window: 5 groups total (known-benign
    # "No Partition Defined" warning, same as win_ntile)
    w = Window.orderBy(F.col("n").desc(), F.col("event_type").asc())
    top = exact.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= 3)
    sk = ev.agg(
        F.expr("transform(approx_top_k(event_type, 3, 10000), e -> e.item)").alias(
            "items"
        )
    )
    return top.crossJoin(F.broadcast(sk)).select(
        "rnk",
        "event_type",
        "n",
        F.array_contains("items", F.col("event_type")).alias("in_sketch"),
    )


@query(
    "approx_percentile",
    oracle="""
        select round(quantile_cont(o_totalprice, 0.5), 6) as exact_p50,
               abs(approx_quantile(o_totalprice, 0.5) - quantile_cont(o_totalprice, 0.5))
                   <= 0.02 * quantile_cont(o_totalprice, 0.5) as approx_within_2pct
        from orders
    """,
)
def approx_percentile(spark, sf_dir):
    """#41 approx_percentile vs exact, tolerance boolean (same scheme
    as #40)."""
    o = table(spark, sf_dir, "orders")
    exact = F.expr("percentile(o_totalprice, 0.5)")
    return o.agg(
        F.round(exact, 6).alias("exact_p50"),
        (
            F.abs(F.percentile_approx("o_totalprice", 0.5, 10000) - exact)
            <= 0.02 * exact
        ).alias("approx_within_2pct"),
    )


# ---------------------------------------------------------------------------
# Mergeable percentile sketch (round 11, VERDICT r10 #8): the qdigest
# SHAPE — build bounded per-segment summaries once, merge them for any
# rollup, read quantiles off the merged state — as a DDSketch-style
# log-bucket histogram in pure Spark SQL types:
#   sketch  = map<bigint, bigint>: floor(ln(v)/ln(gamma)) -> row count
#   merge   = key-wise count sum (map_zip_with; a commutative monoid —
#             associativity property-tested in tests/test_pctl_sketch.py)
#   readout = rank scan over the sorted buckets; estimate
#             gamma^b * (1+gamma)/2, relative error <= (gamma-1)/2
# gamma = 1.02 → <= 1% relative error and <= ~460 buckets per sketch
# for a 1e2..1e6 value range (state bounded by ACCURACY, not data —
# the qdigest promise).  Positive values only, like DDSketch.
# ---------------------------------------------------------------------------

PCTL_GAMMA = 1.02


def pctl_sketch_merge_expr(maps_col: str) -> str:
    """Merge expression over a collected array of sketches."""
    return (
        f"aggregate(collect_list({maps_col}), "
        "cast(map() as map<bigint,bigint>), "
        "(__pm_a, __pm_m) -> map_zip_with(__pm_a, __pm_m, "
        "(__pm_k, __pm_x, __pm_y) -> "
        "coalesce(__pm_x, 0L) + coalesce(__pm_y, 0L)))"
    )


def pctl_quantile_expr(sk_col: str, q: float) -> str:
    """Quantile readout from a sketch: fold the rank down the sorted
    buckets (state = (remaining rank, found bucket)), then the bucket
    midpoint in value space."""
    g = PCTL_GAMMA
    return (
        f"power(cast({g} as double), (aggregate("
        f"array_sort(map_entries({sk_col})), "
        f"named_struct('rem', greatest(cast(ceil({q} * "
        f"aggregate(map_values({sk_col}), 0L, (__pq_s, __pq_x) -> "
        "__pq_s + __pq_x)) as bigint), 1L), "
        "'fb', cast(null as bigint)), "
        "(__pq_s, __pq_e) -> case "
        "when __pq_s.fb is not null then __pq_s "
        "when __pq_e.value >= __pq_s.rem then "
        "named_struct('rem', 0L, 'fb', __pq_e.key) "
        "else named_struct('rem', __pq_s.rem - __pq_e.value, "
        "'fb', cast(null as bigint)) end, "
        f"__pq_s -> __pq_s.fb))) * (1.0 + cast({g} as double)) / 2.0"
    )


@query(
    "approx_pctl_sketch_merge",
    oracle="""
        with seg as (
            select l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.5), 6)
                       as seg_p50_exact
            from lineitem group by l_returnflag
        ),
        g as (
            select round(quantile_cont(l_extendedprice, 0.5), 6)  as p50_exact,
                   round(quantile_cont(l_extendedprice, 0.9), 6)  as p90_exact,
                   round(quantile_cont(l_extendedprice, 0.99), 6) as p99_exact
            from lineitem
        )
        select seg.l_returnflag,
               seg.seg_p50_exact,
               g.p50_exact, g.p90_exact, g.p99_exact,
               true as seg_p50_within,
               true as p50_within, true as p90_within, true as p99_within
        from seg cross join g
        order by seg.l_returnflag
    """,
)
def approx_pctl_sketch_merge(spark, sf_dir):
    """#41/#43 depth — the MERGEABLE percentile sketch (Presto's
    qdigest workflow: ``qdigest_agg`` per segment, ``merge()`` for the
    rollup, ``value_at_quantile`` off the merged digest), as the
    log-bucket histogram defined above.  Per-returnflag sketches are
    built once; the global quantiles are read off the MERGED sketch —
    never a rescan.  Tolerance-boolean grading (the #40 HLL pattern):
    Spark checks its estimates against its own exact percentiles
    (±2.5%, vs the sketch's 1% error bound — headroom for the
    rank-vs-interpolation convention gap); the oracle states the
    accuracy contract plus the exact percentiles both engines must
    agree on (quantile_cont ≡ Spark percentile, linear interpolation,
    the exact_percentile_median precedent).

    Scale: the 100-TB serving pattern — the (flag, bucket) count
    aggregate is map-side combinable; each sketch is <= ~460 entries
    REGARDLESS of row count (state bounded by accuracy); merge cost is
    sketch-sized.  Cross-segment or cross-day rollups recombine stored
    KB-sized maps instead of rescanning the fact table.
    tests/test_pctl_sketch.py property-tests merge associativity and
    the error bound on hypothesis-generated splits."""
    import math as _math

    li = table(spark, sf_dir, "lineitem")
    # ONE (flag, value) counting aggregate feeds EVERY derivation below
    # — the log-bucket histogram, the per-flag exact reference, and the
    # global exact references (via a re-aggregation to value level).
    # Optimization round 15 (guide §2.4): previously the histogram and
    # each distributed_percentiles call re-derived from the raw scan,
    # for 13 parquet scans / 24 exchanges in one plan; hanging all of
    # them off this single aggregate lets AQE's exchange reuse compute
    # the scan + partial agg + shuffle once (ReusedExchange in the
    # final plan) — 13 scans -> 1 executed scan, measured 2.3-2.4 s ->
    # ~1 s sequential at sf0.1 (plans/r15/approx_pctl_sketch_merge_*).
    # NULL prices carry no percentile mass and no finite log-bucket, so
    # filtering them here leaves every derived result unchanged.  The
    # l_returnflag IS NOT NULL arm additionally assumes the fixture /
    # TPC-H contract that the flag column is non-null (ADVICE r15): on
    # a NULL-flag corpus this drops that group from hist/seg entirely,
    # where the pre-r15 code surfaced it (and would then have crashed
    # map_from_entries on the NULL bucket key — neither behavior is
    # graded; noted so a corpus change cannot silently flip semantics).
    cnt = (
        li.where(
            F.col("l_extendedprice").isNotNull()
            & F.col("l_returnflag").isNotNull()
        )
        .groupBy("l_returnflag", "l_extendedprice")
        .agg(F.count("*").alias("cnt"))
    )
    bucket = F.floor(
        F.log(F.col("l_extendedprice")) / _math.log(PCTL_GAMMA)
    ).cast("long")
    hist = cnt.groupBy("l_returnflag", bucket.alias("b")).agg(
        F.sum("cnt").alias("c")
    )
    seg_sk = hist.groupBy("l_returnflag").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("b", "c")))
        ).alias("sk")
    )
    # exact references via the DISTRIBUTED order-statistics plan
    # (percentiles_from_counts — the exact_percentile_median core):
    # Spark's builtin `percentile` merges every partial value map into
    # ONE buffer per group, which went superlinear on the scale
    # corpora; the x10 gate for THIS query measured the difference
    # directly (46.7s with the builtin references → 6.5s distributed)
    # Per-flag value bounds, computed ONCE and shared by both
    # percentile derivations (optimization round 16): passing them
    # explicitly lets Catalyst collapse this agg-over-agg into a direct
    # map-side min/max scan (RemoveRedundantAggregates), and the global
    # bounds then fold over the SAME 3-row frame instead of executing
    # the "count-pruned distinct variant" — a full (flag, value)
    # DISTINCT shuffle — that the r15 plan still carried (4 executed
    # scans -> 3; plans/r16/approx_pctl_sketch_merge_{before,after}).
    seg_bounds = cnt.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("vmin"),
        F.max("l_extendedprice").alias("vmax"),
    )
    seg_exact = percentiles_from_counts(
        cnt,
        "l_returnflag",
        "l_extendedprice",
        [("seg_p50_raw", 0.5)],
        bounds=seg_bounds,
    ).select(
        "l_returnflag", F.round("seg_p50_raw", 6).alias("seg_p50_exact")
    )
    seg = (
        seg_sk.join(seg_exact, "l_returnflag")
        .select(
            "l_returnflag",
            "seg_p50_exact",
            F.expr(pctl_quantile_expr("sk", 0.5)).alias("seg_p50_est"),
            "sk",
        )
    )
    # Fold the merged sketch over seg_sk DIRECTLY, not over the
    # seg_sk ⋈ seg_exact frame (optimization round 16): the join keeps
    # exactly the flags of seg_sk anyway (both sides derive from the
    # same cnt rows, so their flag sets are equal), but folding over
    # the join forced the planner to re-execute a column-pruned copy
    # of seg_exact — count pruned from the cnt aggregate — as a full
    # (flag, value) DISTINCT shuffle just to align flags.  Same merged
    # sketch bit-for-bit (map_zip_with-sum is order-insensitive and the
    # readout sorts entries); one 594k-row exchange gone at sf0.1.
    merged = seg_sk.agg(
        F.expr(pctl_sketch_merge_expr("sk")).alias("msk")
    ).select(
        F.expr(pctl_quantile_expr("msk", 0.5)).alias("p50_est"),
        F.expr(pctl_quantile_expr("msk", 0.9)).alias("p90_est"),
        F.expr(pctl_quantile_expr("msk", 0.99)).alias("p99_est"),
    )
    # global references: the SAME cnt rows under a constant group key —
    # no second corpus pass and no extra aggregation level (the rank
    # machinery is correct with a value duplicated across rows: the
    # per-row rank intervals of equal values are contiguous, so the
    # covering row of any rank position carries the same value)
    g_bounds = seg_bounds.groupBy(F.lit(1).alias("__g")).agg(
        F.min("vmin").alias("vmin"), F.max("vmax").alias("vmax")
    )
    g_exact = percentiles_from_counts(
        cnt.withColumn("__g", F.lit(1)),
        "__g",
        "l_extendedprice",
        [("p50_raw", 0.5), ("p90_raw", 0.9), ("p99_raw", 0.99)],
        bounds=g_bounds,
    ).select(
        F.round("p50_raw", 6).alias("p50_exact"),
        F.round("p90_raw", 6).alias("p90_exact"),
        F.round("p99_raw", 6).alias("p99_exact"),
    )

    def within(est, exact):
        return (F.abs(F.col(est) - F.col(exact)) <= 0.025 * F.col(exact))

    return (
        seg.drop("sk")
        .crossJoin(F.broadcast(merged))
        .crossJoin(F.broadcast(g_exact))
        .select(
            "l_returnflag",
            "seg_p50_exact",
            "p50_exact", "p90_exact", "p99_exact",
            within("seg_p50_est", "seg_p50_exact").alias("seg_p50_within"),
            within("p50_est", "p50_exact").alias("p50_within"),
            within("p90_est", "p90_exact").alias("p90_within"),
            within("p99_est", "p99_exact").alias("p99_within"),
        )
    )


@query(
    "exact_percentile_median",
    oracle="""
        select o_orderstatus,
               round(quantile_cont(o_totalprice, 0.25), 6) as p25,
               round(quantile_cont(o_totalprice, 0.90), 6) as p90,
               round(median(o_totalprice), 6)              as med
        from orders
        group by o_orderstatus
    """,
)
def exact_percentile_median(spark, sf_dir):
    """#42 exact percentile_cont / median (linear interpolation — same
    formula in Spark and DuckDB) — as DISTRIBUTED order statistics,
    not Spark's ``percentile`` aggregate.

    Why not the builtin: Spark's exact percentile accumulates a
    value->count map per group and merges every partial map into ONE
    final buffer per group — with 3 groups, parallelism collapses to
    3 tasks that each merge and sort ~n/3 entries.  Measured on the
    scale corpora the wall went superlinear (x10 2.46 s -> x100
    24.4 s for 10x data, ratio 12 — the only superlinear entry in the
    round-8 relational lane).

    The scalable plan computes the same order statistics from a
    counting scan:

    1. ``groupBy(status, value).count()`` — map-side combinable, the
       shuffle carries one row per DISTINCT (group, value);
    2. cumulative count over each group ordered by value: every
       distinct value covers the rank interval [c - cnt + 1, c];
    3. percentile_cont rank positions pos = 1 + (n-1) * p; the row
       covering floor(pos) / ceil(pos) yields the two order
       statistics, interpolated with the standard formula — the same
       algebra ``percentile``/``quantile_cont`` evaluate, on the same
       doubles, so round(6) matches the oracle exactly.

    The cumulative count itself is TWO-PHASE so it never serializes on
    the group count: distinct values are range-bucketed
    (``width_bucket`` over the group's min..max, B=512), per-bucket
    subtotals (groups x B rows, metadata-sized) produce broadcast
    bucket offsets, and the within-bucket running sums then run over
    groups x B independent window partitions — the textbook
    distributed prefix-sum.  A single per-group window would sort each
    group in ONE task (measured: 14.2 s at x100, 3 cores busy);
    bucketed: **7.4 s at x100 and the x10 -> x100 ratio 12 -> 2.9**
    (scripts/scale_stress.py --rel --x100; x10 stays at 2.2 s).  With millions of groups
    the builtin's per-group buffers are small and fine — this shape is
    for the few-groups/huge-groups regime, the one the fixture
    (3 statuses) and any global-percentile report is in."""
    o = table(spark, sf_dir, "orders")
    return distributed_percentiles(
        o, "o_orderstatus", "o_totalprice",
        [("p25", 0.25), ("p90", 0.90), ("med", 0.5)],
    )


def distributed_percentiles(df, group_col, val_col, ps, buckets: int = 512):
    """Reusable core of exact_percentile_median: exact
    percentile_cont over ``df`` grouped by ``group_col``, computed as
    distributed order statistics (see the declared query's docstring
    for the plan and its measured x100 numbers).  ``ps`` is a list of
    (alias, fraction).  NULL values are ignored per percentile
    semantics; a group whose values are all NULL still surfaces with
    NULL percentiles (group-key restore join — round-8 review).
    Differential-tested against Spark's builtin ``percentile`` incl.
    the all-NULL-group case in tests/test_distributed_percentile.py."""
    cnt = (
        df.where(F.col(val_col).isNotNull())
        .groupBy(group_col, val_col)
        .agg(F.count("*").alias("cnt"))
    )
    # group-key restore (groups-count-sized, broadcastable): a group
    # whose every value is NULL has no counted rows, but must surface
    # with NULL percentiles like the builtin would emit it
    keys = df.select(group_col).distinct()
    return percentiles_from_counts(
        cnt, group_col, val_col, ps, buckets=buckets, keys=keys
    )


def percentiles_from_counts(
    cnt, group_col, val_col, ps, buckets: int = 512, keys=None, bounds=None
):
    """Exact percentile_cont from a pre-aggregated (group, value,
    ``cnt``) frame — the distributed_percentiles machinery with the
    per-(group, value) counting aggregate supplied by the caller.

    Optimization-round-15 split (guide §2.4 — remove passes): every
    derived statistic (bucket bounds, bucket subtotals, the final
    rank-select) now hangs off the ONE ``cnt`` aggregate, so Spark's
    exchange reuse (AQE ShuffleQueryStage dedup) computes the
    scan + partial-agg + shuffle once and re-reads it per consumer —
    `bounds` in particular no longer pays its own full pass over the
    raw table (min/max over the distinct values are the same numbers).
    A caller that already needs the (group, value) counts for other
    derivations (approx_pctl_sketch_merge's log-bucket histogram)
    shares the same shuffle for everything.  ``keys`` optionally
    supplies the group-key universe for the all-NULL-group restore;
    when None, the groups present in ``cnt`` are used (exactly the
    groups with >= 1 non-NULL value — callers that inner-join the
    result downstream lose nothing).  ``bounds`` optionally supplies a
    precomputed per-group (``vmin``, ``vmax``) frame; callers whose
    ``cnt`` carries a synthetic constant group key pass it because
    Catalyst's RemoveRedundantAggregates cannot see through the
    added-literal projection — left to itself the internal bounds
    aggregate then executes a full DISTINCT shuffle of the (group,
    value) rows (optimization round 16; the r15 plan's "count-pruned
    distinct variant" 4th scan).
    """
    from pyspark.sql import Window

    if bounds is None:
        bounds = cnt.groupBy(group_col).agg(
            F.min(val_col).alias("vmin"), F.max(val_col).alias("vmax")
        )
    # bucket is monotone in value (top edge clamped into the last
    # bucket), so ordering by (bucket, value) == ordering by value
    cntb = (
        cnt.join(F.broadcast(bounds), group_col)
        .withColumn(
            "b",
            F.least(
                F.lit(buckets).cast("bigint"),
                F.width_bucket(
                    val_col,
                    F.col("vmin"),
                    F.when(F.col("vmax") > F.col("vmin"), F.col("vmax"))
                    .otherwise(F.col("vmin") + 1),
                    F.lit(buckets),
                ),
            ),
        )
        .drop("vmin", "vmax")
    )
    bt = cntb.groupBy(group_col, "b").agg(F.sum("cnt").alias("bc"))
    wb = (
        Window.partitionBy(group_col)
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = bt.select(
        group_col,
        "b",
        (F.sum("bc").over(wb) - F.col("bc")).alias("off"),
        F.sum("bc").over(Window.partitionBy(group_col)).alias("n"),
    )
    wv = (
        Window.partitionBy(group_col, "b")
        .orderBy(val_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = cntb.join(F.broadcast(offsets), [group_col, "b"]).select(
        group_col,
        val_col,
        (F.col("off") + F.sum("cnt").over(wv)).alias("c"),
        (F.col("off") + F.sum("cnt").over(wv) - F.col("cnt")).alias("prev"),
        "n",
    )
    aggs = []
    for name, p in ps:
        pos = F.lit(1.0) + (F.col("n") - 1).cast("double") * F.lit(p)
        lo, hi = F.floor(pos), F.ceil(pos)
        # the row covering rank k satisfies prev < k <= c; min() picks
        # the (unique) covering value per bound
        vlo = F.min(
            F.when((F.col("prev") < lo) & (lo <= F.col("c")), F.col(val_col))
        )
        vhi = F.min(
            F.when((F.col("prev") < hi) & (hi <= F.col("c")), F.col(val_col))
        )
        frac = F.min(pos - F.floor(pos))
        aggs.append(F.round(vlo + frac * (vhi - vlo), 6).alias(name))
    pct = ranked.groupBy(group_col).agg(*aggs)
    if keys is None:
        return pct
    # group-key restore (groups-count-sized, broadcastable): a group
    # whose every value is NULL has no ranked rows, but must surface
    # with NULL percentiles like the builtin would emit it
    return keys.join(pct, group_col, "left")


@query(
    "numeric_histogram",
    oracle="""
        select least(greatest(cast(floor((o_totalprice - 0) / (500000.0 / 20)) as bigint) + 1, 0), 21)
                   as bucket,
               count(*) as n,
               round(min(o_totalprice), 6) as lo,
               round(max(o_totalprice), 6) as hi
        from orders
        group by 1
    """,
)
def numeric_histogram(spark, sf_dir):
    """#43 numeric_histogram via width_bucket + group-by (DuckDB 1.0
    lacks width_bucket → arithmetic formula, same bucketing, verified
    SURVEY.md §0.1)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(500000.0), F.lit(20))
            .cast("bigint")
            .alias("bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 6).alias("lo"),
            F.round(F.max("o_totalprice"), 6).alias("hi"),
        )
    )


@query(
    "approx_hll_sketch_merge",
    oracle="""
        with per_seg as (
            select l_returnflag,
                   count(distinct l_partkey) as seg_exact
            from lineitem group by l_returnflag
        ),
        merged as (
            select count(distinct l_partkey) as union_exact from lineitem
        )
        select p.l_returnflag,
               p.seg_exact,
               m.union_exact,
               true as seg_within_5pct,
               true as union_within_5pct
        from per_seg p cross join merged m
        order by p.l_returnflag
    """,
)
def approx_hll_sketch_merge(spark, sf_dir):
    """#40 depth — MERGEABLE HLL sketches (Presto's signature approx
    workflow: build per-segment sketches once, union them for any
    rollup without rescanning): per-returnflag Datasketches HLL via
    hll_sketch_agg, then hll_union_agg merges the three segment
    sketches into the global distinct estimate.  Tolerance-boolean
    grading like #40/#41: Spark checks its own estimates against its
    own exact counts (±5%); the oracle states the accuracy contract
    plus the exact counts both engines must agree on.

    Scale: THE pattern for 100-TB rollup serving — per-partition/
    per-day sketch build is map-side combinable and the stored sketch
    is KBs; any cross-segment union is sketch-merge, never a rescan of
    the fact table.

    Single-scan plan (round-7 fusion, was 3 scans of lineitem): one
    ``rollup(l_returnflag)`` produces both the per-segment rows and
    the grand-total row — sketch AND exact distinct — in one
    aggregation; the grouping-set grand total IS the "merged" exact.
    The sketch-MERGE demonstration (hll_union_agg of the per-segment
    sketches) then runs over the 3 post-rollup rows, and Catalyst's
    ReuseExchange dedupes the rollup exchange across the seg/tot/
    merged branches, so the fact scan + partial aggregation execute
    once.  grouping() (not NULL-ness of the key) splits segment rows
    from the total row, so a NULL group value in data could never be
    mistaken for the rollup total.
    """
    li = table(spark, sf_dir, "lineitem")
    # pre-distinct the (flag, partkey) pairs: HLL registers are
    # max-based so duplicates never change a sketch, and countDistinct
    # inside a rollup plants an Expand — running it over the ~10x
    # smaller distinct-pair frame instead of raw rows cut the bench
    # min 2.2 s -> ~1 s (round 7).  One extra narrow shuffle, map-side
    # combined.
    pairs = li.select("l_returnflag", "l_partkey").distinct()
    rolled = pairs.rollup("l_returnflag").agg(
        F.expr("hll_sketch_agg(l_partkey)").alias("sk"),
        F.countDistinct("l_partkey").alias("exact"),
        F.grouping("l_returnflag").alias("is_total"),
    )
    seg = rolled.where(F.col("is_total") == 0).select(
        "l_returnflag",
        F.col("exact").alias("seg_exact"),
        F.expr("hll_sketch_estimate(sk)").alias("seg_est"),
        F.col("sk"),
    )
    merged = seg.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("union_est")
    )
    union_exact = rolled.where(F.col("is_total") == 1).select(
        F.col("exact").alias("union_exact")
    )
    return (
        seg.drop("sk")
        .crossJoin(F.broadcast(merged))
        .crossJoin(F.broadcast(union_exact))
        .select(
            "l_returnflag",
            "seg_exact",
            "union_exact",
            (
                F.abs(F.col("seg_est") - F.col("seg_exact"))
                <= 0.05 * F.col("seg_exact")
            ).alias("seg_within_5pct"),
            (
                F.abs(F.col("union_est") - F.col("union_exact"))
                <= 0.05 * F.col("union_exact")
            ).alias("union_within_5pct"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_listagg",
    oracle="""
        select o_orderstatus,
               string_agg(distinct o_orderpriority, '|' order by o_orderpriority)
                   as priorities,
               string_agg(cast(o_orderkey as varchar), ',' order by o_orderkey)
                   as keys_csv,
               count(*) as n
        from orders
        where o_orderkey < 200
        group by o_orderstatus
    """,
)
def agg_listagg(spark, sf_dir):
    """SQL:2016 LISTAGG (Presto/Trino ``listagg(x, sep) WITHIN GROUP
    (ORDER BY ...)``), native in Spark 4 — both the DISTINCT form and
    the plain ordered form, oracle'd by DuckDB's ``string_agg`` with
    an ORDER BY modifier.  The in-aggregate ORDER BY makes the result
    deterministic without a post-sort (§5 determinism rules; the same
    property the sorted collect_list idiom provides elsewhere).

    Scale: ordered string aggregation cannot partially combine across
    arbitrary splits without a final per-group merge sort — Spark
    plans it as a sort-based aggregate per group key; group payloads
    here are bounded (the declared query caps keys), and unbounded
    payloads belong in array form (agg_array_agg) rather than a
    megabyte string cell."""
    o = table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 200)
    return o.groupBy("o_orderstatus").agg(
        F.expr(
            "listagg(distinct o_orderpriority, '|') "
            "within group (order by o_orderpriority)"
        ).alias("priorities"),
        F.expr(
            "listagg(cast(o_orderkey as string), ',') "
            "within group (order by o_orderkey)"
        ).alias("keys_csv"),
        F.count("*").alias("n"),
    )


@query(
    "agg_array_agg_mixed_order",
    oracle="""
        select l_returnflag,
               array_to_string(array_agg(
                   cast(l_orderkey * 10 + l_linenumber as varchar)
                   order by nullif(l_linestatus, 'F') asc nulls first,
                            l_quantity desc nulls first,
                            l_orderkey * 10 + l_linenumber asc nulls last),
                   ',') as ids_mixed,
               count(*) as n
        from lineitem
        where l_orderkey < 800
        group by l_returnflag
    """,
)
def agg_array_agg_mixed_order(spark, sf_dir):
    """#34 depth (round 12, VERDICT r11 #3): ``array_agg(x ORDER BY k1
    ASC NULLS FIRST, k2 DESC, ...)`` — MIXED directions and an explicit
    non-default NULLS placement, the forms round 11 refused.  The
    dialect now builds an array_sort LAMBDA COMPARATOR (dialect.
    _ordering_comparator: a linear chain of per-key 5-branch CASEs
    with the requested — or Presto-default null-largest — placement
    baked per key).  NULL keys are synthesized with nullif on the line
    status; the key list ends with the unique row id (tie ⇒ equal value,
    the fixture-duplicate rule).  DuckDB grades with its native
    within-aggregate ORDER BY, every direction and NULLS spelled
    explicitly; random combinations are property-differentialed in
    tests/test_property_dialect.py.

    Scale: same one-shuffle hash aggregate as every array_agg; the
    comparator sort is interpreted (CodegenFallback) per group —
    bounded group payloads (≤ 7 lineitems per order here); default
    orderings stay on the codegen'd flag-struct path."""
    from sparketl import dialect
    from sparketl.tables import load_tables

    load_tables(spark, sf_dir)
    return dialect.sql(
        spark,
        """
        select l_returnflag,
               array_join(array_agg(
                   cast(l_orderkey * 10 + l_linenumber as string)
                   order by nullif(l_linestatus, 'F') nulls first,
                            l_quantity desc,
                            l_orderkey * 10 + l_linenumber),
                   ',') as ids_mixed,
               count(*) as n
        from lineitem
        where l_orderkey < 800
        group by l_returnflag
        """,
    )
