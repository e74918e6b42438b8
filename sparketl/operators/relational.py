"""Relational core: scans (§2.1 #1,5,6), projection/filter/predicates
(§2.2 #7-15), sorts/limits/sampling (§2.7 #53-56), set ops (§2.8 #57-60).

All pure DataFrame API (entry point E1) — Catalyst pushes the filters
and projections into the parquet scan (verified via
``.explain('formatted')``: PushedFilters / ReadSchema), so these same
plans prune IO at 100 TB with zero extra code.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparketl.functions.exact import exact_sum, exact_sum_sql
from sparketl.registry import query
from sparketl.tables import table


# --------------------------------------------------------------------------
# §2.1 scans
# --------------------------------------------------------------------------

@query(
    "scan_parquet_full",
    oracle="select r_regionkey, r_name from region",
)
def scan_parquet_full(spark, sf_dir):
    """#1 parquet scan with embedded schema."""
    return table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@query(
    "scan_projection_pruning",
    oracle="""
        select l_orderkey, l_linenumber,
               round(l_extendedprice, 6) as price
        from lineitem
        where l_orderkey < 200
    """,
)
def scan_projection_pruning(spark, sf_dir):
    """#5 column projection pushdown: ReadSchema carries 4 of 11 cols."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_orderkey") < 200)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 6).alias("price"),
        )
    )


@query(
    "scan_predicate_pushdown",
    oracle=f"""
        select cast(count(*) as bigint) as n,
               round({exact_sum_sql('o_totalprice', 2)}, 6) as total
        from orders
        where o_orderstatus = 'F' and o_totalprice > 100000
    """,
)
def scan_predicate_pushdown(spark, sf_dir):
    """#6 predicate pushdown: both preds land in PushedFilters."""
    o = table(spark, sf_dir, "orders")
    return (
        o.where((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000))
        .agg(
            F.count("*").alias("n"),
            F.round(exact_sum("o_totalprice", 2), 6).alias("total"),
        )
    )


# --------------------------------------------------------------------------
# §2.2 projection / filter / predicates
# --------------------------------------------------------------------------

@query(
    "proj_compute",
    oracle="""
        select l_orderkey, l_linenumber,
               round(l_extendedprice * (1 - l_discount), 6) as disc_price,
               round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) as charge,
               l_quantity > 25 as bulky
        from lineitem
        where l_orderkey < 500
    """,
)
def proj_compute(spark, sf_dir):
    """#7 SELECT expr AS alias (multiplication order mirrored in oracle
    so doubles are bit-identical)."""
    li = table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_orderkey") < 500).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("disc_price"),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6
        ).alias("charge"),
        (F.col("l_quantity") > 25).alias("bulky"),
    )


@query(
    "filter_where",
    oracle="""
        select o_orderkey, o_custkey
        from orders
        where o_orderstatus = 'O' and o_totalprice between 50000 and 100000
    """,
)
def filter_where(spark, sf_dir):
    """#8 WHERE with 3-valued logic."""
    o = table(spark, sf_dir, "orders")
    return o.where(
        (F.col("o_orderstatus") == "O")
        & F.col("o_totalprice").between(50000, 100000)
    ).select("o_orderkey", "o_custkey")


@query(
    "pred_comparison_boolean",
    oracle="""
        select p_partkey, p_size
        from part
        where (p_size >= 10 and p_size < 30 and p_type <> 'ECONOMY')
           or not (p_retailprice <= 1200.0)
    """,
)
def pred_comparison_boolean(spark, sf_dir):
    """#9 = <> < <= > >= AND OR NOT."""
    p = table(spark, sf_dir, "part")
    return p.where(
        (
            (F.col("p_size") >= 10)
            & (F.col("p_size") < 30)
            & (F.col("p_type") != "ECONOMY")
        )
        | ~(F.col("p_retailprice") <= 1200.0)
    ).select("p_partkey", "p_size")


@query(
    "pred_between_in_like",
    oracle="""
        select c_custkey, c_mktsegment, c_name
        from customer
        where c_mktsegment in ('BUILDING', 'MACHINERY')
          and c_custkey between 100 and 900
          and c_name like 'Customer#0000001%'
          and c_name like 'Customer#_______%'
    """,
)
def pred_between_in_like(spark, sf_dir):
    """#10 BETWEEN / IN / LIKE with % and _."""
    c = table(spark, sf_dir, "customer")
    return c.where(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
        & F.col("c_custkey").between(100, 900)
        & F.col("c_name").like("Customer#0000001%")
        & F.col("c_name").like("Customer#_______%")
    ).select("c_custkey", "c_mktsegment", "c_name")


@query(
    "pred_null_safe",
    oracle="""
        select s_suppkey,
               nullif(s_acctbal, 0) is null as bal_zero_or_null,
               (nullif(s_name, s_name) is not distinct from nullif(upper(s_name), upper(s_name))) as nullsafe_eq,
               coalesce(nullif(s_nationkey, 0), -1) as natkey_or_default
        from supplier
    """,
)
def pred_null_safe(spark, sf_dir):
    """#11 IS NULL / IS [NOT] DISTINCT FROM (<=>); NULLs manufactured
    via nullif since the fixtures are NULL-free.  The two NULLs come
    from distinct expression trees so the null-safe compare is not a
    self-compare (a same-expression <=> trips PySpark's trivially-true
    Column warning)."""
    s = table(spark, sf_dir, "supplier")
    nulled_a = F.nullif(F.col("s_name"), F.col("s_name"))
    nulled_b = F.nullif(F.upper("s_name"), F.upper("s_name"))
    return s.select(
        "s_suppkey",
        F.nullif(F.col("s_acctbal"), F.lit(0)).isNull().alias("bal_zero_or_null"),
        nulled_a.eqNullSafe(nulled_b).alias("nullsafe_eq"),
        F.coalesce(F.nullif(F.col("s_nationkey"), F.lit(0)), F.lit(-1)).alias(
            "natkey_or_default"
        ),
    )


@query(
    "cond_case_coalesce",
    oracle="""
        select o_orderkey,
               case when o_totalprice > 150000 then 'large'
                    when o_totalprice > 50000 then 'medium'
                    else 'small' end as bucket,
               if(o_orderstatus = 'O', 'open', 'settled') as state,
               coalesce(nullif(o_orderpriority, '5-LOW'), 'LOW') as prio
        from orders
        where o_orderkey < 1000
    """,
)
def cond_case_coalesce(spark, sf_dir):
    """#12 CASE WHEN / IF / COALESCE / NULLIF."""
    o = table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") < 1000).select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 150000, "large")
        .when(F.col("o_totalprice") > 50000, "medium")
        .otherwise("small")
        .alias("bucket"),
        F.when(F.col("o_orderstatus") == "O", "open")
        .otherwise("settled")
        .alias("state"),
        F.coalesce(F.nullif("o_orderpriority", F.lit("5-LOW")), F.lit("LOW")).alias(
            "prio"
        ),
    )


@query(
    "cast_try_cast",
    oracle="""
        select p_partkey,
               cast(p_size as bigint) as size_l,
               cast(p_size as varchar) as size_s,
               cast(trunc(p_retailprice) as integer) as price_i,
               try_cast(p_brand as integer) as brand_i,
               try_cast(substr(p_brand, 7) as integer) as brand_num
        from part
        where p_partkey < 500
    """,
)
def cast_try_cast(spark, sf_dir):
    """#13 ANSI CAST + TRY_CAST→NULL.  Divergence handled: Spark's
    double→int cast TRUNCATES toward zero while DuckDB's ROUNDS, so the
    oracle wraps the value in trunc() to pin the shared semantics."""
    p = table(spark, sf_dir, "part")
    return p.where(F.col("p_partkey") < 500).select(
        "p_partkey",
        F.col("p_size").cast("bigint").alias("size_l"),
        F.col("p_size").cast("string").alias("size_s"),
        F.col("p_retailprice").cast("int").alias("price_i"),
        F.expr("try_cast(p_brand as int)").alias("brand_i"),
        F.expr("try_cast(substr(p_brand, 7) as int)").alias("brand_num"),
    )


@query(
    "num_decimal_exact",
    oracle="""
        select l_returnflag,
               cast(sum(cast(l_extendedprice as decimal(12, 2))) as varchar)
                   as total_price,
               cast(sum(cast(l_extendedprice as decimal(12, 2))
                        * cast(1 - l_discount as decimal(4, 2)))
                    as varchar) as total_disc_price,
               cast(max(cast(l_extendedprice as decimal(12, 2))) as varchar)
                   as max_price
        from lineitem
        group by l_returnflag
    """,
)
def num_decimal_exact(spark, sf_dir):
    """Presto is DECIMAL-centric for money; this pins Spark's decimal
    arithmetic to it: cast to decimal(12,2), exact decimal sums and a
    scaled decimal product — no floating point anywhere, so the values
    are exact by TYPE rather than by the integer-cents policy used
    elsewhere.  Results serialize to strings because both engines
    print decimals canonically while the driver's float canonicalizer
    would re-interpret them.

    Scale: decimal sums partial-aggregate exactly like longs (Spark
    carries them as unscaled 128-bit values); the map-side combine and
    shuffle profile is identical to sum(bigint)."""
    li = table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(4,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price).cast("string").alias("total_price"),
        F.sum(price * disc).cast("string").alias("total_disc_price"),
        F.max(price).cast("string").alias("max_price"),
    )


@query(
    "struct_row_access",
    oracle="""
        select o_orderkey,
               o_orderpriority as prio,
               cast(cast(o_totalprice as decimal(12, 2)) as varchar)
                   as price,
               year(o_orderdate) as order_year
        from orders
        where o_orderkey < 400
    """,
)
def struct_row_access(spark, sf_dir):
    """Presto ROW type surface: construct a named row, pass it through
    a projection, and read fields back out — the shape nested-schema
    ETL uses constantly.  The oracle flattens directly (field access on
    a constructed row must be the identity), and the decimal-typed
    field doubles as a nested-decimal check.

    Scale: struct construction/field access is a zero-cost projection
    in Tungsten rows — no serialization, no shuffle implication."""
    o = table(spark, sf_dir, "orders")
    rowed = o.where(F.col("o_orderkey") < 400).select(
        "o_orderkey",
        F.struct(
            F.col("o_orderpriority").alias("prio"),
            F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
            F.year("o_orderdate").alias("order_year"),
        ).alias("r"),
    )
    return rowed.select(
        "o_orderkey",
        F.col("r.prio").alias("prio"),
        # string-serialized like every decimal in the suite: both
        # engines print decimal(12,2) canonically, while the driver's
        # canonicalizer treats bare decimal cells engine-specifically
        F.col("r.price").cast("string").alias("price"),
        F.col("r.order_year").alias("order_year"),
    )


@query(
    "try_expr",
    oracle="""
        select l_orderkey, l_linenumber,
               case when l_discount = 0 then null
                    else round(l_extendedprice / nullif(l_discount, 0), 6) end as price_per_disc,
               case when l_quantity - l_quantity = 0 and l_tax is not null then l_tax + 1 end as tax1
        from lineitem
        where l_orderkey < 300
    """,
)
def try_expr(spark, sf_dir):
    """#14 Presto TRY(expr) → Spark try_* family: error→NULL instead of
    ANSI abort (try_divide(x, 0) is NULL)."""
    li = table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_orderkey") < 300).select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide(F.col("l_extendedprice"), F.col("l_discount")), 6).alias(
            "price_per_disc"
        ),
        F.try_add(F.col("l_tax"), F.lit(1)).alias("tax1"),
    )


@query(
    "distinct_projection",
    oracle="select distinct c_mktsegment, c_nationkey from customer",
)
def distinct_projection(spark, sf_dir):
    """#15 SELECT DISTINCT — hash-aggregate dedup, shuffles only the
    two projected columns."""
    return table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# --------------------------------------------------------------------------
# §2.7 sort / limit / top-k / sample
# --------------------------------------------------------------------------

@query(
    "sort_global_topn",
    oracle="""
        select o_orderkey, round(o_totalprice, 6) as total
        from orders
        order by o_totalprice desc nulls last, o_orderkey asc
        limit 25
    """,
)
def sort_global_topn(spark, sf_dir):
    """#53 + #55 global sort fused to TakeOrderedAndProject; unique-key
    tiebreak keeps the LIMIT deterministic across engines."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.round("o_totalprice", 6).alias("total"))
        .orderBy(F.col("total").desc_nulls_last(), F.col("o_orderkey").asc())
        .limit(25)
    )


@query(
    "limit_offset",
    oracle="""
        select c_custkey, c_name
        from customer
        order by c_custkey
        limit 10 offset 20
    """,
)
def limit_offset(spark, sf_dir):
    """#54 LIMIT/OFFSET after a total order on a unique key."""
    c = table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_name")
        .orderBy(F.col("c_custkey").asc())
        .offset(20)
        .limit(10)
    )


@query("sample_bernoulli")  # rows-only: sampling is engine-specific
def sample_bernoulli(spark, sf_dir):
    """#56 TABLESAMPLE BERNOULLI — seeded for within-engine determinism;
    cross-engine values differ by design, so rows-only."""
    li = table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.01, seed=42).select("l_orderkey", "l_linenumber")


# --------------------------------------------------------------------------
# §2.8 set operations
# --------------------------------------------------------------------------

_NAT_CUST = "select c_nationkey as nationkey from customer where c_custkey < 400"
_NAT_SUPP = "select s_nationkey as nationkey from supplier"


@query(
    "set_union_all",
    oracle=f"select nationkey from ({_NAT_CUST}) union all select nationkey from ({_NAT_SUPP})",
)
def set_union_all(spark, sf_dir):
    """#57 UNION ALL — no dedup, no shuffle."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    a = c.where(F.col("c_custkey") < 400).select(F.col("c_nationkey").alias("nationkey"))
    b = s.select(F.col("s_nationkey").alias("nationkey"))
    return a.unionByName(b)


@query(
    "set_union_distinct",
    oracle=f"select nationkey from ({_NAT_CUST}) union select nationkey from ({_NAT_SUPP})",
)
def set_union_distinct(spark, sf_dir):
    """#58 UNION (distinct)."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    a = c.where(F.col("c_custkey") < 400).select(F.col("c_nationkey").alias("nationkey"))
    b = s.select(F.col("s_nationkey").alias("nationkey"))
    return a.union(b).distinct()


@query(
    "set_intersect",
    oracle=f"select nationkey from ({_NAT_CUST}) intersect select nationkey from ({_NAT_SUPP})",
)
def set_intersect(spark, sf_dir):
    """#59 INTERSECT (distinct)."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    a = c.where(F.col("c_custkey") < 400).select(F.col("c_nationkey").alias("nationkey"))
    b = s.select(F.col("s_nationkey").alias("nationkey"))
    return a.intersect(b)


@query(
    "set_intersect_all",
    oracle=f"select nationkey from ({_NAT_CUST}) intersect all select nationkey from ({_NAT_SUPP})",
)
def set_intersect_all(spark, sf_dir):
    """#59 INTERSECT ALL (bag semantics)."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    a = c.where(F.col("c_custkey") < 400).select(F.col("c_nationkey").alias("nationkey"))
    b = s.select(F.col("s_nationkey").alias("nationkey"))
    return a.intersectAll(b)


@query(
    "set_except",
    oracle="""
        select l_linenumber from lineitem
        except
        select l_linenumber from lineitem where l_linenumber <= 5
    """,
)
def set_except(spark, sf_dir):
    """#60 EXCEPT (distinct).  The right side is a strict subset of
    the left by construction (linenumbers 1-7 minus 1-5), so the
    result is {6, 7} at EVERY scale factor — the original
    customer-vs-supplier nationkey pair went empty at sf >= 0.01,
    which made the hash match trivially true (empty == empty) at the
    graded SF."""
    li = table(spark, sf_dir, "lineitem")
    a = li.select("l_linenumber")
    b = li.where(F.col("l_linenumber") <= 5).select("l_linenumber")
    return a.subtract(b)


@query(
    "set_except_all",
    oracle="""
        select l_returnflag from lineitem
        except all
        select l_returnflag from lineitem where l_linenumber > 1
    """,
)
def set_except_all(spark, sf_dir):
    """#60 EXCEPT ALL (bag semantics): subtracting multiplicities
    leaves max(0, mult_left - mult_right) copies per value — here
    exactly the rows with l_linenumber = 1 per returnflag, which is
    positive at every SF (every order contributes a linenumber-1 row).
    Replaces a pair that went empty at the graded SF."""
    li = table(spark, sf_dir, "lineitem")
    a = li.select("l_returnflag")
    b = li.where(F.col("l_linenumber") > 1).select("l_returnflag")
    return a.exceptAll(b)
