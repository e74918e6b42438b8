"""Math scalar functions (§2.9 #89-98).

Divergences pinned here: DuckDB ceil/floor/trunc on DOUBLE return
DOUBLE/DECIMAL while Spark returns BIGINT → both sides cast to bigint;
double→int casts (trunc vs round) never appear bare (see
relational.cast_try_cast); libm last-ulp differences (exp/cbrt/trig)
are absorbed by round(x, 6) on both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparketl.registry import query
from sparketl.tables import table


@query(
    "math_rounding",
    oracle="""
        select s_suppkey,
               abs(s_acctbal - 5000)                      as dist_5k,
               cast(ceil(s_acctbal) as bigint)            as bal_ceil,
               cast(floor(s_acctbal) as bigint)           as bal_floor,
               round(s_acctbal / 7, 6)                    as bal_div7,
               cast(trunc(s_acctbal - 5000) as bigint)    as trunc_toward_zero
        from supplier
    """,
)
def math_rounding(spark, sf_dir):
    """#89, #97: abs/ceil/floor/round(x,d)/truncate.  Spark has no
    double truncate builtin → floor/ceil by sign, ≡ DuckDB trunc."""
    s = table(spark, sf_dir, "supplier")
    centered = F.col("s_acctbal") - 5000
    return s.select(
        "s_suppkey",
        F.abs(centered).alias("dist_5k"),
        F.ceil("s_acctbal").alias("bal_ceil"),
        F.floor("s_acctbal").alias("bal_floor"),
        F.round(F.col("s_acctbal") / 7, 6).alias("bal_div7"),
        F.when(centered >= 0, F.floor(centered))
        .otherwise(F.ceil(centered))
        .alias("trunc_toward_zero"),
    )


@query(
    "math_exp_log",
    oracle="""
        select p_partkey,
               round(power(p_size, 2), 6)        as size_sq,
               round(sqrt(p_retailprice), 6)     as price_sqrt,
               round(cbrt(p_retailprice), 6)     as price_cbrt,
               round(exp(p_size / 100.0), 6)     as size_exp,
               round(ln(p_retailprice), 6)       as price_ln,
               round(log2(p_retailprice), 6)     as price_log2,
               round(log10(p_retailprice), 6)    as price_log10,
               round(log(2, p_size), 6)          as size_log2
        from part
        where p_partkey < 600 and p_size > 0
    """,
)
def math_exp_log(spark, sf_dir):
    """#90, #91: power/sqrt/cbrt/exp + log family (Spark log(b, x) arg
    order matches Presto and DuckDB, verified)."""
    p = table(spark, sf_dir, "part")
    return p.where((F.col("p_partkey") < 600) & (F.col("p_size") > 0)).select(
        "p_partkey",
        F.round(F.pow("p_size", F.lit(2)), 6).alias("size_sq"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.cbrt("p_retailprice"), 6).alias("price_cbrt"),
        F.round(F.exp(F.col("p_size") / 100.0), 6).alias("size_exp"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.round(F.log2("p_retailprice"), 6).alias("price_log2"),
        F.round(F.log10("p_retailprice"), 6).alias("price_log10"),
        F.round(F.log(2.0, "p_size"), 6).alias("size_log2"),
    )


@query(
    "math_mod_sign",
    oracle="""
        select o_orderkey,
               mod(o_orderkey, 7)                      as mod7,
               mod(o_orderkey - 100000, 13)            as mod13_shifted,
               cast(sign(o_totalprice - 200000) as integer) as price_sign,
               greatest(o_totalprice, 150000.0)        as at_least_150k,
               least(cast(o_orderkey as double), 500.0) as at_most_500
        from orders
        where o_orderkey < 1000
    """,
)
def math_mod_sign(spark, sf_dir):
    """#92, #93: mod (sign follows dividend in all three engines),
    sign, greatest/least."""
    o = table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") < 1000).select(
        "o_orderkey",
        (F.col("o_orderkey") % 7).alias("mod7"),
        ((F.col("o_orderkey") - 100000) % 13).alias("mod13_shifted"),
        F.signum(F.col("o_totalprice") - 200000).cast("int").alias("price_sign"),
        F.greatest("o_totalprice", F.lit(150000.0)).alias("at_least_150k"),
        F.least(F.col("o_orderkey").cast("double"), F.lit(500.0)).alias("at_most_500"),
    )


@query(
    "math_trig",
    oracle="""
        select s_suppkey,
               round(sin(s_acctbal / 1000), 6)            as sin_v,
               round(cos(s_acctbal / 1000), 6)            as cos_v,
               round(tan(s_nationkey / 10.0), 6)          as tan_v,
               round(asin(s_nationkey / 100.0), 6)        as asin_v,
               round(acos(s_nationkey / 100.0), 6)        as acos_v,
               round(atan(s_acctbal / 1000), 6)           as atan_v,
               round(atan2(s_acctbal, 1000.0), 6)         as atan2_v
        from supplier
    """,
)
def math_trig(spark, sf_dir):
    """#96 trig family (libm ulp differences absorbed by round 6)."""
    s = table(spark, sf_dir, "supplier")
    k = F.col("s_acctbal") / 1000
    n = F.col("s_nationkey")
    return s.select(
        "s_suppkey",
        F.round(F.sin(k), 6).alias("sin_v"),
        F.round(F.cos(k), 6).alias("cos_v"),
        F.round(F.tan(n / 10.0), 6).alias("tan_v"),
        F.round(F.asin(n / 100.0), 6).alias("asin_v"),
        F.round(F.acos(n / 100.0), 6).alias("acos_v"),
        F.round(F.atan(k), 6).alias("atan_v"),
        F.round(F.atan2(F.col("s_acctbal"), F.lit(1000.0)), 6).alias("atan2_v"),
    )


@query(
    "math_nan_inf",
    oracle="""
        select r_regionkey,
               isnan(cast('nan' as double))              as is_nan_true,
               isnan(cast(r_regionkey as double))        as is_nan_false,
               cast('inf' as double) > 1e308             as inf_big,
               cast('-inf' as double) < -1e308           as neg_inf_small
        from region
    """,
)
def math_nan_inf(spark, sf_dir):
    """#98 is_nan / infinity() / nan() handling."""
    r = table(spark, sf_dir, "region")
    return r.select(
        "r_regionkey",
        F.isnan(F.lit(float("nan"))).alias("is_nan_true"),
        F.isnan(F.col("r_regionkey").cast("double")).alias("is_nan_false"),
        (F.lit(float("inf")) > 1e308).alias("inf_big"),
        (F.lit(float("-inf")) < -1e308).alias("neg_inf_small"),
    )


@query("math_random_seeded")  # rows-only: PRNG streams are engine-specific
def math_random_seeded(spark, sf_dir):
    """#95 random()/rand(seed): seeded for within-engine determinism;
    cross-engine values differ by design → rows-only check."""
    o = table(spark, sf_dir, "orders")
    return (
        o.where(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            F.round(F.rand(seed=42), 6).alias("r"),
        )
    )


@query(
    "math_bitwise",
    oracle="""
        select p_partkey,
               p_size & 12                 as band,
               p_size | 5                  as bor,
               xor(p_size::bigint, 9)      as bxor,
               p_size << 2                 as shl,
               p_size >> 1                 as shr,
               bit_count(p_size::bigint)   as popcount
        from part
        where p_partkey <= 500
    """,
)
def math_bitwise(spark, sf_dir):
    """Presto bitwise family (bitwise_and/or/xor, shifts, bit_count):
    Spark operators `& | ^ shiftleft/shiftright` ≡ DuckDB `& | xor()
    << >>`.  Int widths pinned: bit_count over bigint on both sides."""
    p = table(spark, sf_dir, "part")
    return p.where(F.col("p_partkey") <= 500).select(
        "p_partkey",
        F.expr("p_size & 12").alias("band"),
        F.expr("p_size | 5").alias("bor"),
        F.expr("cast(p_size as bigint) ^ 9").alias("bxor"),
        F.expr("shiftleft(p_size, 2)").alias("shl"),
        F.expr("shiftright(p_size, 1)").alias("shr"),
        F.expr("cast(bit_count(cast(p_size as bigint)) as int)").alias("popcount"),
    )
