"""String scalar functions (§2.9 #61-77).

Presto-name → Spark-name divergences handled per SURVEY.md §2.9:
#67 Spark split() takes a REGEX; #73 regexp_extract returns '' on
no-match in BOTH Spark and DuckDB (verified §0.1) so they pair
natively; DuckDB regexp_replace needs the 'g' flag to match
Spark/Presto replace-all semantics.

All JVM-side built-ins — whole-stage codegen, no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparketl.registry import query
from sparketl.tables import table


@query(
    "str_basic",
    oracle="""
        select p_partkey,
               p_brand || ' ' || p_name        as brand_name,
               length(p_name)                  as name_len,
               upper(p_name)                   as name_up,
               lower(p_type)                   as type_lo,
               substr(p_name, 1, 4)            as name_head,
               substr(p_name, 3)               as name_tail,
               trim(' ' || p_name || '  ')     as name_trim,
               ltrim('xx' || p_name, 'x')      as name_ltrim,
               rtrim(p_name || 'yy', 'y')      as name_rtrim,
               replace(p_name, ' ', '_')       as name_us,
               reverse(p_brand)                as brand_rev,
               lpad(cast(p_size as varchar), 4, '0') as size_pad,
               rpad(p_brand, 12, '.')          as brand_pad,
               repeat(p_brand, 2)              as brand_twice
        from part
        where p_partkey < 400
    """,
)
def str_basic(spark, sf_dir):
    """#61-66, #70, #71 concat/length/case/substr(1-based)/trim/replace/
    pad/reverse (+ repeat)."""
    p = table(spark, sf_dir, "part")
    return p.where(F.col("p_partkey") < 400).select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit(" "), F.col("p_name")).alias("brand_name"),
        F.length("p_name").alias("name_len"),
        F.upper("p_name").alias("name_up"),
        F.lower("p_type").alias("type_lo"),
        F.substring("p_name", 1, 4).alias("name_head"),
        F.col("p_name").substr(F.lit(3), F.length("p_name")).alias("name_tail"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.ltrim(F.concat(F.lit("xx"), F.col("p_name")), F.lit("x")).alias("name_ltrim"),
        F.rtrim(F.concat(F.col("p_name"), F.lit("yy")), F.lit("y")).alias("name_rtrim"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_us"),
        F.reverse("p_brand").alias("brand_rev"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.rpad("p_brand", 12, ".").alias("brand_pad"),
        F.repeat("p_brand", 2).alias("brand_twice"),
    )


@query(
    "str_split_find",
    oracle="""
        select c_custkey,
               string_split(c_name, '#')        as name_parts,
               split_part(c_name, '#', 2)       as cust_num,
               strpos(c_name, '#')              as hash_pos,
               strpos(c_name, 'zzz')            as missing_pos,
               starts_with(c_name, 'Customer')  as is_cust,
               contains(c_name, '000')          as has_zeros
        from customer
        where c_custkey < 300
    """,
)
def str_split_find(spark, sf_dir):
    """#67-69, #75: split (Spark arg is a REGEX — '#' is safe literal),
    split_part, strpos (1-based, 0 if absent), starts_with, contains."""
    c = table(spark, sf_dir, "customer")
    return c.where(F.col("c_custkey") < 300).select(
        "c_custkey",
        F.split("c_name", "#").alias("name_parts"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("cust_num"),
        F.instr("c_name", "#").cast("bigint").alias("hash_pos"),
        F.instr("c_name", "zzz").cast("bigint").alias("missing_pos"),
        F.startswith(F.col("c_name"), F.lit("Customer")).alias("is_cust"),
        F.contains(F.col("c_name"), F.lit("000")).alias("has_zeros"),
    )


@query(
    "str_regexp",
    oracle="""
        select p_partkey,
               regexp_matches(p_name, '^[sb].*[tg]$')      as sb_tg,
               regexp_extract(p_name, '([a-z]+) ([a-z]+)', 1) as first_word,
               regexp_extract(p_name, '(\\d+)', 1)          as digits_none,
               regexp_replace(p_name, '[aeiou]', '*', 'g')  as devoweled,
               levenshtein(p_brand, 'Brand#1')              as dist_b1,
               printf('%s/%03d', p_brand, p_size)           as brand_size
        from part
        where p_partkey < 400
    """,
)
def str_regexp(spark, sf_dir):
    """#72-74, #76, #77: regexp_like/extract/replace, levenshtein,
    format.  regexp_extract no-match → '' on both engines (verified);
    DuckDB regexp_replace gets the 'g' flag to match Spark's
    replace-all."""
    p = table(spark, sf_dir, "part")
    return p.where(F.col("p_partkey") < 400).select(
        "p_partkey",
        F.col("p_name").rlike("^[sb].*[tg]$").alias("sb_tg"),
        F.regexp_extract("p_name", r"([a-z]+) ([a-z]+)", 1).alias("first_word"),
        F.regexp_extract("p_name", r"(\d+)", 1).alias("digits_none"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.levenshtein("p_brand", F.lit("Brand#1")).alias("dist_b1"),
        F.format_string("%s/%03d", "p_brand", "p_size").alias("brand_size"),
    )


@query(
    "str_codepoints",
    oracle="""
        select r_regionkey,
               ascii(r_name)                  as first_cp,
               chr(ascii(r_name) + 1)         as next_chr,
               translate(r_name, 'AEI', 'aei') as translated
        from region
    """,
)
def str_codepoints(spark, sf_dir):
    """#61-family extras: ascii/chr/translate (Presto codepoint/chr)."""
    r = table(spark, sf_dir, "region")
    return r.select(
        "r_regionkey",
        F.ascii("r_name").alias("first_cp"),
        F.char(F.ascii("r_name") + 1).alias("next_chr"),
        F.translate("r_name", "AEI", "aei").alias("translated"),
    )
