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
               array_to_string(string_split(c_name, '#'), '|') as name_parts,
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
        F.array_join(F.split("c_name", "#"), "|").alias("name_parts"),
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


@query(
    "str_case_misc",
    oracle="""
        select p_partkey,
               array_to_string(list_transform(string_split(lower(p_name), ' '),
                   w -> upper(substr(w, 1, 1)) || substr(w, 2)), ' ') as title_name,
               concat_ws('|', p_brand, p_type)                        as brand_type,
               translate(p_brand, '#', '-')                          as brand_dash,
               substr(p_type, 1, 1) || 'XX' || substr(p_type, 4)     as overlaid
        from part
        where p_partkey <= 300
    """,
)
def str_case_misc(spark, sf_dir):
    """initcap / concat_ws / translate / overlay.  DuckDB 1.0 lacks
    initcap and overlay natively — the oracle states the semantics via
    per-word list transform and substr composition (semantics, not
    syntax, is the contract)."""
    p = table(spark, sf_dir, "part")
    return p.where(F.col("p_partkey") <= 300).select(
        "p_partkey",
        F.initcap(F.lower("p_name")).alias("title_name"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.expr("overlay(p_type placing 'XX' from 2)").alias("overlaid"),
    )


@query(
    "str_url_extract",
    oracle="""
        with u as (
            select doc_id,
                   'https://' || source || '.example.com/docs/' || doc_id
                       || '?lang=' || lang as url
            from documents
        )
        select doc_id, url,
               regexp_extract(url, '^https://([^/]+)', 1) as host,
               regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) as path,
               regexp_extract(url, '\\?(.*)$', 1) as query_string
        from u
    """,
)
def str_url_extract(spark, sf_dir):
    """Presto url_extract_host/path/query ≡ Spark parse_url.  The
    oracle re-states URL anatomy with anchored regexes (DuckDB has no
    URL library) — any parse_url/regex disagreement breaks the hash."""
    docs = table(spark, sf_dir, "documents")
    u = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
        ).alias("url"),
    )
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query_string"),
    )
