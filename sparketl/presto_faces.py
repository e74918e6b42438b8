"""Native Presto-text faces for the non-oracle-portable families
(round 8, VERDICT r7 #4).

The E2 parity sweep (tests/test_sql_front_door.py) replays each
declared query's ORACLE SQL through ``dialect.sql`` — but ~20 families
(arrays, maps, JSON, approx sketches, URL, bit ops) have oracles
written in DuckDB-only surface (list_*, struct_pack, json_keys …)
that no Presto user would ever type.  This module gives those
families what the reference's users actually have in their pipeline
repos: REAL Presto SQL — ARRAY[...] literals, MAP(ARRAY, ARRAY)
constructors, element_at, cardinality, map_agg/set_agg,
approx_most_frequent, url_extract_*, bitwise_* — exercising the
translator's §2.9 rewrites end-to-end against the DataFrame face.

Compare modes (``FACE_MODE``, default "exact"):

  exact            canonical-frame equality with the E1 DataFrame face
                   (both run on Spark, so even sketch results match
                   bit-for-bit when the translated plan is right)
  subset:<cols>    canonical equality restricted to the named columns —
                   used where one E1 column has no Presto spelling
                   (e.g. Spark's struct() in json_parse_format)
  tolerance        approx face checked against the E1 exact value
                   within 2% (the Presto text has no exact-percentile
                   spelling to compare exactly against)

Documented divergence exercised here on purpose: Presto's
regexp_extract returns NULL on no-match while Spark returns '' — the
translated face runs on Spark and therefore matches the E1 face; a
real Presto cluster would emit NULL.  The translator does not paper
over it (a coalesce would corrupt genuine empty-group captures);
pipelines that rely on the NULL contract must coalesce explicitly.
"""

from __future__ import annotations

_TOK = "split(text, ' ')"
_M = (
    "MAP(ARRAY['n_chars', 'n_tokens'], "
    "ARRAY[n_chars, cast(cardinality(split(text, ' ')) as bigint)])"
)

PRESTO_FACES: dict[str, str] = {
    # ---- arrays (§2.9 #99-116) -------------------------------------
    "arr_basics": f"""
        select doc_id,
               cast(cardinality({_TOK}) as bigint)            as n_tokens,
               element_at({_TOK}, 3)                          as third_token,
               element_at({_TOK}, 999)                        as oob_token,
               cast(array_position({_TOK}, 'value') as bigint) as value_pos,
               contains({_TOK}, 'data')                       as has_data
        from documents
        where doc_id < 200
    """,
    "arr_sort_dedup": f"""
        select doc_id,
               array_join(array_sort(array_distinct({_TOK})), ',') as vocab,
               cast(cardinality(array_distinct({_TOK})) as bigint) as n_distinct,
               array_min({_TOK})                                   as min_token
        from documents
        where doc_id < 150
    """,
    "arr_set_ops": """
        select doc_id,
               array_join(array_sort(array_intersect(
                   sequence(1, cast(doc_id % 5 + 1 as integer)),
                   sequence(2, 6))), ',') as inter,
               array_join(array_sort(array_union(
                   sequence(1, cast(doc_id % 5 + 1 as integer)),
                   sequence(2, 6))), ',') as uni,
               array_join(array_sort(array_except(
                   sequence(1, cast(doc_id % 5 + 1 as integer)),
                   sequence(2, 6))), ',') as minus,
               arrays_overlap(sequence(1, cast(doc_id % 5 + 1 as integer)),
                              sequence(4, 6)) as overlaps
        from documents
        where doc_id < 120
    """,
    "arr_slice_join_zip": f"""
        select doc_id,
               array_join(slice({_TOK}, 2, 3), ',')  as middle,
               array_join(slice({_TOK}, 1, 5), '-')  as head_joined,
               array_join(flatten(ARRAY[slice({_TOK}, 1, 2),
                                        slice({_TOK}, 3, 2)]), ',') as refl,
               array_join(zip_with(sequence(1, 3), sequence(4, 6),
                                   (x, y) -> x * 10 + y), ',') as zipped
        from documents
        where doc_id < 100
    """,
    "arr_lambda": """
        select p_partkey,
               array_join(transform(sequence(1, p_size % 6 + 2),
                                    x -> x * x), ',') as squares,
               array_join(filter(sequence(1, p_size % 6 + 2),
                                 x -> x % 2 = 0), ',') as evens,
               reduce(sequence(1, p_size % 6 + 2), cast(0 as bigint),
                      (acc, x) -> acc + x, s -> s) as total
        from part
        where p_partkey < 300
    """,
    "arr_unnest": f"""
        select doc_id, token
        from documents
        cross join unnest({_TOK}) as t(token)
        where doc_id < 60
    """,
    "arr_embedding_norm": """
        select vec_id,
               cast(cardinality(embedding) as bigint) as dim,
               round(sqrt(reduce(
                   transform(embedding,
                             x -> cast(x as double) * cast(x as double)),
                   cast(0.0 as double), (acc, x) -> acc + x, s -> s)), 6)
                   as l2_norm
        from embeddings
        where vec_id < 100
    """,
    # ---- maps (§2.9 #117-122) --------------------------------------
    "map_build_access": f"""
        select doc_id,
               array_join(array_sort(map_keys({_M})), ',')   as keys_sorted,
               array_join(array_sort(map_values({_M})), ',') as vals_sorted,
               element_at({_M}, 'n_chars')                   as chars_val,
               element_at({_M}, 'missing')                   as missing_val
        from documents
        where doc_id < 150
    """,
    "map_transform_filter": f"""
        select doc_id,
               array_join(array_sort(transform(
                   map_entries(transform_values({_M}, (k, v) -> v * 2)),
                   e -> concat(e.key, '=', cast(e.value as varchar)))), ',')
                   as doubled,
               array_join(array_sort(transform(
                   map_entries(map_filter({_M}, (k, v) -> v > 200)),
                   e -> concat(e.key, '=', cast(e.value as varchar)))), ',')
                   as big_entries,
               array_join(array_sort(map_keys(map_concat({_M},
                   MAP(ARRAY['extra'], ARRAY[cast(1 as bigint)])))), ',')
                   as all_keys
        from documents
        where doc_id < 120
    """,
    # ---- JSON (§2.9 #123-127) --------------------------------------
    "json_extract_scalar": """
        select event_id,
               json_extract_scalar(props, '$.k')                   as k_str,
               cast(json_extract_scalar(props, '$.k') as integer)  as k_int,
               json_extract_scalar(props, '$.absent')              as missing,
               cast(json_extract_scalar(props, '$.k') as integer) * 2
                   as k_doubled
        from events
        where event_id < 400
    """,
    # Spark's struct()/json_object_keys have no Presto spelling —
    # compared on the Presto-expressible columns (subset mode).
    "json_parse_format": """
        select event_id,
               cast(json_extract_scalar(props, '$.k') as integer) as parsed_k,
               json_array_length(json_format(ARRAY[event_id, user_id]))
                   as arr_len
        from events
        where event_id < 300
    """,
    # ---- approx sketches (§2.9 #40-41 family) ----------------------
    # Presto has no exact-percentile spelling — tolerance mode checks
    # the sketch against the E1 face's exact_p50 within 2%.
    "approx_percentile": """
        select approx_percentile(o_totalprice, 0.5) as ap50
        from orders
    """,
    "approx_top_k_sketch": """
        with exact as (
            select event_type, count(*) as n from events group by event_type
        ),
        top as (
            select event_type, n,
                   row_number() over (order by n desc, event_type asc) as rnk
            from exact
        ),
        sk as (
            select approx_most_frequent(3, event_type, 10000) as m
            from events
        )
        select t.rnk, t.event_type, t.n,
               contains(map_keys(s.m), t.event_type) as in_sketch
        from top t cross join sk s
        where t.rnk <= 3
    """,
    # ---- aggregate collections (§2.9 #34-35) -----------------------
    "agg_array_agg": """
        select n_regionkey,
               array_join(array_sort(array_agg(n_name)), ',') as nations
        from nation
        group by n_regionkey
    """,
    "agg_map_agg": """
        with c as (
            select o_orderstatus, o_orderpriority, count(*) as cnt
            from orders group by o_orderstatus, o_orderpriority
        )
        select o_orderstatus,
               array_join(transform(
                   array_sort(map_entries(map_agg(o_orderpriority, cnt))),
                   e -> concat(e.key, ':', cast(e.value as varchar))), ',')
                   as prio_counts
        from c
        group by o_orderstatus
    """,
    "agg_set_agg": """
        select l_returnflag,
               array_join(array_sort(set_agg(l_linestatus)), ',') as statuses,
               cast(cardinality(set_agg(l_linestatus)) as bigint) as n_distinct
        from lineitem
        group by l_returnflag
    """,
    "agg_listagg": """
        select o_orderstatus,
               listagg(distinct o_orderpriority, '|')
                   within group (order by o_orderpriority) as priorities,
               listagg(cast(o_orderkey as varchar), ',')
                   within group (order by o_orderkey) as keys_csv,
               count(*) as n
        from orders
        where o_orderkey < 200
        group by o_orderstatus
    """,
    # ---- strings (§2.9 #61-77) -------------------------------------
    "str_split_find": """
        select c_custkey,
               array_join(split(c_name, '#'), '|')          as name_parts,
               split_part(c_name, '#', 2)                   as cust_num,
               cast(strpos(c_name, '#') as bigint)          as hash_pos,
               cast(strpos(c_name, 'zzz') as bigint)        as missing_pos,
               starts_with(c_name, 'Customer')              as is_cust,
               strpos(c_name, '000') > 0                    as has_zeros
        from customer
        where c_custkey < 300
    """,
    "str_regexp": """
        select p_partkey,
               regexp_like(p_name, '^[sb].*[tg]$')           as sb_tg,
               regexp_extract(p_name, '([a-z]+) ([a-z]+)', 1) as first_word,
               regexp_extract(p_name, '(\\d+)', 1)           as digits_none,
               regexp_replace(p_name, '[aeiou]', '*')        as devoweled,
               levenshtein_distance(p_brand, 'Brand#1')      as dist_b1,
               format('%s/%03d', p_brand, p_size)            as brand_size
        from part
        where p_partkey < 400
    """,
    "str_url_extract": """
        with u as (
            select doc_id,
                   'https://' || source || '.example.com/docs/'
                       || cast(doc_id as varchar) || '?lang=' || lang as url
            from documents
        )
        select doc_id, url,
               url_extract_host(url)  as host,
               url_extract_path(url)  as path,
               url_extract_query(url) as query_string
        from u
    """,
    # ---- datetimes (§2.9 #78-88) -----------------------------------
    "dt_trunc_extract": """
        select o_orderkey,
               format_datetime(date_trunc('month', o_orderdate), 'yyyy-MM-dd')
                   as order_month,
               format_datetime(date_trunc('week', o_orderdate), 'yyyy-MM-dd')
                   as order_week,
               cast(year(o_orderdate) as bigint)    as y,
               cast(month(o_orderdate) as bigint)   as m,
               cast(day(o_orderdate) as bigint)     as d,
               cast(quarter(o_orderdate) as bigint) as q,
               cast(hour(o_orderdate) as bigint)    as h
        from orders
        where o_orderkey < 1500
    """,
    "dt_add_diff": """
        select o_orderkey,
               format_datetime(date_add('day', 30, o_orderdate), 'yyyy-MM-dd')
                   as due_date,
               format_datetime(date_add('month', -2, o_orderdate), 'yyyy-MM-dd')
                   as lookback,
               date_diff('day', timestamp '1995-01-01', o_orderdate)
                   as days_since_epoch_start,
               date_diff('month', timestamp '1995-01-01', o_orderdate)
                   as months_since
        from orders
        where o_orderkey < 1200
    """,
    # ---- row-pattern matching (SQL:2016 MATCH_RECOGNIZE) -----------
    # the genuine Trino syntax, handled by dialect._rewrite_
    # match_recognize for the restricted A B* C shape (see its
    # docstring for the soundness argument and refusal list)
    "row_pattern_funnel": """
        select user_id, start_event_id, end_event_id, n_rows, duration_us
        from events match_recognize (
            partition by user_id
            order by ts asc, event_id asc
            measures V.event_id as start_event_id,
                     P.event_id as end_event_id,
                     count(*) as n_rows,
                     date_diff('microsecond', V.ts, P.ts) as duration_us
            one row per match
            after match skip past last row
            pattern (V B* P)
            define V as event_type = 'view',
                   B as event_type = 'click',
                   P as event_type = 'purchase'
        )
    """,
    # ---- math (§2.9 #89-98) ----------------------------------------
    "math_rounding": """
        select s_suppkey,
               abs(s_acctbal - 5000)                    as dist_5k,
               cast(ceil(s_acctbal) as bigint)          as bal_ceil,
               cast(floor(s_acctbal) as bigint)         as bal_floor,
               round(s_acctbal / 7, 6)                  as bal_div7,
               cast(truncate(s_acctbal - 5000) as bigint) as trunc_toward_zero
        from supplier
    """,
    "math_bitwise": """
        select p_partkey,
               bitwise_and(p_size, 12)                          as band,
               bitwise_or(p_size, 5)                            as bor,
               bitwise_xor(cast(p_size as bigint), 9)           as bxor,
               bitwise_left_shift(p_size, 2)                    as shl,
               bitwise_right_shift(p_size, 1)                   as shr,
               cast(bit_count(cast(p_size as bigint), 64) as integer)
                   as popcount
        from part
        where p_partkey <= 500
    """,
    # ================= round 9 (VERDICT r8 #7): 25 -> 43 faces =======
    # ---- TRY / CAST (§2.9 #13-14) -----------------------------------
    # DIVERGENCE: on a real Presto cluster DOUBLE division by zero is
    # IEEE Infinity (TRY never fires), so l_discount = 0 rows carry
    # price_per_disc = Infinity there; the translated try_divide gives
    # NULL — Spark division has no Infinity-producing path to preserve.
    # Same class as the cast-rounding note below: the face matches the
    # E1 face (both run on Spark); pipelines moving engines must
    # nullif the divisor explicitly to pin one semantics.
    "try_expr": """
        select l_orderkey, l_linenumber,
               round(try(l_extendedprice / l_discount), 6) as price_per_disc,
               try(l_tax + 1) as tax1
        from lineitem
        where l_orderkey < 300
    """,
    # Presto cast(double as integer) ROUNDS half-even where Spark/ANSI
    # truncates toward zero — this face runs on Spark so it matches the
    # E1 face; a real Presto cluster diverges on the .5+ fraction
    # (documented §2.9; the declared query's oracle pins truncation)
    "cast_try_cast": """
        select p_partkey,
               cast(p_size as bigint) as size_l,
               cast(p_size as varchar) as size_s,
               cast(p_retailprice as integer) as price_i,
               try_cast(p_brand as integer) as brand_i,
               try_cast(substr(p_brand, 7) as integer) as brand_num
        from part
        where p_partkey < 500
    """,
    # ---- approx family (§2.9 #40) -----------------------------------
    "approx_count_distinct": """
        select count(distinct l_partkey) as exact_nd,
               abs(approx_distinct(l_partkey) - count(distinct l_partkey))
                   <= 0.05 * count(distinct l_partkey) as hll_within_5pct
        from lineitem
    """,
    # Presto's approx_set/merge/cardinality HLL workflow has no
    # string-rewritable Spark twin (cardinality is array-length here),
    # so the face states the same contract via approx_distinct per
    # segment + globally; exact columns match bit-for-bit, the ±5%
    # booleans are true under both engines' sketches
    "approx_hll_sketch_merge": """
        with seg as (
            select l_returnflag,
                   count(distinct l_partkey) as seg_exact,
                   approx_distinct(l_partkey) as seg_est
            from lineitem
            group by l_returnflag
        ),
        tot as (
            select count(distinct l_partkey) as union_exact,
                   approx_distinct(l_partkey) as union_est
            from lineitem
        )
        select s.l_returnflag, s.seg_exact, t.union_exact,
               abs(s.seg_est - s.seg_exact) <= 0.05 * s.seg_exact
                   as seg_within_5pct,
               abs(t.union_est - t.union_exact) <= 0.05 * t.union_exact
                   as union_within_5pct
        from seg s cross join tot t
    """,
    # ---- second MATCH_RECOGNIZE variant: alternation middle ---------
    # (reversed (E|B) vs the declared query's (B|E) — same matches,
    # different text through the widened round-9 rewrite)
    "row_pattern_funnel_alt": """
        select user_id, start_event_id, end_event_id, n_rows
        from events match_recognize (
            partition by user_id
            order by ts asc, event_id asc
            measures V.event_id as start_event_id,
                     P.event_id as end_event_id,
                     count(*) as n_rows
            one row per match
            after match skip past last row
            pattern (V (E|B)* P)
            define V as event_type = 'view',
                   E as event_type = 'error',
                   B as event_type = 'click',
                   P as event_type = 'purchase'
        )
    """,
    # ---- maps (§2.9 #117-122) ---------------------------------------
    "map_build_access": f"""
        select doc_id,
               array_join(array_sort(map_keys({_M})), ',')   as keys_sorted,
               array_join(array_sort(map_values({_M})), ',') as vals_sorted,
               element_at({_M}, 'n_chars')                   as chars_val,
               element_at({_M}, 'missing')                   as missing_val
        from documents
        where doc_id < 150
    """,
    "map_transform_filter": f"""
        select doc_id,
               array_join(array_sort(transform(
                   map_entries(transform_values({_M}, (k, v) -> v * 2)),
                   e -> e.key || '=' || cast(e.value as varchar))), ',')
                   as doubled,
               array_join(array_sort(transform(
                   map_entries(map_filter({_M}, (k, v) -> v > 200)),
                   e -> e.key || '=' || cast(e.value as varchar))), ',')
                   as big_entries,
               array_join(array_sort(map_keys(map_concat({_M},
                   MAP(ARRAY['extra'], ARRAY[cast(1 as bigint)])))), ',')
                   as all_keys
        from documents
        where doc_id < 120
    """,
    # ---- predicates / conditionals (§2.9 #11-12) --------------------
    "pred_null_safe": """
        select s_suppkey,
               nullif(s_acctbal, 0) is null as bal_zero_or_null,
               nullif(s_name, s_name) is not distinct from
                   nullif(upper(s_name), upper(s_name)) as nullsafe_eq,
               coalesce(nullif(s_nationkey, 0), -1) as natkey_or_default
        from supplier
    """,
    "cond_case_coalesce": """
        select o_orderkey,
               case when o_totalprice > 150000 then 'large'
                    when o_totalprice > 50000 then 'medium'
                    else 'small' end as bucket,
               if(o_orderstatus = 'O', 'open', 'settled') as state,
               coalesce(nullif(o_orderpriority, '5-LOW'), 'LOW') as prio
        from orders
        where o_orderkey < 1000
    """,
    # ---- strings (§2.9 #61-77) --------------------------------------
    # ANSI trim(leading/trailing x from s) — the one spelling Presto
    # and Spark share (bare 2-arg ltrim/rtrim have REVERSED argument
    # order between the engines: a silent-corruption trap)
    "str_basic": """
        select p_partkey,
               p_brand || ' ' || p_name        as brand_name,
               length(p_name)                  as name_len,
               upper(p_name)                   as name_up,
               lower(p_type)                   as type_lo,
               substr(p_name, 1, 4)            as name_head,
               substr(p_name, 3)               as name_tail,
               trim(' ' || p_name || '  ')     as name_trim,
               trim(leading 'x' from 'xx' || p_name)  as name_ltrim,
               trim(trailing 'y' from p_name || 'yy') as name_rtrim,
               replace(p_name, ' ', '_')       as name_us,
               reverse(p_brand)                as brand_rev,
               lpad(cast(p_size as varchar), 4, '0') as size_pad,
               rpad(p_brand, 12, '.')          as brand_pad,
               p_brand || p_brand              as brand_twice
        from part
        where p_partkey < 400
    """,
    "str_codepoints": """
        select r_regionkey,
               codepoint(substr(r_name, 1, 1))          as first_cp,
               chr(codepoint(substr(r_name, 1, 1)) + 1) as next_chr,
               translate(r_name, 'AEI', 'aei')          as translated
        from region
    """,
    # ---- datetimes (§2.9 #83-85, #88) -------------------------------
    "dt_unixtime": """
        select o_orderkey,
               cast(to_unixtime(cast(o_orderdate as timestamp)) as bigint)
                   as epoch_sec,
               format_datetime(from_unixtime(
                   to_unixtime(cast(o_orderdate as timestamp)) + 43200),
                   'yyyy-MM-dd HH:mm:ss') as noon_after
        from orders
        where o_orderkey < 800
    """,
    # Presto carries BOTH pattern languages: format_datetime/
    # parse_datetime (Joda/Java) and date_format/date_parse (MySQL
    # %-specifiers).  This face exercises both through the translator
    # — the MySQL pair is rewritten specifier-by-specifier (r10), the
    # Java pair maps by name.
    "dt_parse_format": """
        select o_orderkey,
               date_format(o_orderdate, '%Y/%m')  as ym,
               date_format(o_orderdate, '%Y-%m-%d %H:%i:%s') as full_str,
               format_datetime(date_parse(
                   date_format(o_orderdate, '%d|%m|%Y'), '%d|%m|%Y'),
                   'yyyy-MM-dd') as roundtrip_date,
               format_datetime(cast('1997-06-15' as timestamp), 'yyyy-MM-dd')
                   as fixed_date
        from orders
        where o_orderkey < 600
    """,
    # the time-zone / ISO family (r9 verdict #1): genuine Presto
    # spellings — AT TIME ZONE, with_timezone, to_iso8601 — through
    # the translator, against the E1 from_utc/to_utc composition
    "dt_timezone_iso": """
        select event_id,
               format_datetime(ts at time zone 'America/Los_Angeles',
                               'yyyy-MM-dd HH:mm:ss') as la_wall,
               format_datetime(with_timezone(ts, 'Asia/Tokyo'),
                               'yyyy-MM-dd HH:mm:ss') as tokyo_instant,
               to_iso8601(ts) as iso_ts
        from events
        where event_id < 4000
    """,
    # ---- math (§2.9 #89-98) -----------------------------------------
    "math_exp_log": """
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
    "math_trig": """
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
    "math_nan_inf": """
        select r_regionkey,
               is_nan(nan())                         as is_nan_true,
               is_nan(cast(r_regionkey as double))   as is_nan_false,
               infinity() > 1e308                    as inf_big,
               -infinity() < -1e308                  as neg_inf_small
        from region
    """,
    "math_mod_sign": """
        select o_orderkey,
               mod(o_orderkey, 7)                      as mod7,
               mod(o_orderkey - 100000, 13)            as mod13_shifted,
               cast(sign(o_totalprice - 200000) as integer) as price_sign,
               greatest(o_totalprice, 150000.0)        as at_least_150k,
               least(cast(o_orderkey as double), 500.0) as at_most_500
        from orders
        where o_orderkey < 1000
    """,
    # ---- UNNEST WITH ORDINALITY (§2.9 #111/#116) --------------------
    # the genuine Presto idiom for positional explode; the E1 face
    # builds the same rows via arrays_zip(sequence, words)
    "arr_zip_pairs": """
        select p_partkey, cast(pos as integer) as pos, word
        from part
        cross join unnest(split(p_name, ' ')) with ordinality as t(word, pos)
        where p_partkey <= 200
    """,
    # ---- round-9 query-shape ops (§2 #150-#152) ---------------------
    # WITH RECURSIVE is SQL:1999 text both engines accept verbatim;
    # the parent key uses the PORTABLE integer-division spelling
    # cast(floor(x / 10.0)) because Presto's integer `/` truncates
    # where Spark's returns double (the documented silent divergence
    # in dialect.py — discovered via exactly this join)
    "cte_recursive_hierarchy": """
        with recursive tree(custkey, root, depth, acctbal) as (
            select c_custkey, c_custkey, 0, c_acctbal
            from customer where c_custkey < 10
            union all
            select c.c_custkey, t.root, t.depth + 1, c.c_acctbal
            from customer c
            join tree t
              on cast(floor(c.c_custkey / 10.0) as bigint) = t.custkey
            where c.c_custkey >= 10
        )
        select depth,
               count(*)               as n_nodes,
               count(distinct root)   as n_roots,
               sum(cast(round(acctbal * 100) as bigint))
                   / cast(100 as double) as bal_sum
        from tree
        group by depth
        order by depth
    """,
    # the conditional-aggregation idiom a Presto user writes for a
    # pivot (Presto has no PIVOT keyword) — proves Spark's native
    # pivot face computes exactly this
    "reshape_pivot": """
        select format_datetime(ts, 'yyyy-MM-dd')                as day,
               count(*) filter (where event_type = 'view')      as n_view,
               count(*) filter (where event_type = 'click')     as n_click,
               count(*) filter (where event_type = 'purchase')  as n_purchase,
               count(*) filter (where event_type = 'signup')    as n_signup,
               count(*) filter (where event_type = 'error')     as n_error
        from events
        group by format_datetime(ts, 'yyyy-MM-dd')
        order by day
    """,
    # the sequence() + UNNEST + outer-join spine — genuine Presto
    # gap-fill text, with the interval-stepped date sequence
    "ts_gap_fill": """
        with b as (
            select min(cast(ts as date)) as d0, max(cast(ts as date)) as d1
            from events
        ),
        u as (select distinct user_id from events),
        s as (
            select u.user_id, d.day
            from u
            cross join b
            cross join unnest(sequence(b.d0, b.d1, interval '1' day))
                as d(day)
        ),
        c as (
            select user_id, cast(ts as date) as day, count(*) as n
            from events
            group by user_id, cast(ts as date)
        )
        select s.user_id,
               format_datetime(cast(s.day as timestamp), 'yyyy-MM-dd') as day,
               coalesce(c.n, 0) as n_events
        from s
        left join c on s.user_id = c.user_id and s.day = c.day
        order by 1, 2
    """,
    # Trino spells the correlated derived table CROSS JOIN LATERAL;
    # Spark accepts the same text (and decorrelates it — see the
    # declared query's plan notes)
    "join_lateral_topn": """
        select o.o_orderkey, t.l_linenumber, t.l_quantity
        from orders o
        cross join lateral (
            select l_linenumber, l_quantity
            from lineitem
            where l_orderkey = o.o_orderkey
            order by l_quantity desc, l_linenumber
            limit 2
        ) t
        where o.o_orderkey < 2000
        order by o.o_orderkey, t.l_linenumber
    """,
    # Trino window navigation with IGNORE NULLS (§2 #154) — the
    # postfix `navigator(x) IGNORE NULLS OVER ...` spelling a Trino
    # user types runs NATIVELY on Spark 4 (frame exclusion at #155
    # does NOT: Spark has no EXCLUDE grammar — that divergence is
    # documented at the declared query, not papered over here).
    # Presto quantified array predicates (§2 #158) — any/all/none_match
    # go through the translator's exists/forall rewrites (dialect.py)
    "arr_match_predicates": """
        select doc_id,
               any_match(split(text, ' '), x -> length(x) > 6)   as any_long,
               all_match(split(text, ' '), x -> length(x) >= 2)  as all_ge2,
               none_match(split(text, ' '), x -> length(x) > 7) as none_huge,
               cast(cardinality(filter(split(text, ' '), x -> length(x) > 6))
                    as bigint)                                   as n_long
        from documents
        where doc_id < 400
    """,
    # Trino map_zip_with (§2 #159) — same builtin name on Spark; the
    # MAP(ARRAY, ARRAY) constructor goes through the translator
    "map_zip_with": """
        select doc_id,
               array_join(
                   array_sort(transform(
                       map_entries(map_zip_with(
                           MAP(ARRAY['chars', 'tokens'],
                               ARRAY[n_chars,
                                     cast(cardinality(split(text, ' ')) as bigint)]),
                           MAP(ARRAY['chars', 'tokens'],
                               ARRAY[cast(2 as bigint), cast(3 as bigint)]),
                           (k, v1, v2) -> v1 * v2)),
                       e -> concat(e.key, ':', cast(e.value as varchar)))),
                   ',') as weighted
        from documents
        where doc_id < 400
    """,
    "win_locf_fill": """
        select user_id, event_id,
               last_value(obs) ignore nulls over (
                   partition by user_id order by ts, event_id
                   rows between unbounded preceding and current row) as locf_value,
               last_value(obs) ignore nulls over (
                   partition by user_id order by ts, event_id
                   rows between unbounded preceding and 1 preceding)  as prev_obs,
               first_value(obs) ignore nulls over (
                   partition by user_id order by ts, event_id
                   rows between current row and unbounded following)  as nocb_value
        from (
            select user_id, event_id, ts,
                   case when event_type = 'purchase' then value end as obs
            from events
        )
    """,
}

#: non-default compare modes (see module docstring).
FACE_MODE: dict[str, str] = {
    "json_parse_format": "subset:event_id,parsed_k,arr_len",
    "approx_percentile": "tolerance",
}
