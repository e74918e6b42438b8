"""Map (§2.9 #117-122) and JSON (#123-127) functions.

Map results never reach the value-hash as raw MAP values (engine map
iteration order is unspecified) — they're emitted as sorted key lists,
unwrapped element lookups, or sorted 'k=v' strings.  DuckDB divergence
pinned: map subscript / element_at return a LIST (unwrap with [1]);
DuckDB 1.0 lacks map_filter/transform_values → oracles express the
same semantics over map_entries with list lambdas.

JSON: events.props is a JSON *string* (Presto's model: VARCHAR +
json_extract_scalar ≡ Spark get_json_object ≡ DuckDB
json_extract_string).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparketl.registry import query
from sparketl.tables import table

_M = "MAP {'n_chars': n_chars, 'n_tokens': cast(len(string_split(text, ' ')) as bigint)}"


@query(
    "map_build_access",
    oracle=f"""
        select doc_id,
               array_to_string(list_sort(map_keys({_M})), ',')   as keys_sorted,
               array_to_string(list_sort(map_values({_M})), ',') as vals_sorted,
               ({_M})['n_chars'][1]             as chars_val,
               (element_at({_M}, 'missing'))[1] as missing_val
        from documents
        where doc_id < 150
    """,
)
def map_build_access(spark, sf_dir):
    """#117, #118, #121: map_from_entries construction, map_keys /
    map_values (sorted before hashing), element_at with NULL-if-absent
    (try_element_at under ANSI; DuckDB subscript unwrapped via [1])."""
    d = table(spark, sf_dir, "documents")
    m = F.map_from_entries(
        F.array(
            F.struct(F.lit("n_chars").alias("key"), F.col("n_chars").alias("value")),
            F.struct(
                F.lit("n_tokens").alias("key"),
                F.size(F.split("text", " ")).cast("bigint").alias("value"),
            ),
        )
    )
    return d.where(F.col("doc_id") < 150).select(
        "doc_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.array_join(F.array_sort(F.map_values(m)), ",").alias("vals_sorted"),
        F.try_element_at(m, F.lit("n_chars")).alias("chars_val"),
        F.try_element_at(m, F.lit("missing")).alias("missing_val"),
    )


@query(
    "map_transform_filter",
    oracle=f"""
        select doc_id,
               array_to_string(list_sort(list_transform(map_entries({_M}),
                         e -> e.key || '=' || cast(e.value * 2 as varchar))), ',')   as doubled,
               coalesce(array_to_string(list_sort(list_transform(
                         list_filter(map_entries({_M}), e -> e.value > 200),
                         e -> e.key || '=' || cast(e.value as varchar))), ','), '')  as big_entries,
               array_to_string(list_sort(map_keys(map_concat({_M}, MAP {{'extra': cast(1 as bigint)}}))), ',')
                   as all_keys
        from documents
        where doc_id < 120
    """,
)
def map_transform_filter(spark, sf_dir):
    """#119, #120, #122: map_concat / map_filter / transform_values —
    results serialized to sorted 'k=v' strings so hashing never sees
    raw map order; DuckDB (no map_filter/transform_values in 1.0)
    mirrors the semantics over map_entries."""
    d = table(spark, sf_dir, "documents")
    m = F.map_from_entries(
        F.array(
            F.struct(F.lit("n_chars").alias("key"), F.col("n_chars").alias("value")),
            F.struct(
                F.lit("n_tokens").alias("key"),
                F.size(F.split("text", " ")).cast("bigint").alias("value"),
            ),
        )
    )
    kv = lambda k, v: F.concat(k, F.lit("="), v.cast("string"))  # noqa: E731
    return d.where(F.col("doc_id") < 120).select(
        "doc_id",
        F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(F.transform_values(m, lambda k, v: v * 2)),
                    lambda e: kv(e.key, e.value),
                )
            ),
            ",",
        ).alias("doubled"),
        F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(F.map_filter(m, lambda k, v: v > 200)),
                    lambda e: kv(e.key, e.value),
                )
            ),
            ",",
        ).alias("big_entries"),
        F.array_join(
            F.array_sort(
                F.map_keys(
                    F.map_concat(
                        m, F.create_map(F.lit("extra"), F.lit(1).cast("bigint"))
                    )
                )
            ),
            ",",
        ).alias("all_keys"),
    )


@query(
    "json_extract_scalar",
    oracle="""
        select event_id,
               json_extract_string(props, '$.k')                  as k_str,
               cast(json_extract(props, '$.k') as integer)        as k_int,
               json_extract_string(props, '$.absent')             as missing,
               cast(json_extract(props, '$.k') as integer) * 2    as k_doubled
        from events
        where event_id < 400
    """,
)
def json_extract_scalar(spark, sf_dir):
    """#123, #124: json_extract_scalar ≡ get_json_object (string out,
    NULL when path absent) + typed extraction via cast."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.where(F.col("event_id") < 400).select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
        F.get_json_object("props", "$.absent").alias("missing"),
        (k.cast("int") * 2).alias("k_doubled"),
    )


@query(
    "json_parse_format",
    oracle="""
        select event_id,
               cast(json_extract(props, '$.k') as integer)                    as parsed_k,
               to_json(struct_pack(event_id := event_id, event_type := event_type)) as as_json,
               json_array_length(to_json([event_id, user_id]))                as arr_len,
               coalesce(array_to_string(cast(json_keys(props) as varchar[]), ','), '') as obj_keys
        from events
        where event_id < 300
    """,
)
def json_parse_format(spark, sf_dir):
    """#125-127: json_parse+cast (from_json with schema), json_format
    (to_json of struct — compact, key-ordered by construction on both
    engines), json_array_length, json_object_keys."""
    ev = table(spark, sf_dir, "events")
    return ev.where(F.col("event_id") < 300).select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("parsed_k"),
        F.to_json(F.struct("event_id", "event_type")).alias("as_json"),
        F.json_array_length(F.to_json(F.array("event_id", "user_id"))).cast("bigint").alias("arr_len"),
        # coalesce('') on BOTH sides: DuckDB array_to_string over an
        # empty varchar[] yields NULL where Spark array_join yields '',
        # and json_keys of a NULL/non-object props is NULL on both —
        # pinned to '' so empty-object and null rows stay hash-equal
        F.coalesce(F.array_join(F.json_object_keys("props"), ","), F.lit("")).alias(
            "obj_keys"
        ),
    )


@query(
    "map_zip_with",
    oracle="""
        select doc_id,
               array_to_string(
                   list_sort([k || ':' ||
                              (map_extract(m1, k)[1] * map_extract(m2, k)[1])
                              for k in map_keys(m1)]),
                   ',') as weighted
        from (
            select doc_id,
                   MAP {'chars': n_chars,
                        'tokens': cast(len(string_split(text, ' ')) as bigint)} as m1,
                   MAP {'chars': cast(2 as bigint),
                        'tokens': cast(3 as bigint)} as m2
            from documents
            where doc_id < 400
        )
    """,
)
def map_zip_with(spark, sf_dir):
    """#159 Presto/Trino ``map_zip_with(m1, m2, (k, v1, v2) -> ...)``
    — key-aligned merge of two maps through a lambda, here a
    per-document stats map weighted by a constant weights map.  Spark
    has the SAME builtin (``F.map_zip_with``); DuckDB 1.0 does not,
    so the oracle composes the definition: iterate m1's keys,
    multiply the extracted values.  Both maps here share identical
    key sets; for the missing-key case Presto/Spark pass NULL for
    the absent side's value (lambda sees v2 = NULL) while the
    oracle's m1-keyed iteration would DROP keys present only in m2 —
    the composition is the equal-keys contract, stated rather than
    papered over.

    The zipped map ships as sorted ``k:v`` strings joined by ',' —
    map iteration order is engine-private on both sides, so the hash
    compares a canonical scalar, never raw map encodings (the
    maps-family convention).

    Scale: per-row narrow expression over bounded-size maps — no
    explode, no shuffle; at 100 TB this is a pure map-stage column."""
    docs = table(spark, sf_dir, "documents")
    t = docs.where(F.col("doc_id") < 400).select(
        "doc_id",
        F.create_map(
            F.lit("chars"),
            F.col("n_chars"),
            F.lit("tokens"),
            F.size(F.split(F.col("text"), " ")).cast("bigint"),
        ).alias("m1"),
        F.create_map(
            F.lit("chars"),
            F.lit(2).cast("bigint"),
            F.lit("tokens"),
            F.lit(3).cast("bigint"),
        ).alias("m2"),
    )
    zipped = F.map_zip_with("m1", "m2", lambda k, v1, v2: v1 * v2)
    return t.select(
        "doc_id",
        F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(zipped),
                    lambda e: F.concat(
                        e["key"], F.lit(":"), e["value"].cast("string")
                    ),
                )
            ),
            ",",
        ).alias("weighted"),
    )
