"""Array functions + higher-order lambdas (§2.9 #99-116).

Order-sensitivity policy: Spark's array_distinct / array_intersect /
array_union keep first-occurrence order while DuckDB's list_* variants
don't guarantee one — every set-ish result is wrapped in array_sort on
BOTH sides before it reaches the value-hash (SURVEY.md §5).

DuckDB divergences pinned: list_position returns NULL (not 0) for
absent elements → coalesce; list_slice takes a STOP index, not a
length (#108); list_aggregate('sum') on ints returns hugeint → cast.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparketl.registry import query
from sparketl.tables import table


def _tokens():
    return F.split(F.col("text"), " ")


_TOK = "string_split(text, ' ')"


@query(
    "arr_basics",
    oracle=f"""
        select doc_id,
               cast(len({_TOK}) as bigint)                     as n_tokens,
               ({_TOK})[3]                                     as third_token,
               ({_TOK})[999]                                   as oob_token,
               cast(coalesce(list_position({_TOK}, 'value'), 0) as bigint) as value_pos,
               list_contains({_TOK}, 'data')                   as has_data
        from documents
        where doc_id < 200
    """,
)
def arr_basics(spark, sf_dir):
    """#99-102: cardinality, element_at (1-based, NULL out-of-bounds —
    ANSI mode needs try_element_at), array_position (0 when absent, ≡
    Presto; DuckDB NULL → coalesce), contains."""
    d = table(spark, sf_dir, "documents")
    toks = _tokens()
    return d.where(F.col("doc_id") < 200).select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.try_element_at(toks, F.lit(3)).alias("third_token"),
        F.try_element_at(toks, F.lit(999)).alias("oob_token"),
        F.array_position(toks, "value").cast("bigint").alias("value_pos"),
        F.array_contains(toks, "data").alias("has_data"),
    )


@query(
    "arr_sort_dedup",
    oracle=f"""
        select doc_id,
               coalesce(array_to_string(list_sort(list_distinct({_TOK})), ','), '') as vocab,
               cast(len(list_distinct({_TOK})) as bigint)      as n_distinct,
               list_sort({_TOK})[1]                            as min_token
        from documents
        where doc_id < 150
    """,
)
def arr_sort_dedup(spark, sf_dir):
    """#103, #105, #106: array_distinct + array_sort (sorted on both
    sides — Spark preserves first-occurrence order, DuckDB doesn't);
    array_min via sorted head.  Array results are serialized with
    array_join in the final select: the driver's canonicalizer hashes
    through pandas, where a list cell is unhashable
    (CORRECTNESS_r01.json agg_array_agg error)."""
    d = table(spark, sf_dir, "documents")
    toks = _tokens()
    return d.where(F.col("doc_id") < 150).select(
        "doc_id",
        F.array_join(F.array_sort(F.array_distinct(toks)), ",").alias("vocab"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        F.array_min(toks).alias("min_token"),
    )


@query(
    "arr_set_ops",
    oracle="""
        select doc_id,
               coalesce(array_to_string(list_sort(list_intersect(generate_series(1, 1 + doc_id % 5),
                                        generate_series(2, 6))), ','), '') as inter,
               coalesce(array_to_string(list_sort(list_distinct(generate_series(1, 1 + doc_id % 5)
                                       || generate_series(2, 6))), ','), '') as uni,
               coalesce(array_to_string(list_sort(list_filter(generate_series(1, 1 + doc_id % 5),
                                     x -> not list_contains(generate_series(2, 6), x))), ','), '') as minus,
               list_has_any(generate_series(1, 1 + doc_id % 5),
                            generate_series(4, 6))                          as overlaps
        from documents
        where doc_id < 120
    """,
)
def arr_set_ops(spark, sf_dir):
    """#104, #109, #115: array_intersect/union/except + arrays_overlap
    + sequence.  DuckDB lacks list_except → expressed as filter(not
    contains), which is the identical multiset-distinct semantics
    here; everything sorted before hashing, then joined to a string
    (pandas-canon can't hash list cells)."""
    d = table(spark, sf_dir, "documents")
    a = F.sequence(F.lit(1), (F.col("doc_id") % 5 + 1).cast("int"))
    b = F.sequence(F.lit(2), F.lit(6))
    return d.where(F.col("doc_id") < 120).select(
        "doc_id",
        F.array_join(F.array_sort(F.array_intersect(a, b)), ",").alias("inter"),
        F.array_join(F.array_sort(F.array_union(a, b)), ",").alias("uni"),
        F.array_join(F.array_sort(F.array_except(a, b)), ",").alias("minus"),
        F.arrays_overlap(a, F.sequence(F.lit(4), F.lit(6))).alias("overlaps"),
    )


@query(
    "arr_slice_join_zip",
    oracle=f"""
        select doc_id,
               coalesce(array_to_string(list_slice({_TOK}, 2, 4), ','), '') as middle,
               array_to_string(list_slice({_TOK}, 1, 5), '-')  as head_joined,
               coalesce(array_to_string(
                   flatten([list_slice({_TOK}, 1, 2), list_slice({_TOK}, 3, 4)]), ','), '') as refl,
               array_to_string(
                   list_transform(list_zip(generate_series(1, 3), generate_series(4, 6)),
                                  s -> s[1] * 10 + s[2]), ',') as zipped
        from documents
        where doc_id < 100
    """,
)
def arr_slice_join_zip(spark, sf_dir):
    """#107, #108, #110, #111: slice (Spark start+LENGTH vs DuckDB
    start+STOP — the flagged #108 trap), array_join, flatten, zip
    (via zip_with ≡ list_zip+transform so struct field naming never
    reaches the hash)."""
    d = table(spark, sf_dir, "documents")
    toks = _tokens()
    return d.where(F.col("doc_id") < 100).select(
        "doc_id",
        F.array_join(F.slice(toks, 2, 3), ",").alias("middle"),
        F.array_join(F.slice(toks, 1, 5), "-").alias("head_joined"),
        F.array_join(
            F.flatten(F.array(F.slice(toks, 1, 2), F.slice(toks, 3, 2))), ","
        ).alias("refl"),
        F.array_join(
            F.zip_with(
                F.sequence(F.lit(1), F.lit(3)),
                F.sequence(F.lit(4), F.lit(6)),
                lambda x, y: x * 10 + y,
            ),
            ",",
        ).alias("zipped"),
    )


@query(
    "arr_lambda",
    oracle="""
        select p_partkey,
               array_to_string(list_transform(generate_series(1, p_size % 6 + 2), x -> x * x), ',') as squares,
               coalesce(array_to_string(list_filter(generate_series(1, p_size % 6 + 2), x -> x % 2 = 0), ','), '') as evens,
               cast(list_aggregate(generate_series(1, p_size % 6 + 2), 'sum') as bigint) as total
        from part
        where p_partkey < 300
    """,
)
def arr_lambda(spark, sf_dir):
    """#112-114: transform / filter / reduce(aggregate) — same lambda
    SQL in Spark; DuckDB reduce-with-init is list_aggregate."""
    p = table(spark, sf_dir, "part")
    seq = F.sequence(F.lit(1), (F.col("p_size") % 6 + 2).cast("int"))
    return p.where(F.col("p_partkey") < 300).select(
        "p_partkey",
        F.array_join(F.transform(seq, lambda x: x * x), ",").alias("squares"),
        F.array_join(F.filter(seq, lambda x: x % 2 == 0), ",").alias("evens"),
        F.aggregate(
            seq, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("total"),
    )


@query(
    "arr_unnest",
    oracle=f"""
        select doc_id, unnest({_TOK}) as token
        from documents
        where doc_id < 60
    """,
)
def arr_unnest(spark, sf_dir):
    """#116 UNNEST ≡ explode (lateral) — the row-generating path every
    token-level operator (tf-idf, dedup shingles) builds on."""
    d = table(spark, sf_dir, "documents")
    return d.where(F.col("doc_id") < 60).select(
        "doc_id", F.explode(_tokens()).alias("token")
    )


@query(
    "arr_embedding_norm",
    oracle="""
        select vec_id,
               cast(len(embedding) as bigint) as dim,
               round(sqrt(list_aggregate(
                   list_transform(embedding, x -> cast(x as double) * cast(x as double)),
                   'sum')), 6) as l2_norm
        from embeddings
        where vec_id < 100
    """,
)
def arr_embedding_norm(spark, sf_dir):
    """#99 + #112/#114 on the real vector column: L2 norm via
    transform+aggregate — the building block for #137 cosine top-k.
    float→double per element BEFORE multiplying, mirrored in the
    oracle, keeps the fold bit-exact."""
    e = table(spark, sf_dir, "embeddings")
    sq = F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double"))
    return e.where(F.col("vec_id") < 100).select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(
            F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)), 6
        ).alias("l2_norm"),
    )


@query(
    "arr_zip_pairs",
    oracle="""
        with t as (
            select p_partkey,
                   string_split(p_name, ' ') as words,
                   generate_series(1, len(string_split(p_name, ' '))) as idxs
            from part
            where p_partkey <= 200
        )
        select p_partkey, i as pos, words[i] as word
        from t cross join unnest(idxs) as u(i)
    """,
)
def arr_zip_pairs(spark, sf_dir):
    """#111 zip(a, b): Spark ``arrays_zip`` pairs an index array with a
    word array, exploded to rows.  DuckDB 1.0's ``list_zip`` yields
    unnamed structs (unextractable by key), so the oracle states the
    same pairing via an ordinality join — semantics, not syntax."""
    part = table(spark, sf_dir, "part")
    t = part.where(F.col("p_partkey") <= 200).select(
        "p_partkey",
        F.split("p_name", " ").alias("words"),
    )
    zipped = t.select(
        "p_partkey",
        F.explode(
            F.arrays_zip(
                F.sequence(F.lit(1), F.size("words")).alias("pos"),
                F.col("words").alias("word"),
            )
        ).alias("z"),
    )
    return zipped.select(
        "p_partkey", F.col("z.pos").alias("pos"), F.col("z.word").alias("word")
    )


@query(
    "arr_struct_lambda",
    oracle="""
        with w as (
            select p_partkey, unnest(string_split(p_name, ' ')) as word
            from part where p_partkey <= 200
        ),
        f as (
            select p_partkey, word, len(word) as l
            from w where len(word) >= 4
        )
        select p_partkey,
               array_to_string(
                   array_agg(word || ':' || l order by l desc, word asc),
                   ',') as packed
        from f
        group by p_partkey
    """,
)
def arr_struct_lambda(spark, sf_dir):
    """Presto arrays-of-ROWs surface: build an array of named structs
    from scalar columns, filter by field, sort with a two-key lambda
    COMPARATOR (length desc, word asc), and read fields back out —
    the nested-row manipulation ETL over semi-structured data leans
    on.  The oracle states the same result relationally (unnest →
    filter → ordered array_agg), so the struct plumbing is graded on
    semantics, not syntax.

    Scale: all higher-order functions here are per-row narrow
    expressions inside codegen — no explode, no shuffle."""
    part = table(spark, sf_dir, "part")
    expr = (
        "array_sort("
        "  filter(transform(split(p_name, ' '), "
        "         w -> struct(w as word, length(w) as len)), "
        "         s -> s.len >= 4), "
        "  (a, b) -> case when a.len > b.len then -1 "
        "                 when a.len < b.len then 1 "
        "                 when a.word < b.word then -1 "
        "                 when a.word > b.word then 1 else 0 end)"
    )
    t = part.where(F.col("p_partkey") <= 200).select(
        "p_partkey", F.expr(expr).alias("structs")
    )
    return t.where(F.size("structs") > 0).select(
        "p_partkey",
        F.array_join(
            F.transform(
                F.col("structs"),
                lambda s: F.concat(
                    s["word"], F.lit(":"), s["len"].cast("string")
                ),
            ),
            ",",
        ).alias("packed"),
    )


@query(
    "arr_ngrams",
    oracle="""
        select doc_id,
               array_to_string(
                   [array_to_string(w[i : i + 1], ' ')
                    for i in range(1, len(w))], ',')     as bigrams,
               array_to_string(
                   [array_to_string(w[i : i + 2], ' ')
                    for i in range(1, len(w) - 1)], ',') as trigrams,
               cast(len(w) - 1 as int)                   as n_bigrams
        from (
            select doc_id, string_split(text, ' ')[1:8] as w
            from documents
            where doc_id < 300
        )
    """,
)
def arr_ngrams(spark, sf_dir):
    """#156 Presto ``ngrams(array, n)`` — sliding n-element windows
    over an array, here word bi/trigrams of each document's leading
    tokens (the shingling primitive the MinHash dedup family builds
    on, exposed as the engine-level array function Presto users call
    directly).  Spark
    has no ngrams builtin: composed as ``transform(sequence(1,
    size(w)-n+1), i -> slice(w, i, n))`` — a per-row narrow
    expression.  DuckDB oracle composes the same windows with a list
    comprehension over end-exclusive ``range`` (bounds differ by one
    from Spark's inclusive ``sequence`` — spelled explicitly on both
    sides so the off-by-one is reviewable, the round-4 lesson on
    silent bound divergence).

    Grams are flattened to joined strings (gram words by ' ', grams
    by ',') so the hash compares scalar text, not nested-list
    encodings.  The window is the first 8 tokens of each document
    (every fixture doc has >= 10, so size(w) = 8 and the
    descending-``sequence`` footgun — sequence(1,0) = [1,0], slice
    start 0 — can't fire; the fixture's 2-word p_name DID fire it,
    which is why this runs on documents); the WHERE bounds the
    driver collect.

    Scale: pure codegen-side per-row expression — no explode, no
    shuffle; the gram count per row is size-bounded, so output width
    is O(window tokens), independent of row count.  The token window
    is PROJECTED once and the lambdas reference the column — an
    expression inlined into transform() re-evaluates per sequence
    element (the llm_common shingle lesson: ~15 full text splits per
    row here; hoisting is the codebase idiom)."""
    docs = table(spark, sf_dir, "documents")
    win = docs.where(F.col("doc_id") < 300).select(
        "doc_id",
        F.slice(F.split(F.col("text"), " "), 1, 8).alias("w"),
    )
    w = F.col("w")
    # greatest(.., 1) floor matches the dialect ngrams rewrite (ADVICE
    # r9): a window shorter than n must yield [w] — without the floor,
    # sequence(1, <=0) DESCENDS ([1, 0]) and slice(w, 0, n) errors.
    # The fixture's >=10-token docs never fire it (asserted in tests);
    # the floor makes the operator total, not fixture-dependent.
    grams = lambda n: F.array_join(  # noqa: E731
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
        ",",
    )
    return win.select(
        "doc_id",
        grams(2).alias("bigrams"),
        grams(3).alias("trigrams"),
        (F.size(w) - 1).cast("int").alias("n_bigrams"),
    )


@query(
    "arr_match_predicates",
    oracle="""
        select doc_id,
               len(list_filter(w, x -> length(x) > 6)) > 0      as any_long,
               len(list_filter(w, x -> length(x) >= 2)) = len(w) as all_ge2,
               len(list_filter(w, x -> length(x) > 7)) = 0      as none_huge,
               cast(len(list_filter(w, x -> length(x) > 6)) as bigint) as n_long
        from (
            select doc_id, string_split(text, ' ') as w
            from documents
            where doc_id < 400
        )
    """,
)
def arr_match_predicates(spark, sf_dir):
    """#158 Presto quantified array predicates — ``any_match`` /
    ``all_match`` / ``none_match(arr, lambda)``: does any / every / no
    token satisfy the predicate.  Spark spells them ``exists`` and
    ``forall`` (none = NOT exists); all three short-circuit per row.
    DuckDB 1.0 has none of the quantifiers, so the oracle states each
    as a ``list_filter`` cardinality identity (any = filtered > 0,
    all = filtered = len, none = filtered = 0) — the definitional
    form, immune to quantifier-semantics drift; the filtered COUNT
    ships as a fourth column anchoring any_long, and the thresholds
    are chosen from the measured token-length distribution (max 8)
    so every boolean column takes BOTH values over the corpus —
    branch coverage asserted in tests (review-caught: an early >15
    threshold made none_match constant-True, a gate a broken
    quantifier rewrite could pass).

    NULL caveat (documented, not exercised: fixture tokens are
    non-null): SQL quantifiers are three-valued — any_match over
    (false, NULL) is NULL, not false; Spark's exists/forall and
    Presto agree, the cardinality spelling does NOT (a NULL
    predicate row just drops from the filter), so the oracle twin is
    value-equal only on non-null predicate inputs like these.

    Scale: per-row short-circuit scan inside codegen — no explode,
    no shuffle, output one row per input row."""
    docs = table(spark, sf_dir, "documents")
    t = docs.where(F.col("doc_id") < 400).select(
        "doc_id", F.split(F.col("text"), " ").alias("w")
    )
    w = F.col("w")
    return t.select(
        "doc_id",
        F.exists(w, lambda x: F.length(x) > 6).alias("any_long"),
        F.forall(w, lambda x: F.length(x) >= 2).alias("all_ge2"),
        (~F.exists(w, lambda x: F.length(x) > 7)).alias("none_huge"),
        F.size(F.filter(w, lambda x: F.length(x) > 6))
        .cast("bigint")
        .alias("n_long"),
    )
