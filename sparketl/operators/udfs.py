"""UDF / UDAF / UDTF surface (SURVEY.md §2.12 #141-146).

Presto exposes plugin scalar/aggregate functions and (Trino) SQL
routines; an ETL tool wraps them.  Our Python-native equivalents are
the Arrow-vectorized pandas UDF family (patterns per SNIPPETS.md
pandas-UDF retrievals) plus Python UDTFs and ``spark.udf.register``.

Every query here is still oracle-checked: the UDF bodies are written
so their arithmetic is bit-reproducible in ANSI SQL — elementwise
double ops (IEEE-deterministic) and integer math only.  The one rule:
**never sum floats inside Python** (numpy uses pairwise summation,
which rounds differently from the sequential sums SQL engines use);
sums happen Spark-side in cents (see sparketl/functions/exact.py
policy) or over integers.

Scale notes: pandas UDFs cross the JVM<->Python Arrow boundary
(SURVEY.md §3.2 E3) — the slow path by design.  Each query keeps the
Python stage narrow (no shuffle inside Python, vectorized bodies, no
per-row Python calls) so the Arrow transfer is the only added cost;
everything before/after stays in Tungsten codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType

from sparketl.registry import query
from sparketl.tables import table

# ---------------------------------------------------------------------------
# #141 — scalar vectorized pandas UDF
# ---------------------------------------------------------------------------


@pandas_udf(DoubleType())  # DataType object: no session needed at import
def _discounted_price(price: pd.Series, discount: pd.Series) -> pd.Series:
    """Elementwise double math only — bit-identical to SQL
    ``l_extendedprice * (1 - l_discount)`` (no reductions in Python)."""
    return price * (1.0 - discount)


@query(
    "udf_pandas_scalar",
    oracle="""
        select l_returnflag,
               round(sum(cast(round(l_extendedprice * (1 - l_discount) * 100)
                              as bigint)) / cast(100 as double), 6) as revenue,
               count(*) as n
        from lineitem
        group by l_returnflag
    """,
)
def udf_pandas_scalar(spark, sf_dir):
    """#141 scalar pandas UDF: per-row revenue computed in an
    Arrow-batched Python worker, then exact-summed Spark-side in cents
    (the UDF does no reductions, so IEEE elementwise ops keep Spark ≡
    DuckDB bit-exact)."""
    li = table(spark, sf_dir, "lineitem")
    rev = _discounted_price(F.col("l_extendedprice"), F.col("l_discount"))
    return (
        li.withColumn("rev", rev)
        .groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.round(F.col("rev") * 100).cast("bigint"))
                / F.lit(100).cast("double"),
                6,
            ).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# #142 — grouped-map UDF (applyInPandas)
# ---------------------------------------------------------------------------


def _order_sequence(pdf: pd.DataFrame) -> pd.DataFrame:
    """Order history for a BUCKET of customers: per-customer sequence
    number + day gaps, computed with vectorized grouped ops (C-speed
    cumcount/diff — no Python loop per customer).  Integer/date math
    only; the (o_orderdate, o_orderkey) sort matches the oracle's
    window ordering."""
    pdf = pdf.sort_values(
        ["o_custkey", "o_orderdate", "o_orderkey"]
    ).reset_index(drop=True)
    g = pdf.groupby("o_custkey", sort=False)
    return pd.DataFrame(
        {
            "o_custkey": pdf["o_custkey"],
            "o_orderkey": pdf["o_orderkey"],
            "seq": g.cumcount() + 1,
            "days_since_prev": g["o_orderdate"].diff().dt.days,
        }
    )


@query(
    "udf_grouped_map_apply",
    oracle="""
        select o_custkey, o_orderkey,
               row_number() over (partition by o_custkey
                                  order by o_orderdate, o_orderkey) as seq,
               date_diff('day',
                         lag(o_orderdate) over (partition by o_custkey
                                                order by o_orderdate, o_orderkey),
                         o_orderdate) as days_since_prev
        from orders
    """,
)
def udf_grouped_map_apply(spark, sf_dir):
    """#142 grouped-map UDF: groupBy(custkey).applyInPandas computes
    each customer's order sequence imperatively (the shape used for
    per-key model scoring / featurization).  Oracle: the equivalent
    window SQL — provable because the UDF uses only integer/date math.

    Scale: the Spark group key is a SALTED BUCKET of customers
    (pmod(custkey, core count)), not the raw customer key — grouped-map
    UDFs pay a per-group Arrow/Python round-trip, so millions of tiny
    per-customer groups would drown in overhead (measured 30s -> ~1s
    at sf0.1 from this change alone; ~12ms per group even when empty,
    so the bucket count tracks ``defaultParallelism`` rather than a
    fixed 256).  Inside a bucket the per-key logic runs as vectorized
    pandas grouped ops.  Same pattern at 100 TB: bucket count tracks
    executor count, group payloads stay arrow-batch-sized, per-key
    semantics are preserved exactly.
    """
    orders = table(spark, sf_dir, "orders")
    n_buckets = spark.sparkContext.defaultParallelism
    return (
        orders.select("o_custkey", "o_orderkey", "o_orderdate")
        .groupBy(F.pmod(F.col("o_custkey"), F.lit(n_buckets)).alias("bucket"))
        .applyInPandas(
            lambda pdf: _order_sequence(pdf),
            schema="o_custkey long, o_orderkey long, seq int, days_since_prev long",
        )
    )


# ---------------------------------------------------------------------------
# #143 — grouped-agg UDF (UDAF)
# ---------------------------------------------------------------------------


@pandas_udf(LongType())
def _total_cents(price: pd.Series) -> int:
    """UDAF: exact money total as integer cents.  Rounding to cents
    happens elementwise (IEEE-deterministic); the reduction is over
    int64 (exact, order-independent)."""
    return int(price.mul(100.0).round().astype("int64").sum())


@pandas_udf(LongType())
def _count_rows(price: pd.Series) -> int:
    """Spark disallows mixing GROUPED_AGG pandas UDFs with built-in
    aggregates in one agg() — so the row count is a pandas UDAF too."""
    return len(price)


@query(
    "udf_grouped_agg_pandas",
    oracle="""
        select o_orderpriority,
               cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) as total_cents,
               count(*) as n_orders
        from orders
        group by o_orderpriority
    """,
)
def udf_grouped_agg_pandas(spark, sf_dir):
    """#143 grouped-agg pandas UDF (UDAF) usable inside ``agg``: exact
    integer-cents money total per order priority.  (pandas ``round``
    is banker's rounding, but cents after *100 are never exactly .5,
    so it agrees with SQL round — and the int64 reduction is exact.)
    """
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        _total_cents(F.col("o_totalprice")).alias("total_cents"),
        _count_rows(F.col("o_totalprice")).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# #144 — mapInPandas (map-partitions UDF)
# ---------------------------------------------------------------------------


def _high_value_events(batches):
    """Arrow-batch iterator filter/projection — value passes through
    untouched (no float math => bit-exact vs the SQL predicate)."""
    for pdf in batches:
        out = pdf[pdf["value"] > 100.0]
        yield out[["event_id", "user_id", "event_type", "value"]]


@query(
    "udf_map_in_pandas",
    oracle="""
        select event_id, user_id, event_type, value
        from events
        where value > 100.0
    """,
)
def udf_map_in_pandas(spark, sf_dir):
    """#144 mapInPandas: streaming per-partition Arrow batches through
    a Python filter/projector (the shape used for model inference over
    partitions).  No shuffle; partition count is preserved, so the
    Python stage parallelism equals the scan parallelism at any scale.
    """
    ev = table(spark, sf_dir, "events")
    return ev.mapInPandas(
        _high_value_events,
        schema="event_id long, user_id long, event_type string, value double",
    )


# ---------------------------------------------------------------------------
# #145 — Python UDTF (table function)
# ---------------------------------------------------------------------------


@query(
    "udf_python_udtf",
    oracle="""
        with t as (select doc_id, string_split(text, ' ') as toks
                   from documents where doc_id < 5)
        select doc_id, i as pos, toks[i] as term
        from t cross join unnest(generate_series(1, len(toks))) as u(i)
    """,
)
def udf_python_udtf(spark, sf_dir):
    """#145 Python UDTF: one input row -> N output rows (term
    positions), Presto's UNNEST-producing-function analogue.  Invoked
    laterally over a tiny slice (UDTFs are row-at-a-time Python — the
    genuinely slow path, kept off any hot query; the set-returning
    built-ins posexplode/explode cover the scale case, see
    arr_unnest)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, term string")
    class SplitTerms:
        def eval(self, doc_id: int, text: str):
            for i, term in enumerate(text.split(" "), start=1):
                yield doc_id, i, term

    spark.udtf.register("split_terms", SplitTerms)
    table(spark, sf_dir, "documents")  # ensure view registered
    return spark.sql(
        """
        select s.doc_id, s.pos, s.term
        from documents d, lateral split_terms(d.doc_id, d.text) s
        where d.doc_id < 5
        """
    )


# ---------------------------------------------------------------------------
# #146 — SQL-registered Python UDF
# ---------------------------------------------------------------------------


@query(
    "udf_sql_registered",
    oracle="""
        select p_partkey, p_brand,
               p_retailprice * 0.9 - 5.0 as net_price
        from part
        where p_size >= 40
    """,
)
def udf_sql_registered(spark, sf_dir):
    """#146 ``spark.udf.register``: a Python scalar function callable
    from the SQL entry point (E2).  Body is two IEEE double ops —
    bit-identical to the oracle expression.  Row-at-a-time Python (not
    Arrow): registered for API parity, used only on a pruned slice."""
    spark.udf.register(
        "net_price", lambda p: p * 0.9 - 5.0, returnType="double"
    )
    table(spark, sf_dir, "part")
    return spark.sql(
        """
        select p_partkey, p_brand, net_price(p_retailprice) as net_price
        from part
        where p_size >= 40
        """
    )
