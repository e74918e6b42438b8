"""Date/time scalar functions (§2.9 #78-88) — the highest-risk family
for silent divergence (SURVEY.md §2.9): Presto's unit-string-first
``date_add/date_diff`` map to Spark ``timestampadd/timestampdiff``;
``day_of_week`` conventions differ (Spark ``dayofweek`` is 1=Sunday —
we use ``weekday()+1`` ≡ ISO ≡ DuckDB ``isodow``, verified §0.1).

Timestamp AND date outputs are emitted as formatted strings — never raw
TIMESTAMP or DATE — because the driver canonicalizes through pandas,
where DuckDB DATE surfaces as a midnight Timestamp while Spark DATE
surfaces as datetime.date (silent hash mismatch; found round 2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparketl.registry import query
from sparketl.tables import table


@query(
    "dt_trunc_extract",
    oracle="""
        select o_orderkey,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') as order_month,
               strftime(date_trunc('week',  o_orderdate), '%Y-%m-%d') as order_week,
               year(o_orderdate)    as y,
               month(o_orderdate)   as m,
               day(o_orderdate)     as d,
               quarter(o_orderdate) as q,
               hour(o_orderdate)    as h
        from orders
        where o_orderkey < 1500
    """,
)
def dt_trunc_extract(spark, sf_dir):
    """#78, #81: date_trunc (same unit-first shape in all three
    engines) + extract family."""
    o = table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") < 1500).select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("order_month"),
        F.date_format(F.date_trunc("week", "o_orderdate"), "yyyy-MM-dd").alias("order_week"),
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
        F.quarter("o_orderdate").cast("bigint").alias("q"),
        F.hour("o_orderdate").cast("bigint").alias("h"),
    )


@query(
    "dt_add_diff",
    oracle="""
        select o_orderkey,
               strftime(o_orderdate + interval 30 day, '%Y-%m-%d')  as due_date,
               strftime(o_orderdate - interval 2 month, '%Y-%m-%d') as lookback,
               date_diff('day', timestamp '1995-01-01', o_orderdate)  as days_since_epoch_start,
               date_diff('month', timestamp '1995-01-01', o_orderdate) as months_since
        from orders
        where o_orderkey < 1200
    """,
)
def dt_add_diff(spark, sf_dir):
    """#79, #80, #87: Presto date_add(unit, n, ts) ≡ Spark
    timestampadd / interval arithmetic; date_diff(unit, t1, t2) ≡
    Spark timestampdiff — SAME argument order (verified §0.1)."""
    o = table(spark, sf_dir, "orders")
    epoch0 = "timestamp '1995-01-01'"
    return o.where(F.col("o_orderkey") < 1200).select(
        "o_orderkey",
        F.date_format(F.expr("timestampadd(DAY, 30, o_orderdate)"), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.col("o_orderdate") - F.expr("interval 2 month"), "yyyy-MM-dd").alias("lookback"),
        F.expr(f"timestampdiff(DAY, {epoch0}, o_orderdate)").alias("days_since_epoch_start"),
        F.expr(f"timestampdiff(MONTH, {epoch0}, o_orderdate)").alias("months_since"),
    )


@query(
    "dt_day_of_week_year",
    oracle="""
        select l_orderkey, l_linenumber,
               isodow(l_shipdate)      as dow_iso,
               dayofyear(l_shipdate)   as doy,
               weekofyear(l_shipdate)  as woy,
               strftime(last_day(l_shipdate), '%Y-%m-%d') as month_end
        from lineitem
        where l_orderkey < 250
    """,
)
def dt_day_of_week_year(spark, sf_dir):
    """#82: ISO day-of-week via weekday()+1 (Spark dayofweek is
    1=Sunday — the flagged trap); dayofyear/weekofyear are ISO in
    both."""
    li = table(spark, sf_dir, "lineitem")
    return li.where(F.col("l_orderkey") < 250).select(
        "l_orderkey",
        "l_linenumber",
        (F.weekday("l_shipdate") + 1).cast("bigint").alias("dow_iso"),
        F.dayofyear("l_shipdate").cast("bigint").alias("doy"),
        F.weekofyear("l_shipdate").cast("bigint").alias("woy"),
        F.date_format(F.last_day("l_shipdate"), "yyyy-MM-dd").alias("month_end"),
    )


@query(
    "dt_unixtime",
    oracle="""
        select o_orderkey,
               cast(epoch(o_orderdate) as bigint) as epoch_sec,
               strftime(make_timestamp(cast(epoch(o_orderdate) as bigint) * 1000000
                                       + 43200000000),
                        '%Y-%m-%d %H:%M:%S') as noon_after
        from orders
        where o_orderkey < 800
    """,
)
def dt_unixtime(spark, sf_dir):
    """#83 to_unixtime/from_unixtime.  Spark from_unixtime returns a
    STRING (trap) — we use timestamp_seconds for the typed path, then
    format; oracle mirrors via make_timestamp(µs) (DuckDB to_timestamp
    returns a tz-aware value, avoided)."""
    o = table(spark, sf_dir, "orders")
    epoch_sec = F.unix_timestamp("o_orderdate")
    return o.where(F.col("o_orderkey") < 800).select(
        "o_orderkey",
        epoch_sec.alias("epoch_sec"),
        F.date_format(
            F.timestamp_seconds(epoch_sec + 43200), "yyyy-MM-dd HH:mm:ss"
        ).alias("noon_after"),
    )


@query(
    "dt_parse_format",
    oracle="""
        select o_orderkey,
               strftime(o_orderdate, '%Y/%m')  as ym,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') as full_str,
               strftime(strptime(strftime(o_orderdate, '%d|%m|%Y'), '%d|%m|%Y'), '%Y-%m-%d')
                   as roundtrip_date,
               strftime(cast('1997-06-15' as timestamp), '%Y-%m-%d') as fixed_date
        from orders
        where o_orderkey < 600
    """,
)
def dt_parse_format(spark, sf_dir):
    """#84, #85, #88: format_datetime ≡ date_format (Java patterns) ≡
    strftime; parse_datetime ≡ to_timestamp — patterns differ per
    engine (Joda vs Java vs C) so each side uses its own dialect of
    the SAME format, asserted equal via the roundtrip."""
    o = table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") < 600).select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy/MM").alias("ym"),
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("full_str"),
        F.date_format(
            F.to_timestamp(F.date_format("o_orderdate", "dd|MM|yyyy"), "dd|MM|yyyy"),
            "yyyy-MM-dd",
        ).alias("roundtrip_date"),
        F.date_format(F.lit("1997-06-15").cast("timestamp"), "yyyy-MM-dd").alias("fixed_date"),
    )


@query(
    "dt_to_date",
    oracle="""
        select o_orderkey,
               strftime(cast(o_orderdate as date), '%Y-%m-%d') as order_date,
               strftime(strptime('2000-' || lpad(cast(month(o_orderdate) as varchar), 2, '0')
                                 || '-01', '%Y-%m-%d')::date, '%Y-%m-%d') as month_anchor
        from orders
        where o_orderkey <= 1000
    """,
)
def dt_to_date(spark, sf_dir):
    """#88 to_date / date cast: timestamp→date cast plus to_date over a
    formatted string (Java DateTimeFormatter vs strptime — pattern
    strings differ, semantics pinned equal here).  Dates are emitted as
    formatted strings per the §5 determinism rules."""
    o = table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias(
            "order_date"
        ),
        F.date_format(
            F.to_date(
                F.concat(
                    F.lit("2000-"),
                    F.lpad(F.month("o_orderdate").cast("string"), 2, "0"),
                    F.lit("-01"),
                ),
                "yyyy-MM-dd",
            ),
            "yyyy-MM-dd",
        ).alias("month_anchor"),
    )


@query(
    "dt_timezone_iso",
    oracle="""
        select event_id,
               strftime(timezone('America/Los_Angeles',
                        cast(ts as timestamp) AT TIME ZONE 'UTC'),
                        '%Y-%m-%d %H:%M:%S') as la_wall,
               strftime(cast(timezone('Asia/Tokyo', cast(ts as timestamp))
                             as timestamp),
                        '%Y-%m-%d %H:%M:%S') as tokyo_instant,
               strftime(cast(ts as timestamp),
                        '%Y-%m-%dT%H:%M:%S.%g') as iso_ts
        from events
        where event_id < 4000
    """,
)
def dt_timezone_iso(spark, sf_dir):
    """#85 extension (r9 verdict #1): the Presto time-zone / ISO 8601
    family under the UTC-pinned session — ``AT TIME ZONE`` (instant
    kept, wall clock moved: from_utc_timestamp), ``with_timezone``
    (wall clock declared to be zone-local, instant moved:
    to_utc_timestamp), and ``to_iso8601`` at Presto's millis
    precision.  The dialect front door rewrites the Presto spellings
    to exactly these compositions (sparketl/dialect.py
    ``_rewrite_at_time_zone`` + the with_timezone/to_iso8601/
    from_iso8601_*/parse_duration entries; execution-backed reference
    values in tests/test_dialect.py).  DuckDB grades with its native
    two-direction ``timezone()`` builtin — an independent tz database
    consumer, so a DST-boundary slip on either side mismatches.

    Outputs are formatted strings per the §5 determinism rules (raw
    TIMESTAMP canonicalization diverges between engines).

    Scale: pure per-row codegen expressions over one scan — no
    shuffle, no UDF; the tz conversion is a JVM ZoneId lookup
    inside whole-stage codegen."""
    ev = table(spark, sf_dir, "events")
    return ev.where(F.col("event_id") < 4000).select(
        "event_id",
        F.date_format(
            F.from_utc_timestamp("ts", "America/Los_Angeles"),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("la_wall"),
        F.date_format(
            F.to_utc_timestamp("ts", "Asia/Tokyo"), "yyyy-MM-dd HH:mm:ss"
        ).alias("tokyo_instant"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSS").alias("iso_ts"),
    )


@query(
    "dt_mysql_format",
    oracle="""
        select event_id,
               strftime(cast(ts as timestamp), '%Y-%m-%d %H:%M:%S')
                   as full_str,
               strftime(cast(ts as timestamp), '%A %B %d') as words,
               strftime(cast(ts as timestamp), '%I:%M %p') as twelve,
               strftime(cast(ts as timestamp), '%j') as doy
        from events
        where event_id < 3000
    """,
)
def dt_mysql_format(spark, sf_dir):
    """#84-#85 extension (r10): Presto's MYSQL-pattern ``date_format``
    through the dialect front door — the same call name as Spark's
    Java-pattern function, the worst silent-garbage trap in the
    datetime family (``'%Y'`` read as Java is literal-percent +
    week-year).  The translator rewrites the %-specifiers one-by-one
    (sparketl/dialect.py ``_mysql_to_java``; property-differentialed
    against Python strftime in tests/test_property_dialect.py);
    DuckDB grades with its own C-style strftime — a THIRD independent
    implementation of the specifier table, covering zero-padded
    numerics, full weekday/month names, the 12-hour clock with
    AM/PM, and 3-digit day-of-year.

    Scale: pure per-row codegen expressions over one scan — no
    shuffle, no UDF."""
    from sparketl import dialect
    from sparketl.tables import load_tables

    load_tables(spark, sf_dir)
    return dialect.sql(
        spark,
        """
        select event_id,
               date_format(ts, '%Y-%m-%d %H:%i:%s') as full_str,
               date_format(ts, '%W %M %d') as words,
               date_format(ts, '%h:%i %p') as twelve,
               date_format(ts, '%j') as doy
        from events
        where event_id < 3000
        """,
    )
