"""Kafka-shaped streaming source (SURVEY.md §2.10 / §8 candidate).

Production ingestion for this engine is ``spark.readStream.format
("kafka")`` — but this container has no Kafka broker (and no
spark-sql-kafka package), so the source is provided as a SHIM with the
exact Kafka wire schema Spark's connector emits::

    key binary, value binary, topic string, partition int,
    offset long, timestamp timestamp, timestampType int

Two backends produce that shape:

* ``events_to_kafka_records`` — any events DataFrame (batch OR file
  stream) serialized into Kafka records (JSON value, key = user id).
  Deterministic, so the serialize→parse round-trip is oracle-graded
  (declared query ``stream_kafka_roundtrip``).
* ``read_rate_kafka_stream`` — the built-in ``rate`` source mapped to
  the wire schema: a LIVE unbounded stream with no external broker,
  proving the consume path runs under a real streaming query
  (tests/test_streaming.py).

Downstream code is backend-agnostic: ``parse_kafka_events`` is the
standard consume pattern (``cast(value as string)`` → ``from_json`` →
event-time watermark) and works identically on a real Kafka source —
swapping the shim for ``format("kafka").option("subscribe", ...)`` is
a one-line change, which is the point of keeping the wire schema
exact.

Scale: Kafka partition → Spark task is the native parallelism mapping;
``minPartitions`` would fan hot topic-partitions wider.  The JSON
value codec here is the fixture's; at 100 TB/day the value would be a
binary columnar codec (Avro/Proto) with a schema registry, parsed by
``from_avro`` — same plan shape, cheaper decode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: number of simulated topic partitions (keyed by user_id so per-user
#: order is preserved within a partition, exactly as a keyed producer)
N_TOPIC_PARTITIONS = 8

TOPIC = "events"

#: the value payload schema (event fields; ts carried as epoch micros —
#: lossless under JSON, no double-printing concerns for timestamps)
VALUE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_to_kafka_records(events: DataFrame) -> DataFrame:
    """Serialize a (batch or streaming) events DataFrame — columns
    ``event_id, ts (timestamp), user_id, event_type, value, props`` —
    into Kafka wire records.  Key = user_id bytes (keyed-producer
    semantics: one user always lands in one partition), offset =
    event_id (monotone per the fixture), timestamp = event time."""
    return events.select(
        F.col("user_id").cast("string").cast("binary").alias("key"),
        F.to_json(
            F.struct(
                F.col("event_id"),
                F.unix_micros(F.col("ts")).alias("ts_us"),
                F.col("user_id"),
                F.col("event_type"),
                F.col("value"),
                F.col("props"),
            )
        )
        .cast("binary")
        .alias("value"),
        F.lit(TOPIC).alias("topic"),
        F.pmod(F.col("user_id"), F.lit(N_TOPIC_PARTITIONS))
        .cast("int")
        .alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("ts").alias("timestamp"),
        F.lit(0).alias("timestampType"),  # CREATE_TIME
    )


def parse_kafka_events(records: DataFrame) -> DataFrame:
    """The standard Kafka consume pattern: value bytes → JSON → typed
    columns, event time restored from the payload (never from the
    broker timestamp).  Works on the shim and on a real Kafka source
    unchanged."""
    v = F.from_json(F.col("value").cast("string"), VALUE_SCHEMA)
    return records.select(
        F.col("partition").alias("kafka_partition"),
        F.col("offset").alias("kafka_offset"),
        v.getField("event_id").alias("event_id"),
        F.timestamp_micros(v.getField("ts_us")).alias("ts"),
        v.getField("user_id").alias("user_id"),
        v.getField("event_type").alias("event_type"),
        v.getField("value").alias("value"),
        v.getField("props").alias("props"),
    )


def read_rate_kafka_stream(
    spark: SparkSession, rows_per_second: int = 1000
) -> DataFrame:
    """LIVE unbounded Kafka-shaped stream off the built-in ``rate``
    source: synthetic events (user = value mod 97, one event type per
    residue class) serialized through the same producer path, so the
    whole consume pipeline — including ``parse_kafka_events`` and any
    downstream watermark/agg — runs under a genuine streaming query
    with no broker in the container."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", str(rows_per_second)
    ).load()  # columns: timestamp, value
    synthetic = rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        F.pmod(F.col("value"), F.lit(97)).alias("user_id"),
        F.when(F.pmod(F.col("value"), F.lit(3)) == 0, "click")
        .when(F.pmod(F.col("value"), F.lit(3)) == 1, "view")
        .otherwise("purchase")
        .alias("event_type"),
        (F.col("value") * F.lit(0.25)).alias("value"),
        F.lit('{"src":"rate"}').alias("props"),
    )
    return events_to_kafka_records(synthetic)
