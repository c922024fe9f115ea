"""Structured Streaming: watermarked tumbling-window event rollups.

The streaming twin of ``plans.queries.q_event_windowed_counts`` — same
grouping (1-hour tumbling window x event_type), same output schema — fed by
a ``readStream`` over a landing directory of event parquet batches, with a
watermark bounding state: a window is finalized (emitted to the append sink
and dropped from the state store) once the watermark passes its end.

Scale notes: windowed aggregation is a partial-agg shuffle on
(window, event_type) — low cardinality, map-side combined; the state store
holds only open windows (watermark-bounded), so state size is
O(open_windows x event_types) regardless of input volume. This is the
canonical Structured Streaming plan and survives a 1000-executor deploy
unchanged (per-key state partitions with the shuffle).

Append-mode semantics (deliberate): windows newer than
``max(event ts) - watermark`` remain open and are NOT emitted until later
batches advance the watermark — the test asserts exactly that contract
against the batch query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_counts_stream(
    spark: SparkSession,
    input_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream(events) -> watermarked tumbling-window aggregate.

    Watermarks require TIMESTAMP (an instant), not TIMESTAMP_NTZ — so the
    NTZ event time is converted to an absolute instant via its tz-independent
    whole-second epoch (timestampdiff against the NTZ epoch literal, then
    timestamp_seconds). Window boundaries are whole hours, so the
    floor-to-second never moves an event across a window edge, and the
    emitted window_start epochs match the batch query exactly."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    from minhash_spark.functions.timeutil import ntz_epoch as _ntz

    ntz_epoch = _ntz("ts")
    win = F.window("ts_utc", window)
    epoch = F.unix_seconds(F.col("w.start"))
    return (
        stream.withColumn("ts_utc", F.timestamp_seconds(ntz_epoch))
        .withWatermark("ts_utc", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            epoch.alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Drain the landing dir (availableNow) into an append parquet sink of
    finalized windows. Restart-safe via the streaming checkpoint; re-calling
    after new files land emits only newly-closed windows."""
    agg = windowed_counts_stream(spark, input_dir, window=window, watermark=watermark)
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
