package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface: the streaming twins of the batch
  * time-series operators. The reference is batch-only (SURVEY.md §2.10);
  * these exist for the engine's stream-ingest path and are exercised by
  * `StreamingSpec` with a file source + memory sink.
  *
  * Contract: same logical aggregation as `TimeSeriesOps.tumblingAgg`, so a
  * backfill (batch) and the live stream produce identical rollups — the
  * kappa-architecture invariant, asserted in the spec.
  */
object EventStreams {

  /** Convert the raw nanosecond `ts` long (see `Tables.events`) to a
    * microsecond timestamp on a streaming frame.
    */
  def withEventTime(raw: DataFrame): DataFrame =
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Hourly tumbling rollup per event type with a 2h watermark for late
    * data. State is bounded: watermark evicts windows older than
    * max(event_time) - 2h at each trigger.
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))
}
