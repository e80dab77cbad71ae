package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Event-time windowed aggregations over the events stream, in both batch
  * form (oracle-checked) and Structured Streaming form (watermarked; the
  * production path for unbounded input).
  *
  * The reference has no event-time semantics (its streaming track is a
  * synchronous op log — SURVEY §2.9); these operators are the
  * beyond-reference streaming surface a training-data pipeline needs:
  * ingestion-rate rollups, per-type monitoring windows.
  *
  * Money-safe aggregation: `value` is summed as integer cents
  * (cast(value * 100 as bigint) per row, then an exact integer sum) so
  * results hash-compare deterministically — float sums are
  * accumulation-order-dependent and would flap the driver's compare. */
object StreamingOps {

  /** Tumbling event-time windows: (ws, we, event_type, n_events,
    * value_cents). Batch form over the events table. */
  def eventsTumbling(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("value") * 100).cast("long")).as("value_cents"))
      .select(col("w.start").as("ws"), col("w.end").as("we"),
        col("event_type"), col("n_events"), col("value_cents"))

  /** Sliding (hopping) windows: every `slide`, looking back `windowLen`. */
  def eventsSliding(events: DataFrame, windowLen: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("value") * 100).cast("long")).as("value_cents"))
      .select(col("w.start").as("ws"), col("w.end").as("we"),
        col("event_type"), col("n_events"), col("value_cents"))

  /** Ordered conversion funnel over the event log: a user reaches step i
    * when they have a `steps(i)` event at-or-after their FIRST qualifying
    * step-(i−1) time (earliest-chain semantics — the standard funnel
    * definition; ties count, `>=`). Returns one row per user with an
    * integer reached_<step> flag per step. Each step is one filtered
    * aggregate joined to the previous step's reach — per-user state never
    * materializes event lists, so the plan is |steps| keyed aggregations
    * over filtered slices, all map-side combining; timestamps compare as
    * integer microseconds (no float, oracle-stable). */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // cast-through-timestamp accepts TIMESTAMP_NTZ sources (zone-free
    // parquet micros); only orderings/differences of t are used downstream
    val e = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts").cast("timestamp")).as("t"))
    val reaches = steps.zipWithIndex.foldLeft(List.empty[DataFrame]) {
      case (acc, (step, i)) =>
        val r =
          if (i == 0)
            e.where(col("event_type") === step)
              .groupBy("user_id").agg(min("t").as(s"t$i"))
          else
            e.where(col("event_type") === step)
              .join(acc.head.select(col("user_id"), col(s"t${i - 1}")), "user_id")
              .where(col("t") >= col(s"t${i - 1}"))
              .groupBy("user_id").agg(min("t").as(s"t$i"))
        r :: acc
    }.reverse
    steps.zip(reaches).foldLeft(e.select("user_id").distinct()) {
      case (df, (step, r)) =>
        df.join(r.select(col("user_id"), lit(1).as(s"reached_$step")),
          Seq("user_id"), "left")
          .withColumn(s"reached_$step", coalesce(col(s"reached_$step"), lit(0)))
    }
  }

  /** Streaming form of [[eventsTumbling]]: file source → watermark →
    * windowed agg. Late data beyond the watermark is dropped; state for
    * closed windows is evicted — the properties that let this run forever
    * on an unbounded stream. Reads the parquet's nano timestamps as long
    * (file schema) and converts in-stream, mirroring Tables.events. */
  def eventsTumblingStream(spark: SparkSession, path: String,
                           windowLen: String = "1 hour",
                           watermark: String = "2 hours"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema: StructType = spark.read.parquet(path).schema
    val raw = spark.readStream.schema(rawSchema).parquet(path)
    val events = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // zone-free micros: re-tag as instant (watermarks need TIMESTAMP)
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("value") * 100).cast("long")).as("value_cents"))
      .select(col("w.start").as("ws"), col("w.end").as("we"),
        col("event_type"), col("n_events"), col("value_cents"))
  }
}
