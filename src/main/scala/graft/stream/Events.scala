package graft.stream

import graft.pipeline.Report
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types._

/** Streaming operators over the events table (SURVEY.md §2B
  * "Streaming"): windowed aggregation, session windows, watermarked
  * late-data handling, stateful dedup, and the R15-analog report sink.
  *
  * Every transform below is written against plain DataFrames so the
  * SAME function serves batch (q60-q62, oracle-checked against DuckDB)
  * and streaming (MemoryStream equivalence tests in EventsStreamSpec) —
  * Structured Streaming's core contract is exactly this batch/stream
  * unification.
  *
  * Scale notes: windowed/session aggs shuffle on (window, key) with
  * partial aggregation map-side; watermarks bound state size (without
  * one, streaming state grows forever — the 100 TB-stream killer).
  * At production scale events would be date-partitioned parquet so the
  * batch path gets partition pruning, and the streaming path would set
  * maxFilesPerTrigger for admission control. */
object Events {

  /** On-disk schema of the events fixture for the STREAMING file source
    * (streaming reads cannot infer schema). `ts` is declared LongType
    * because the file stores TIMESTAMP(NANOS), which the session reads
    * as nanos-long under Tables.sessionConf — the conversion to a
    * micros TimestampType happens below, identically to the batch
    * loader Tables.events. */
  private val fileSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming file source over an events parquet directory — the
    * production entry point (MemoryStream is test-only). New files
    * appearing under `dir` become micro-batches; at 100 TB scale pair
    * with maxFilesPerTrigger for admission control and a date-
    * partitioned layout for pruning. */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(fileSchema)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Tumbling window aggregation per event type (fixed, non-overlapping
    * buckets). Money-style exact sum: DECIMAL accumulate, DOUBLE out. */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding window aggregation: width/slide overlapping buckets (an
    * event lands in width/slide windows). */
  def sliding(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n"), col("sum_value"))

  /** Session windows per user: a session extends while consecutive
    * events arrive within `gap`; an event at exactly start+gap opens a
    * NEW session (Spark's window end is exclusive). */
  def sessions(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Watermarked tumbling agg for streaming: rows later than `delay`
    * behind the max seen ts are dropped and their windows finalized.
    * (Watermark BEFORE groupBy — after it, it wouldn't bound state.) */
  def tumblingWithWatermark(events: DataFrame, width: String, delay: String): DataFrame =
    tumbling(events.withWatermark("ts", delay), width)

  /** Stateful exact-once dedup by event_id within the watermark
    * horizon: state for an id is dropped once the watermark passes it,
    * so state stays bounded while duplicates inside the lateness window
    * are still caught — the streaming analog of q50's content dedup. */
  def dedupWithinWatermark(events: DataFrame, delay: String): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** R15 analog, streaming: per micro-batch, render an HTML report of
    * the batch rows and write it — SKIPPING empty batches entirely
    * (R12's empty ⇒ no artifact, per batch). Artifacts land at
    * <outDir>/report-<batchId>.html. */
  def reportSink(aggregated: DataFrame, outDir: String): DataStreamWriter[Row] =
    aggregated.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Report.writeReport(batch, s"events batch $batchId",
          s"$outDir/report-$batchId.html")
        () // discard the Boolean — foreachBatch wants Unit
      }
}
