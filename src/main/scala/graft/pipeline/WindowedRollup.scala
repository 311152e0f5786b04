package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.config.PipelineConfig
import graft.ingest.EventSource
import graft.model.Schemas

/** Native watermarked tumbling-window aggregation — the built-in
  * Structured Streaming counterpart of the foreachBatch MV pipeline.
  *
  * [[MaterializedPipeline]] mirrors the reference's SummingMergeTree
  * design: append partial aggregates forever, re-sum on read, accept
  * unbounded lateness. This operator is the other point in the design
  * space: `groupBy(window(ts), level)` + watermark, append mode — each
  * window is emitted exactly once, *finalized*, when the watermark
  * passes its end. Readers get final totals with no re-aggregation;
  * the price is that events later than `lateness` are dropped. At
  * scale the state store holds only open windows (bounded by lateness,
  * not by stream length).
  */
object WindowedRollup {

  /** queue topic -> hourly (window, level) counts, finalized-on-emit.
    * Output columns: hour_start_us, hour_end_us, level, total.
    */
  def start(spark: SparkSession, cfg: PipelineConfig,
      topicKey: String = "event_tracking",
      lateness: String = "10 minutes",
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val queue = EventSource.wellFormed(
      EventSource.decode(
        EventSource.streamRaw(spark, cfg, topicKey, maxFilesPerTrigger),
        Schemas.queueRecord))
    queue
      .select(timestamp_seconds(col("timestamp")).as("ts"),
        col("level"))
      .filter(col("ts").isNotNull && col("level").isNotNull)
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("level"))
      .agg(count(lit(1)).as("total"))
      .select(unix_micros(col("window.start")).as("hour_start_us"),
        unix_micros(col("window.end")).as("hour_end_us"),
        col("level"), col("total"))
      .writeStream
      .queryName("windowed_rollup")
      .option("checkpointLocation", cfg.checkpointDir("windowed_rollup"))
      .trigger(trigger)
      .format("parquet")
      .option("path", cfg.tablePath("hourly_final"))
      .outputMode(OutputMode.Append())
      .start()
  }

  /** Batch view of the finalized hourly table. */
  def hourlyFinal(spark: SparkSession, cfg: PipelineConfig): DataFrame =
    spark.read.schema("hour_start_us BIGINT, hour_end_us BIGINT, " +
        "level STRING, total BIGINT")
      .parquet(cfg.tablePath("hourly_final"))
}
