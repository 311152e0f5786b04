package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.agg.{CountMinState, CountMinStore, QuantileStore, SketchStore}
import graft.config.PipelineConfig
import graft.ingest.EventSource
import graft.model.Schemas

/** Streaming maintenance of the full mergeable-state family — the MV
  * pattern of [[MaterializedPipeline]] (per-block partials appended to
  * a store, read-side merge) generalized from additive counts to
  * SKETCH states, i.e. the AggregatingMergeTree version of the
  * reference's SummingMergeTree flagship (kafka+clickhouse.md:205-211
  * with AggregateFunction states in place of plain sums).
  *
  * One streaming query maintains three stores over the same queue,
  * each answering a question additive partials cannot:
  *  - distinct messages per (day, level)   — HLL states ([[SketchStore]])
  *  - message-length quantiles per key     — GK states ([[QuantileStore]])
  *  - per-message frequency probes per key — CMS states ([[CountMinStore]])
  *
  * All three appends are batchId-keyed (idempotent replay, same
  * exactly-once discipline as every store in this repo), and each
  * store's read-side merge rolls up to coarser keys without touching
  * raw data — the point of storing states: at 100 TB the raw stream
  * is gone, the states remain re-aggregable.
  */
object SketchPipeline {

  def distinctStore(cfg: PipelineConfig): SketchStore =
    new SketchStore(cfg.tablePath("sketch_distinct"), Seq("day", "level"))

  def lengthQuantiles(cfg: PipelineConfig): QuantileStore =
    new QuantileStore(cfg.tablePath("sketch_quantiles"),
      Seq("day", "level"), relativeError = 0.01)

  def messageFreqs(cfg: PipelineConfig): CountMinStore =
    new CountMinStore(cfg.tablePath("sketch_freqs"), Seq("day", "level"),
      depth = 4, width = 1024)

  private def withDay(queue: DataFrame): DataFrame =
    queue.withColumn("day", to_date(to_timestamp(col("timestamp"))))

  /** Start the MV: one streaming query appending per-block sketch
    * partials to all three stores (a shared-source multi-sink
    * foreachBatch — the batch is computed once per trigger). */
  def start(spark: SparkSession, cfg: PipelineConfig,
      topicKey: String = "event_tracking",
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Int = 10): StreamingQuery = {
    val distinct = distinctStore(cfg)
    val quantiles = lengthQuantiles(cfg)
    val freqs = messageFreqs(cfg)
    val queue = EventSource.wellFormed(
      EventSource.decode(
        EventSource.streamRaw(spark, cfg, topicKey, maxFilesPerTrigger),
        Schemas.queueRecord))
    queue.writeStream
      .queryName("sketch_consumer")
      .option("checkpointLocation", cfg.checkpointDir("sketch_consumer"))
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // localCheckpoint: three partial aggregations share one decode
        // of the block instead of re-reading the topic files per store
        val block = withDay(batch).localCheckpoint(true)
        distinct.append(
          distinct.partials(block, col("message")), batchId)
        quantiles.append(
          quantiles.partials(block,
            length(col("message")).cast("double")), batchId)
        freqs.append(freqs.partials(block, col("message")), batchId)
        block.unpersist(false)
        ()
      }
      .start()
  }

  /** Dashboard reads: merged estimates per (day, level). */
  def distinctMessages(spark: SparkSession,
      cfg: PipelineConfig): DataFrame =
    distinctStore(cfg).read(spark)

  def lengthP50(spark: SparkSession, cfg: PipelineConfig): DataFrame =
    lengthQuantiles(cfg).read(spark, Seq(0.5))

  /** Frequency probes for specific messages, rolled up per level
    * across all days — states merge first, probes run on the merged
    * state (one row per level x probe). */
  def levelMessageFreq(spark: SparkSession, cfg: PipelineConfig,
      probes: Seq[String]): DataFrame = {
    val merged = messageFreqs(cfg).readGrouped(spark, Seq("level"))
    merged.select(col("level") +: probes.zipWithIndex.map {
      case (m, i) =>
        CountMinState.value(col("cms"), lit(m)).as(s"freq_$i")
    }: _*)
  }
}
