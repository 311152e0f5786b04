package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.config.PipelineConfig
import graft.ingest.{EventSink, EventSource}
import graft.model.Schemas

/** Part 1 of the reference — "Direct Insertion" (kafka+clickhouse.md:
  * 5-172): the hand-written consumer that polls, decodes, and row-inserts
  * raw events into `email_events`.
  *
  * The poll loop (kafka+clickhouse.md:135-143) becomes a file-stream
  * micro-batch; the per-message single-row insert (kafka+clickhouse.md:
  * 146-153) becomes a batched columnar parquet append — strictly better
  * than the path the reference itself calls "Manual aggregation, slower"
  * (kafka+clickhouse.md:494). The whole plan is narrow (no shuffle):
  * source -> parse -> project -> sink runs as one pipelined stage per
  * executor, which is what lets it scale linearly with partitions.
  */
object DirectPipeline {

  def start(spark: SparkSession, cfg: PipelineConfig,
      topicKey: String = "event_tracking",
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val decoded = EventSource.decode(
      EventSource.streamRaw(spark, cfg, topicKey), Schemas.wireEvent)
    decoded.writeStream
      .queryName("clickhouse-writer") // group.id, kafka+clickhouse.md:129
      .option("checkpointLocation", cfg.checkpointDir("clickhouse-writer"))
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val wire = EventSource.wellFormed(batch)
        EventSink.writeEmailEvents(EventSink.toEmailEvents(wire), cfg)
        // Dead-letter path: corrupt JSON + out-of-domain enum values.
        // The reference skips broker errors (kafka+clickhouse.md:139-141)
        // and crashes on bad payloads; we persist both for replay.
        val dead = EventSource.corrupt(batch)
        if (!dead.isEmpty)
          dead.write.mode("append").text(cfg.tablePath("dead_letter"))
      }
      .start()
  }

  /** Raw-event table view. */
  def emailEvents(spark: SparkSession, cfg: PipelineConfig): DataFrame =
    spark.read.parquet(cfg.tablePath("email_events"))
}
