package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.config.PipelineConfig
import graft.ingest.EventSource
import graft.model.Schemas

/** Stream-stream interval join: every click attributed to the same
  * recipient's delivery within the preceding attribution window — the
  * canonical two-stream correlation the reference's single-consumer
  * design cannot express at all.
  *
  * Both sides are watermarked and the join condition bounds the event
  * times relative to each other, which is exactly what lets Spark
  * expire join state: a delivery can be dropped from state once the
  * click-side watermark passes delivery_time + window, so state is
  * O(events inside the attribution window), not O(stream). An inner
  * interval join emits matches eagerly (watermarks only gate state
  * eviction), so results are available at micro-batch latency.
  */
object AttributionJoin {

  /** clicks x deliveries on email, click within `windowMinutes` after
    * the delivery. Output: email, delivery/click epoch-ms, lag_ms.
    */
  def start(spark: SparkSession, cfg: PipelineConfig,
      topicKey: String = "event_tracking", windowMinutes: Int = 60,
      lateness: String = "10 minutes",
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    def side(eventType: String, prefix: String): DataFrame =
      EventSource.wellFormed(
        EventSource.decode(
          EventSource.streamRaw(spark, cfg, topicKey,
            maxFilesPerTrigger),
          Schemas.wireEvent))
        .filter(col("event_type") === eventType)
        .select(col("email").as(s"${prefix}_email"),
          to_timestamp(col("event_time")).as(s"${prefix}_ts"))
        .filter(col(s"${prefix}_email").isNotNull &&
          col(s"${prefix}_ts").isNotNull)
        .withWatermark(s"${prefix}_ts", lateness)
    val joined = side("click", "c").join(side("delivered", "d"),
      expr(s"""c_email = d_email AND
               d_ts <= c_ts AND
               d_ts >= c_ts - INTERVAL $windowMinutes MINUTES"""))
    joined
      .select(col("c_email").as("email"),
        expr("unix_micros(d_ts) DIV 1000").as("delivered_ms"),
        expr("unix_micros(c_ts) DIV 1000").as("click_ms"))
      .withColumn("lag_ms", col("click_ms") - col("delivered_ms"))
      .writeStream
      .queryName("attribution")
      .option("checkpointLocation", cfg.checkpointDir("attribution"))
      .trigger(trigger)
      .format("parquet")
      .option("path", cfg.tablePath("attribution"))
      .outputMode(OutputMode.Append())
      .start()
  }

  /** Batch view of the attribution table. */
  def attributions(spark: SparkSession,
      cfg: PipelineConfig): DataFrame =
    spark.read.schema("email STRING, delivered_ms BIGINT, " +
        "click_ms BIGINT, lag_ms BIGINT")
      .parquet(cfg.tablePath("attribution"))
}
