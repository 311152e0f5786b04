package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.config.PipelineConfig
import graft.ingest.EventSource
import graft.model.Schemas

/** Streaming conversion funnel — the stateful-streaming twin of the
  * batch [[graft.ops.Funnel]] operator: per-email funnel progress kept
  * in keyed state, completions emitted the micro-batch they happen,
  * expired windows emitted by event-time timeout.
  *
  * Same earliest-anchor greedy semantics as the batch operator: the
  * chain anchors at the user's first step-1 event, each later step
  * must be strictly after the previous one and inside `windowMs` of
  * the anchor. After a completion or an expiry the state clears, so
  * the NEXT step-1 event starts a fresh attempt — the streaming
  * tracker follows conversions forever on O(active users) state,
  * garbage-collected by the watermark like [[SessionPipeline]].
  *
  * Single-pass approximation (documented, same contract as the
  * sessionizer): events inside one micro-batch are sorted before
  * folding, so intra-batch disorder is exact; a cross-batch late
  * event older than the chain's last-taken step cannot rewrite the
  * chain.
  */
object FunnelPipeline {

  /** One keyed wire event (ms precision, like [[SessionPipeline]]). */
  case class StepEvent(email: String, event_ms: Long, event_type: String)

  /** In-flight funnel attempt. */
  case class FunnelState(anchorMs: Long, prevMs: Long, level: Int)

  /** Emitted on completion (completed=true, closedMs = last-step time)
    * or window expiry (completed=false, closedMs = -1). */
  case class FunnelResult(email: String, anchor_ms: Long, level: Int,
      completed: Boolean, closed_ms: Long)

  /** Track funnels over a watermarked keyed stream. */
  def track(events: Dataset[StepEvent], steps: Seq[String],
      windowMs: Long): Dataset[FunnelResult] = {
    import events.sparkSession.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")

    def fold(email: String, it: Iterator[StepEvent],
        state: GroupState[FunnelState]): Iterator[FunnelResult] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(FunnelResult(email, s.anchorMs, s.level,
          completed = false, closed_ms = -1L))
      } else {
        var out = List.empty[FunnelResult]
        var cur = state.getOption.orNull
        it.toArray.sortBy(e => (e.event_ms, e.event_type)).foreach { e =>
          if (cur == null) {
            if (e.event_type == steps.head)
              cur = FunnelState(e.event_ms, e.event_ms, 1)
          } else if (cur.level < steps.length &&
              e.event_type == steps(cur.level) &&
              e.event_ms > cur.prevMs &&
              e.event_ms <= cur.anchorMs + windowMs) {
            cur = FunnelState(cur.anchorMs, e.event_ms, cur.level + 1)
            if (cur.level == steps.length) {
              out ::= FunnelResult(email, cur.anchorMs, cur.level,
                completed = true, closed_ms = e.event_ms)
              cur = null // completed: next step-1 event re-anchors
            }
          }
        }
        if (cur == null) {
          if (state.exists) state.remove()
        } else {
          state.update(cur)
          // fire once the watermark passes the window end; the max()
          // keeps the timestamp legal when the deadline already passed
          state.setTimeoutTimestamp(math.max(cur.anchorMs + windowMs,
            state.getCurrentWatermarkMs() + 1))
        }
        out.reverseIterator
      }
    }

    events.groupByKey(_.email)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fold)
  }

  /** Wire topic -> parse -> watermark -> funnel-track -> parquet
    * `funnels` table. Default steps follow the reference's Enum8
    * event-type domain (kafka+clickhouse.md:97): delivery, open,
    * click.
    */
  def start(spark: SparkSession, cfg: PipelineConfig,
      topicKey: String = "event_tracking",
      steps: Seq[String] = Seq("delivered", "open", "click"),
      windowMs: Long = 24L * 3600L * 1000L,
      lateness: String = "10 minutes",
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    import spark.implicits._
    val wire = EventSource.wellFormed(
      EventSource.decode(
        EventSource.streamRaw(spark, cfg, topicKey, maxFilesPerTrigger),
        Schemas.wireEvent))
    val keyed = wire
      .select(col("email"), to_timestamp(col("event_time")).as("ts"),
        col("event_type"))
      .filter(col("email").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", lateness)
      // keep `ts` in the plan (selecting it away would drop the
      // watermark); .as[] encodes only the case-class fields
      .withColumn("event_ms", expr("unix_micros(ts) DIV 1000"))
      .as[StepEvent]
    track(keyed, steps, windowMs)
      .toDF()
      .writeStream
      .queryName("funnel_tracker")
      .option("checkpointLocation", cfg.checkpointDir("funnel_tracker"))
      .trigger(trigger)
      .format("parquet")
      .option("path", cfg.tablePath("funnels"))
      .outputMode(OutputMode.Append())
      .start()
  }

  /** Batch view of the emitted funnel results. */
  def results(spark: SparkSession, cfg: PipelineConfig): DataFrame =
    spark.read.parquet(cfg.tablePath("funnels"))
}
