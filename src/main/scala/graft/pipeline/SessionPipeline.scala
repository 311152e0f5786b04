package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.config.PipelineConfig
import graft.ingest.EventSource
import graft.model.Schemas

/** Streaming gap-sessionization — the custom-state counterpart of the
  * batch [[graft.ops.Sessionize]] operator, built on
  * `flatMapGroupsWithState` with an event-time timeout.
  *
  * The reference's streaming side only maintains a daily rollup
  * (kafka+clickhouse.md:205-211); per-user sessions are the next
  * operator an event-tracking warehouse needs, and they are exactly
  * what keyed state is for: per-email open-session state, closed
  * sessions emitted either when a newer event arrives past the gap or
  * when the watermark passes the open session's deadline (timeout).
  * State size is O(active users), not O(events) — the watermark both
  * bounds lateness and garbage-collects state, which is what makes
  * this run indefinitely at production volume.
  */
object SessionPipeline {

  /** One keyed wire event (ms precision — sessions gaps are seconds to
    * minutes, so ms resolution is exact for the operator's purpose). */
  case class SessionEvent(email: String, event_ms: Long)

  /** Open (in-state) session. */
  case class OpenSession(startMs: Long, endMs: Long, n: Long)

  /** Emitted when a session closes. */
  case class ClosedSession(email: String, start_ms: Long, end_ms: Long,
      n_events: Long)

  /** Sessionize a watermarked keyed stream. Events inside one
    * micro-batch are sorted before folding, so intra-batch disorder is
    * handled exactly; a cross-batch late event that predates the open
    * session by more than the gap (possible only within the watermark
    * delay) closes as its own single-event session rather than
    * rewriting history — the documented approximation of any
    * single-pass sessionizer.
    */
  def sessionize(events: Dataset[SessionEvent],
      gapSec: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapSec * 1000L

    def fold(email: String, it: Iterator[SessionEvent],
        state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(ClosedSession(email, s.startMs, s.endMs, s.n))
      } else {
        var closed = List.empty[OpenSession]
        var cur = state.getOption.orNull
        it.map(_.event_ms).toArray.sorted.foreach { t =>
          if (cur == null) cur = OpenSession(t, t, 1)
          else if (t - cur.endMs > gapMs) {
            closed ::= cur; cur = OpenSession(t, t, 1)
          } else if (t >= cur.startMs - gapMs) {
            cur = OpenSession(math.min(cur.startMs, t),
              math.max(cur.endMs, t), cur.n + 1)
          } else { // late beyond the gap before the open session
            closed ::= OpenSession(t, t, 1)
          }
        }
        state.update(cur)
        state.setTimeoutTimestamp(math.max(cur.endMs + gapMs,
          state.getCurrentWatermarkMs() + 1))
        closed.reverseIterator
          .map(s => ClosedSession(email, s.startMs, s.endMs, s.n))
      }
    }

    events.groupByKey(_.email)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(fold)
  }

  /** Wire topic -> parse -> watermark -> sessionize -> parquet
    * `sessions` table. `lateness` is the watermark delay: how far
    * out-of-order an event may arrive and still count.
    */
  def start(spark: SparkSession, cfg: PipelineConfig,
      topicKey: String = "event_tracking", gapSec: Long = 1800L,
      lateness: String = "10 minutes",
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    import spark.implicits._
    val wire = EventSource.wellFormed(
      EventSource.decode(
        EventSource.streamRaw(spark, cfg, topicKey, maxFilesPerTrigger),
        Schemas.wireEvent))
    val keyed = wire
      .select(col("email"), to_timestamp(col("event_time")).as("ts"))
      .filter(col("email").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", lateness)
      // integer DIV: `/` on Columns is floating-point division, and a
      // DOUBLE event_ms would fail the Long-field upcast in the encoder
      .withColumn("event_ms", expr("unix_micros(ts) DIV 1000"))
      .as[SessionEvent]
    sessionize(keyed, gapSec)
      .toDF()
      .writeStream
      .queryName("sessionizer")
      .option("checkpointLocation", cfg.checkpointDir("sessionizer"))
      .trigger(trigger)
      .format("parquet")
      .option("path", cfg.tablePath("sessions"))
      .outputMode(OutputMode.Append())
      .start()
  }

  /** Batch view of the closed-sessions table. */
  def closedSessions(spark: SparkSession,
      cfg: PipelineConfig): DataFrame =
    spark.read.schema(
        "email STRING, start_ms BIGINT, end_ms BIGINT, n_events BIGINT")
      .parquet(cfg.tablePath("sessions"))
}
