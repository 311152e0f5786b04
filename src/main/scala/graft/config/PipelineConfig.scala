package graft.config

/** Configuration registry for the pipeline.
  *
  * Spark-native analog of the reference's `settings.py` dicts
  * `KAFKA_SETTINGS` / `CLICKHOUSE_SETTINGS` (kafka+clickhouse.md:10-28),
  * which centralize broker coordinates, client/group ids, the
  * event-kind -> topic-name map, and storage coordinates.
  *
  * In this zero-egress sandbox Kafka topics are modeled as directories of
  * JSON-lines files (semantically `JSONEachRow`, kafka+clickhouse.md:194);
  * `topicsRoot` is the stand-in for the broker address. Swapping to a real
  * broker is a config + `format("kafka")` change, not a code change.
  */
final case class PipelineConfig(
    /** Stand-in for `bootstrap.servers` (kafka+clickhouse.md:13): root dir
      * under which each topic is a subdirectory of JSON-lines files. */
    topicsRoot: String,
    /** Event-kind -> topic-name map (kafka+clickhouse.md:16-20). */
    topics: Map[String, String] = PipelineConfig.defaultTopics,
    /** Consumer group id (kafka+clickhouse.md:129) -> maps to the
      * Structured Streaming checkpoint location, which *is* the offset
      * store of a consumer group. */
    groupId: String = "clickhouse-writer",
    /** Storage root: where `email_events` / `daily` parquet tables live
      * (analog of CLICKHOUSE_SETTINGS, kafka+clickhouse.md:23-28). */
    warehouseRoot: String,
    /** `auto.offset.reset='earliest'` analog (kafka+clickhouse.md:130). */
    startingOffsets: String = "earliest"
) {
  def topicDir(topicKey: String): String = {
    val name = topics.getOrElse(
      topicKey,
      throw new IllegalArgumentException(s"unknown topic key: $topicKey"))
    s"$topicsRoot/$name"
  }
  def tablePath(table: String): String = s"$warehouseRoot/$table"
  def checkpointDir(query: String): String =
    s"$warehouseRoot/_checkpoints/$groupId/$query"
}

object PipelineConfig {
  /** kafka+clickhouse.md:16-20 */
  val defaultTopics: Map[String, String] = Map(
    "event_tracking" -> "campaign.event_tracking",
    "audience_ready" -> "campaign.audience_ready",
    "template_ready" -> "campaign.template_ready"
  )
}
