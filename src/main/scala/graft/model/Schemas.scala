package graft.model

import org.apache.spark.sql.types._

/** Explicit StructTypes for every table the engine owns.
  *
  * The reference declares fixed schemas on the storage side via three
  * CREATE TABLE DDLs (kafka+clickhouse.md:92-103, 183-194, 205-211) while
  * the wire format is duck-typed JSON (kafka+clickhouse.md:60-67). We pin
  * both sides: `from_json` with an explicit schema (never inference in a
  * production path) so malformed records become nulls we can route, not
  * crashes (the reference's consumer crashes on a missing key,
  * kafka+clickhouse.md:146-153).
  */
object Schemas {

  /** Closed Enum8 domain of `email_events.event_type`
    * (kafka+clickhouse.md:97): 'delivered'=1,'open'=2,'click'=3,
    * 'bounce'=4,'unsubscribe'=5. The name<->code map is semantic: an
    * out-of-domain value must be rejected/routed, not stored.
    */
  val eventTypeCodes: Map[String, Int] = Map(
    "delivered" -> 1,
    "open" -> 2,
    "click" -> 3,
    "bounce" -> 4,
    "unsubscribe" -> 5
  )

  /** Wire event as produced by the Django app (kafka+clickhouse.md:60-67):
    * UUIDs as strings, ISO-8601 event_time, nested metadata dict. */
  val wireEvent: StructType = StructType(Seq(
    StructField("campaign_id", StringType),
    StructField("workspace_id", StringType),
    StructField("email", StringType),
    StructField("event_type", StringType),
    StructField("event_time", StringType), // ISO-8601; to_timestamp at ingest
    StructField("metadata", MapType(StringType, StringType), nullable = true)
  ))

  /** Stored `email_events` table (kafka+clickhouse.md:92-103). UUID ->
    * canonical string (Spark has no UUID type; the producer already sends
    * strings, kafka+clickhouse.md:61-62); metadata JSON-stringified per
    * kafka+clickhouse.md:152, with DEFAULT '' per :99. `event_date` is the
    * derived partition column (toYYYYMMDD analog, kafka+clickhouse.md:102).
    */
  val emailEvents: StructType = StructType(Seq(
    StructField("campaign_id", StringType, nullable = false),
    StructField("workspace_id", StringType, nullable = false),
    StructField("email", StringType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("event_time", TimestampType, nullable = false),
    StructField("metadata", StringType, nullable = false),
    StructField("event_date", IntegerType, nullable = false)
  ))

  /** `queue` streaming record (kafka+clickhouse.md:183-194): epoch-seconds
    * timestamp (UInt64 -> signed long), level, message; JSONEachRow. */
  val queueRecord: StructType = StructType(Seq(
    StructField("timestamp", LongType),
    StructField("level", StringType),
    StructField("message", StringType)
  ))

  /** `daily` aggregate store (kafka+clickhouse.md:205-211): append-only
    * partial counts keyed by (day, level); readers must re-sum
    * (SummingMergeTree contract, kafka+clickhouse.md:396-401, 240-243). */
  val daily: StructType = StructType(Seq(
    StructField("day", DateType, nullable = false),
    StructField("level", StringType, nullable = false),
    StructField("total", LongType, nullable = false)
  ))
}
