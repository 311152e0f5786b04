package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.config.PipelineConfig
import graft.model.Schemas

/** Writers — the producer and the `email_events` insert path.
  *
  * Producer analog (kafka+clickhouse.md:43-51): `publish_event` serializes
  * a dict to JSON and produces to the topic resolved from config;
  * `flush()`'s synchronous barrier maps to the batch write completing.
  *
  * Insert analog (kafka+clickhouse.md:146-153): explicit field mapping
  * with `metadata` re-stringified and defaulted to '' (DDL DEFAULT '',
  * kafka+clickhouse.md:99), landing in a MergeTree table day-partitioned
  * by toYYYYMMDD(event_time) and clustered by (campaign_id, event_time)
  * (kafka+clickhouse.md:101-103). Here: parquet + hive-style
  * `partitionBy(event_date)` (partition pruning) + `sortWithinPartitions`
  * (parquet row-group min/max skipping == the sparse PK index). The
  * reference's row-at-a-time insert — which it itself flags as slower
  * (kafka+clickhouse.md:494) — becomes batched columnar writes by
  * construction.
  */
object EventSink {

  /** to_json(struct(*)) -> one JSON line per event, appended to the topic
    * dir (kafka+clickhouse.md:50: json.dumps then produce). */
  def publish(events: DataFrame, cfg: PipelineConfig,
      topicKey: String): Unit =
    events
      .select(to_json(struct(events.columns.toIndexedSeq.map(col): _*)).as("value"))
      .write.mode(SaveMode.Append).text(cfg.topicDir(topicKey))

  /** Enum8 domain check (kafka+clickhouse.md:97): name -> code, null for
    * out-of-domain. Built from the exact 5-value map in [[Schemas]]. */
  def eventTypeCode(c: Column): Column = {
    val pairs = Schemas.eventTypeCodes.toSeq.sortBy(_._2)
    pairs.foldLeft(lit(null).cast("int")) { case (acc, (name, code)) =>
      when(c === lit(name), lit(code)).otherwise(acc)
    }
  }

  /** Wire-shape -> `email_events` storage shape: the explicit field
    * mapping of kafka+clickhouse.md:146-153. ISO-8601 parse (F8),
    * metadata map -> JSON string with '' default (F4/F9), derived
    * yyyyMMdd partition key as numeric UInt32-like int (F3).
    * Out-of-domain event_type rows are *excluded* here (Enum8 insert
    * would error); route them via [[invalidEvents]].
    */
  def toEmailEvents(wire: DataFrame): DataFrame =
    wire
      .filter(eventTypeCode(col("event_type")).isNotNull)
      .select(
        col("campaign_id"),
        col("workspace_id"),
        col("email"),
        col("event_type"),
        to_timestamp(col("event_time")).as("event_time"),
        coalesce(to_json(col("metadata")), lit("")).as("metadata"),
        date_format(to_timestamp(col("event_time")), "yyyyMMdd")
          .cast("int").as("event_date"))

  /** The rows an Enum8 insert would reject (dead-letter side). */
  def invalidEvents(wire: DataFrame): DataFrame =
    wire.filter(eventTypeCode(col("event_type")).isNull)

  /** MergeTree-layout write: day partitions + (campaign_id, event_time)
    * clustering within each file for min/max skipping — plus a
    * per-row-group bloom on `email` (ClickHouse `bloom_filter` skip
    * index analog, see [[graft.scale.SkipIndex]]): the per-subject
    * point probe (GDPR subject access / [[graft.scale.Maintenance]]
    * erasure) filters on a high-cardinality column the sort key
    * scatters, exactly the probe min/max stats cannot serve.
    * Dictionary encoding is disabled on `email` for the same reason
    * SkipIndex disables it on bloom columns: at production NDV the
    * dictionary page overflows to plain encoding anyway, and
    * parquet-mr omits the bloom for fully dictionary-encoded chunks —
    * this keeps the skip structure present in BOTH regimes. */
  def writeEmailEvents(rows: DataFrame, cfg: PipelineConfig): Unit =
    rows
      .repartition(col("event_date"))
      .sortWithinPartitions(col("campaign_id"), col("event_time"))
      .write.mode(SaveMode.Append)
      .option("parquet.bloom.filter.enabled#email", "true")
      .option("parquet.bloom.filter.expected.ndv#email", "65536")
      .option("parquet.enable.dictionary#email", "false")
      .partitionBy("event_date")
      .parquet(cfg.tablePath("email_events"))
}
