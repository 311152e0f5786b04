package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.ops.Multimodal

/** Streaming MEDIA ingest: arriving binary payloads (base64 in the
  * JSON topic files — the wire shape a Kafka topic of blobs would
  * carry) decode through the REAL format-dispatching codec stack per
  * micro-batch, good rows land as batchId-keyed stats deltas, and
  * corrupt payloads route to a dead-letter delta with their doc-tagged
  * error — never failing the stream (the EventSource corrupt-record
  * discipline applied to media; the decoders' loud-failure contract is
  * exactly the hook [[Multimodal.extractFeaturesOrDeadLetter]]
  * catches).
  *
  * Scale shape: decode is narrow (parallelism == source partitions,
  * payloads never shuffle); both sinks are batchId-keyed OVERWRITE
  * dirs, so a checkpoint replay of any micro-batch is idempotent; a
  * crash between the two writes is healed by the replay (stats commit
  * first — a re-run overwrites both dirs with identical rows). At
  * 100 TB this is the same per-batch contract as the vector-ingest
  * and postings pipelines: per-batch work scales with the ARRIVING
  * rows only, never with the accumulated store.
  */
object MediaPipeline {

  /** Wire schema of the drop-dir JSON lines. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_b64", StringType),
    StructField("format", StringType)))

  def statsDir(path: String): String = s"$path/media_stats"
  def rejectsDir(path: String): String = s"$path/media_rejects"

  /** One micro-batch: base64 -> binary, dead-letter decode through
    * [[Multimodal.MixedRealDecoder]], split into stats + rejects, two
    * batchId-keyed overwrite writes on one CommitProtocol run. The
    * decoded frame is a micro-batch — staged once via localCheckpoint
    * so the two sinks don't re-decode (the stage-narrow-frames rule:
    * the staged rows are stats-sized, payloads are already dropped). */
  def ingestBatch(batch: DataFrame, path: String, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    // Malformed WIRE rows (null doc_id / format — a truncated or
    // schema-drifted JSON line) dead-letter as doc_id -1 instead of
    // NPE-ing the typed conversion and killing the batch
    // (review-caught); a null payload with a valid doc_id flows into
    // the decoder's own doc-tagged failure path.
    val media = batch.select(
      coalesce(col("doc_id"), lit(-1L)).as("doc_id"),
      unbase64(col("media_b64")).as("media"),
      coalesce(col("format"), lit("?")).as("format"))
    val outcomes = Multimodal
      .extractFeaturesOrDeadLetter(spark, media,
        Multimodal.MixedRealDecoder)
      .toDF()
      .localCheckpoint(true) // decode ONCE for both sinks
    try {
      import graft.scale.CommitProtocol.{run, step}
      run("media-ingest", Seq(
        step("write-stats-delta") {
          outcomes.filter(col("error").isNull)
            .select(col("doc_id"), col("format"), col("n_bytes"),
              col("features"))
            .write.mode(SaveMode.Overwrite)
            .parquet(s"${statsDir(path)}/batch=$batchId")
        },
        step("write-rejects-delta") {
          outcomes.filter(col("error").isNotNull)
            .select(col("doc_id"), col("format"), col("n_bytes"),
              col("error"))
            .write.mode(SaveMode.Overwrite)
            .parquet(s"${rejectsDir(path)}/batch=$batchId")
        }))
    } finally outcomes.unpersist(false) // staged blocks die with the
    // batch, not with the stream (SketchPipeline discipline)
  }

  /** Start the ingest stream over a JSON drop directory. */
  def start(spark: SparkSession, srcDir: String, path: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    spark.readStream.schema(mediaSchema).json(srcDir)
      .writeStream
      .queryName("media-ingest")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, path, batchId)
      }
      .start()

  /** All committed stats / rejects across batches (empty-schema-safe:
    * a store with no committed batches reads as an empty frame). */
  def stats(spark: SparkSession, path: String): DataFrame =
    readDeltas(spark, statsDir(path), StructType(Seq(
      StructField("doc_id", LongType),
      StructField("format", StringType),
      StructField("n_bytes", IntegerType),
      StructField("features", ArrayType(DoubleType)))))

  def rejects(spark: SparkSession, path: String): DataFrame =
    readDeltas(spark, rejectsDir(path), StructType(Seq(
      StructField("doc_id", LongType),
      StructField("format", StringType),
      StructField("n_bytes", IntegerType),
      StructField("error", StringType))))

  private def readDeltas(spark: SparkSession, dir: String,
      schema: StructType): DataFrame = {
    val fs = graft.scale.Hdfs.of(spark, dir)
    // ONE glob for the committed markers — an exists() per batch dir
    // is an N+1 on object stores (the visibleDirs lesson;
    // review-caught here too)
    val marks = fs.globStatus(
      new org.apache.hadoop.fs.Path(dir, "batch=*/_SUCCESS"))
    val committed =
      if (marks == null) Seq.empty
      else marks.toSeq.map(_.getPath.getParent.toString)
    if (committed.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(committed: _*)
  }
}
