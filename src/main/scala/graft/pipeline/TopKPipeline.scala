package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.TopK

/** Streaming heavy hitters — the batch SpaceSaving aggregate
  * ([[graft.ops.TopK]]) lifted into Structured Streaming keyed state,
  * so "top terms over the whole stream so far" is maintained
  * incrementally instead of recomputed from raw history.
  *
  * Dataflow: terms shard by hash into `shards` groups; each shard
  * folds its arriving (term, weight) rows into a capacity-bounded
  * SpaceSaving summary held in `flatMapGroupsWithState` state (the
  * SAME binary form the batch aggregate ships between partials —
  * TopK.toBytes). Per trigger, each UPDATED shard overwrites its own
  * `shard=N` directory in the summary store; a retried micro-batch
  * rewrites the same directories with the same folded state, so the
  * store is effectively exactly-once (the state store replays the
  * fold deterministically from the checkpoint).
  *
  * Read side ([[snapshot]]): merge the <= `shards` summaries (each
  * <= capacity entries — a documented size contract, like the other
  * bounded reads) and emit the current top-k with error bounds.
  * `err_max = 0` everywhere certifies the snapshot is exact.
  *
  * Why this shape at production volume: state is O(shards x capacity)
  * REGARDLESS of stream length or distinct-term count — the
  * summary-not-data trade, now applied across time instead of across
  * partitions. The alternative (stream -> complete-mode count
  * aggregation) keeps O(distinct terms) state and re-emits the whole
  * result table every trigger; at a 100 TB corpus's vocabulary that
  * state never stops growing.
  */
object TopKPipeline {

  /** One keyed wire row. */
  case class TermRow(shard: Int, term: String, w: Long)

  /** Start the maintainer: json lines {term, w} under `srcDir` ->
    * per-shard summary store under `storeDir/shard=N`. */
  def start(spark: SparkSession, srcDir: String, storeDir: String,
      checkpointDir: String, capacity: Int = 4096, shards: Int = 8,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import spark.implicits._

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("term",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.LongType)))

    def fold(shard: Int, rows: Iterator[TermRow],
        state: GroupState[Array[Byte]]): Iterator[(Int, Array[Byte])] = {
      val buf = state.getOption
        .map(TopK.fromBytes(_, capacity))
        .getOrElse(new TopK.SpaceSavingBuffer(capacity))
      rows.foreach(r => buf.add(UTF8String.fromString(r.term), r.w))
      // cap BEFORE persisting: state stays <= capacity entries even
      // though the in-fold map is allowed to reach 2x (lazy trim)
      buf.trimTo(capacity)
      val bytes = TopK.toBytes(buf)
      state.update(bytes)
      Iterator.single((shard, bytes))
    }

    spark.readStream.schema(schema).json(srcDir)
      .filter(col("term").isNotNull)
      .select(pmod(xxhash64(col("term")), lit(shards)).cast("int")
        .as("shard"), col("term"), coalesce(col("w"), lit(1L)).as("w"))
      .as[TermRow]
      .groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fold)
      .toDF("shard", "summary")
      .writeStream
      .queryName("topk-pipeline")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // each updated shard overwrites ITS OWN directory — shards
        // untouched this trigger keep their previous summary on disk
        batch.write.mode("overwrite")
          .partitionBy("shard")
          .option("partitionOverwriteMode", "dynamic")
          .parquet(storeDir)
        ()
      }
      .start()
  }

  /** Current top-k snapshot from the summary store: union the
    * <= shards summaries, rank by (cnt_est desc, term).
    *
    * The union is a plain CONCATENATION, not SpaceSavingBuffer.mergeIn:
    * mergeIn implements the overlapping-streams merge, where a key
    * absent from one side may have been evicted there and so picks up
    * that side's floor in both count and err. Shards hold DISJOINT
    * term sets (a term's every occurrence hashes to the same shard),
    * so a term absent from another shard truly has count 0 there —
    * cross-shard floor accounting would inflate every estimate by the
    * sum of all other shards' floors in the evicting regime. Each
    * entry's (cnt_est, err_max) is its own shard's bound, unchanged. */
  def snapshot(spark: SparkSession, storeDir: String, k: Int,
      capacity: Int = 4096): DataFrame = {
    import spark.implicits._
    // size contract: <= shards rows of <= capacity entries each
    val rows = spark.read.parquet(storeDir).select("summary").collect()
      .iterator.flatMap { r =>
        val buf = TopK.fromBytes(r.getAs[Array[Byte]](0), capacity)
        val it = buf.entries.entrySet.iterator
        val out = Seq.newBuilder[(String, Long, Long)]
        while (it.hasNext) {
          val kv = it.next()
          out += ((kv.getKey.toString, kv.getValue.count,
            kv.getValue.err))
        }
        out.result()
      }.toSeq
    rows.toDF("term", "cnt_est", "err_max")
      .orderBy(col("cnt_est").desc, col("term"))
      .limit(k)
  }
}
