package graft.scale

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** ClickHouse `SAMPLE BY` storage analog (ref kafka+clickhouse.md:
  * 132-141 creates the MergeTree layout this extends; ClickHouse puts
  * `intHash32(UserID)` inside the PRIMARY KEY so `SAMPLE 1/8` reads
  * ~1/8 of the granules). The Spark-first shape: materialize the
  * Knuth sample key as a physical column and make it the LEADING sort
  * key of a range-partitioned sorted write — a `SAMPLE f` scan is
  * then a contiguous range slab `sample_key < f * 2^32`, pruned at
  * file level (range partitioning) and row-group level (footer
  * min/max under the pushed range predicate). Reading an f-fraction
  * sample costs ~f of the bytes at ANY table size — the whole point
  * of the clause at 100 TB, where a full-scan-then-filter "sample"
  * defeats itself.
  *
  * Sampling is BY ENTITY (the hashed id), not by row: an entity is
  * either wholly in or wholly out of the sample, so per-entity
  * analytics (funnels, retention, per-user aggregates) stay unbiased
  * — the property ClickHouse's SAMPLE BY userID exists for. The key
  * is the engine-portable Knuth hash ([[Sampling.hashBucket]]'s
  * arithmetic), so a DuckDB oracle reproduces the exact sample
  * population with plain 64-bit math.
  */
object SampleLayout {

  /** 2^32 — the sample key domain; `SAMPLE f` keeps keys below
    * f * KeyDomain. */
  val KeyDomain: Long = 4294967296L

  /** The materialized sample key: [[Sampling.hashKey]] of the entity
    * id — ONE shared implementation of the engine-portable Knuth
    * hash (overflow-safe over the full long id domain), so the
    * layout, every sampler, and the SQL oracles can never drift. */
  def sampleKey(id: Column): Column = Sampling.hashKey(id)

  /** Canonical per-SF location of the sample-keyed events layout —
    * one derivation shared by the registered query and Bench's
    * pre-build/warm sweep. */
  def defaultPath(sfDir: String): String =
    sys.props("java.io.tmpdir") + "/graft_sampleidx_" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")

  /** Write `df` with `sample_key` = hash(`id`) as the LEADING sort
    * key: range-partitioned into `files` shards on (sample_key,
    * sortCols...) and sorted within each — so a key-range slab prunes
    * whole files via the range partitioning AND row groups via footer
    * min/max. `sortCols` keep their secondary locality inside each
    * slab (ClickHouse: `ORDER BY (intHash32(UserID), ...)`). */
  def write(df: DataFrame, path: String, id: Column,
      sortCols: Seq[String] = Nil, files: Int = 16): Unit = {
    val keyed = df.withColumn("sample_key", sampleKey(id))
    val keys = col("sample_key") +: sortCols.map(col)
    keyed.repartitionByRange(files, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** `SAMPLE num/den` read: rows whose sample key falls in the
    * [0, num/den * 2^32) slab. Exact integer threshold arithmetic
    * (num * 2^32 / den with num <= den, no overflow for sane
    * fractions) so Spark and any SQL oracle agree on the population
    * bit-for-bit. Scale estimates by den/num. */
  def sampleScan(spark: SparkSession, path: String, num: Long,
      den: Long): DataFrame = {
    require(num > 0 && num <= den && den <= (1L << 20),
      s"sample fraction $num/$den out of range")
    spark.read.parquet(path)
      .filter(col("sample_key") < lit(num * KeyDomain / den))
  }

  /** Build-once sample-keyed events layout for the registered query.
    * Granularity small enough that slab pruning is observable at test
    * scale; currency = the shared [[Hdfs.ensureStamped]] protocol. */
  def ensureEvents(events: DataFrame, path: String): Unit = {
    val fs = Hdfs.of(events.sparkSession, path)
    val files = 16
    val stamp = s"rows=${events.count()};key=knuth(user_id)" +
      s";files=$files;sort=ts"
    Hdfs.ensureStamped(fs, new Path(s"$path/_graft_meta"),
      Seq(new Path(s"$path/_SUCCESS")), stamp) {
      write(events, path, col("user_id"), Seq("ts"), files)
    }
  }
}
