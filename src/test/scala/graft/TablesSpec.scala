package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver regenerates the testdata warehouse every round, and
  * `events.parquet`'s `ts` physical type has already drifted once
  * (TIMESTAMP(NANOS) rounds 1-6 → un-adjusted TIMESTAMP(MICROS), i.e.
  * TIMESTAMP_NTZ, round 7). [[Tables.events]] must keep producing the
  * same session-TimestampType micros for every layout that has ever
  * shipped, so each layout gets a written-fixture test here — a future
  * drift then breaks one focused spec instead of seven downstream ones.
  */
class TablesSpec extends SparkSpec {

  // one event at a fixed micros instant, plus the rest of the schema
  private val micros = 1735689600123456L // 2025-01-01T00:00:00.123456Z
  private def writeFixture(dir: String, tsField: StructField,
      tsValue: Any): Unit = {
    val schema = StructType(Seq(
      StructField("event_id", LongType), tsField,
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val row = Row(1L, tsValue, 7L, "click", 1.5, "{}")
    spark.createDataFrame(
        java.util.Arrays.asList(row), schema)
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
  }

  private def readTs(dir: String): (DataType, Long) = {
    val df = Tables.events(spark, dir)
    val tsType = df.schema("ts").dataType
    val us = df.select(unix_micros(col("ts"))).head().getLong(0)
    (tsType, us)
  }

  test("events loader normalizes the nanos-as-long layout (rounds 1-6)") {
    // parquet TIMESTAMP(NANOS) surfaces as LongType under
    // spark.sql.legacy.parquet.nanosAsLong; writing a plain long column
    // exercises the identical loader branch.
    val dir = tmpDir("events-nanos")
    writeFixture(dir, StructField("ts", LongType), micros * 1000L)
    val (t, us) = readTs(dir)
    assert(t == TimestampType && us == micros)
  }

  test("events loader normalizes the TIMESTAMP_NTZ layout (round 7+)") {
    val dir = tmpDir("events-ntz")
    writeFixture(dir, StructField("ts", TimestampNTZType),
      java.time.LocalDateTime.ofEpochSecond(
        micros / 1000000L, (micros % 1000000L).toInt * 1000,
        java.time.ZoneOffset.UTC))
    val (t, us) = readTs(dir)
    assert(t == TimestampType && us == micros)
  }

  test("events loader passes a session-TimestampType layout through") {
    val dir = tmpDir("events-ltz")
    writeFixture(dir, StructField("ts", TimestampType),
      new Timestamp(micros / 1000L) {
        setNanos((micros % 1000000L).toInt * 1000)
      })
    val (t, us) = readTs(dir)
    assert(t == TimestampType && us == micros)
  }

  // ---- documents / embeddings drift pins: the loaders normalize any
  // plausible integer-width / float-width drift of the driver's
  // generation script to the canonical engine schema, so a regen that
  // narrows doc_id to int32 or widens embeddings to float64 breaks
  // NOTHING downstream (and a genuinely new layout breaks exactly one
  // focused test here).

  test("documents loader normalizes int32 ids to the canonical schema") {
    val dir = tmpDir("docs-drift")
    val schema = StructType(Seq(
      StructField("doc_id", IntegerType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", IntegerType)))
    spark.createDataFrame(
        java.util.Arrays.asList(Row(7, "hello world", "en", "src1", 11)),
        schema)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val df = Tables.documents(spark, dir)
    assert(df.schema("doc_id").dataType == LongType &&
      df.schema("n_chars").dataType == LongType)
    val r = df.head()
    assert(r.getLong(0) == 7L && r.getString(1) == "hello world" &&
      r.getLong(4) == 11L)
    // the canonical (current-round) layout passes through un-projected
    val real = Tables.documents(spark, sf0001)
    assert(real.schema("doc_id").dataType == LongType &&
      real.count() == 500)
  }

  test("embeddings loader normalizes float64/int-width drift") {
    val dir = tmpDir("emb-drift")
    val schema = StructType(Seq(
      StructField("vec_id", IntegerType),
      StructField("embedding", ArrayType(DoubleType)),
      StructField("label", LongType)))
    spark.createDataFrame(
        java.util.Arrays.asList(
          Row(3, Seq(0.5d, -1.25d, 2.0d), 9L)),
        schema)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    val df = Tables.embeddings(spark, dir)
    assert(df.schema("vec_id").dataType == LongType)
    assert(df.schema("embedding").dataType.asInstanceOf[ArrayType]
      .elementType == FloatType)
    assert(df.schema("label").dataType == IntegerType)
    val r = df.head()
    assert(r.getLong(0) == 3L && r.getInt(2) == 9)
    assert(r.getSeq[Float](1) == Seq(0.5f, -1.25f, 2.0f))
    val real = Tables.embeddings(spark, sf0001)
    assert(real.schema("embedding").dataType.asInstanceOf[ArrayType]
      .elementType == FloatType)
  }

  test("all three layouts agree row-for-row") {
    val dirs = Seq("events-a", "events-b", "events-c").map(tmpDir)
    writeFixture(dirs(0), StructField("ts", LongType), micros * 1000L)
    writeFixture(dirs(1), StructField("ts", TimestampNTZType),
      java.time.LocalDateTime.ofEpochSecond(
        micros / 1000000L, (micros % 1000000L).toInt * 1000,
        java.time.ZoneOffset.UTC))
    writeFixture(dirs(2), StructField("ts", TimestampType),
      new Timestamp(micros / 1000L) {
        setNanos((micros % 1000000L).toInt * 1000)
      })
    val rows = dirs.map(d =>
      Tables.events(spark, d)
        .select(col("event_id"), unix_micros(col("ts")).as("us"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .head())
    assert(rows.distinct.size == 1)
  }

  test("normalize raises on an out-of-int-range label instead of " +
      "silently wrapping") {
    import spark.implicits._
    val dir = tmpDir("drift-label")
    Seq((1L, Seq(0.1f, 0.2f), 4294967296L + 7L))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val e = intercept[Exception] {
      Tables.embeddings(spark, dir).collect()
    }
    assert(e.getMessage.contains("out of int range") ||
      Option(e.getCause).exists(_.getMessage.contains("out of int range")),
      s"expected loud range failure, got: ${e.getMessage}")
  }
}
