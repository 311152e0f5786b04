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
}
