package graft.scale

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Pins Maintenance.deleteWhere / updateWhere (the ClickHouse
  * ALTER ... DELETE/UPDATE mutation analogs): semantic equivalence to
  * the logical filter/update, copy-on-write touching ONLY partitions
  * with matching rows, and file-level immutability everywhere else. */
class MutationSpec extends SparkSpec {

  private def fileState(dir: String): Map[String, Long] = {
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def walk(p: Path): Seq[(String, Long)] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath)
        else Seq(st.getPath.toString -> st.getModificationTime)
      }
    walk(new Path(dir)).toMap
  }

  private def writeDayTable(dir: String): Unit =
    Tables.events(spark, sf0001)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.partitionBy("day").parquet(dir)

  test("deleteWhere = logical anti-filter; untouched days keep their files") {
    val dir = tmpDir("graft-mutate-del") + "/events"
    writeDayTable(dir)
    val before = spark.read.parquet(dir)
    // A user active on SOME days (so both touched and untouched
    // partitions exist), picked deterministically.
    val nDays = before.select("day").distinct().count()
    val u = before.groupBy("user_id")
      .agg(countDistinct(col("day")).as("nd"))
      .filter(col("nd") < nDays && col("nd") > 1)
      .orderBy(col("user_id")).limit(1)
      .collect()(0).getLong(0)
    val userDays = before.filter(col("user_id") === u)
      .select("day").distinct().orderBy("day")
      .collect().map(_.get(0).toString).toSeq
    val want = before.filter(col("user_id") =!= u).collect().toSet
    val filesBefore = fileState(dir)

    val touched = Maintenance.deleteWhere(spark, dir, "day",
      col("user_id") === u)

    assert(touched === userDays, "rewritten partitions = days with rows")
    val after = spark.read.parquet(dir)
    assert(after.filter(col("user_id") === u).isEmpty)
    assert(after.collect().toSet === want)
    val filesAfter = fileState(dir)
    val untouchedDays = filesBefore.keySet.filter(p =>
      !userDays.exists(d => p.contains(s"day=$d")))
    untouchedDays.foreach { p =>
      assert(filesAfter.get(p) === filesBefore.get(p),
        s"file of an unmatched partition must be bit-untouched: $p")
    }
  }

  test("updateWhere scrubs only matching rows, row count preserved") {
    val dir = tmpDir("graft-mutate-upd") + "/events"
    writeDayTable(dir)
    val before = spark.read.parquet(dir)
    val u = before.select("user_id").orderBy("user_id")
      .limit(1).collect()(0).getLong(0)
    val nBefore = before.count()
    val wantOther = before.filter(col("user_id") =!= u).collect().toSet

    Maintenance.updateWhere(spark, dir, "day", col("user_id") === u,
      Map("props" -> lit("{}"), "value" -> lit(0.0)))

    val after = spark.read.parquet(dir)
    assert(after.count() === nBefore)
    val scrubbed = after.filter(col("user_id") === u)
    assert(scrubbed.filter(col("props") =!= "{}" ||
      col("value") =!= 0.0).isEmpty, "matching rows fully scrubbed")
    assert(after.filter(col("user_id") =!= u).collect().toSet
      === wantOther, "non-matching rows bit-identical")
  }

  test("updateWhere refuses to rewrite the partition column") {
    val dir = tmpDir("graft-mutate-bad") + "/events"
    writeDayTable(dir)
    intercept[IllegalArgumentException] {
      Maintenance.updateWhere(spark, dir, "day", lit(true),
        Map("day" -> lit("2099-01-01")))
    }
  }
}
