package graft.agg

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SummingStoreSpec extends SparkSpec {
  import spark.implicits._

  private def store(path: String) =
    new SummingStore(path, Seq("day", "level"), Seq("total"))

  private def partials(rows: (String, String, Long)*) =
    rows.toDF("day", "level", "total")
      .withColumn("day", col("day").cast("date"))

  test("append partials then read re-sums by key") {
    val path = tmpDir("sumstore")
    val s = store(path)
    s.append(partials(("2026-01-01", "info", 2L),
      ("2026-01-01", "error", 1L)), batchId = 0)
    s.append(partials(("2026-01-01", "info", 3L),
      ("2026-01-02", "info", 5L)), batchId = 1)
    val got = s.read(spark).orderBy("day", "level").collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("2026-01-01", "error", 1L),
      ("2026-01-01", "info", 5L), ("2026-01-02", "info", 5L)))
  }

  test("batchId rewrite is idempotent (streaming replay safety)") {
    val path = tmpDir("sumstore")
    val s = store(path)
    s.append(partials(("2026-01-01", "info", 2L)), batchId = 0)
    // replayed epoch writes the same batch again
    s.append(partials(("2026-01-01", "info", 2L)), batchId = 0)
    val got = s.read(spark).collect().map(r => r.getLong(2))
    assert(got.toSeq == Seq(2L))
  }

  test("compact preserves totals and collapses partial rows") {
    val path = tmpDir("sumstore")
    val s = store(path)
    (0 until 5).foreach(i =>
      s.append(partials(("2026-01-01", "info", 1L)), batchId = i.toLong))
    val before = s.read(spark).collect().map(r => r.getLong(2)).toSeq
    s.compact(spark)
    val after = s.read(spark).collect().map(r => r.getLong(2)).toSeq
    assert(before == Seq(5L) && after == Seq(5L))
    // after compaction a single batch dir remains
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName)
    assert(dirs.toSeq == Seq("batch=compacted"))
  }

  test("readAsOf time-travels the append log; compaction closes it") {
    import spark.implicits._
    val store = new SummingStore(tmpDir("summing-asof") + "/t",
      Seq("level"), Seq("total"))
    store.append(Seq(("click", 3L)).toDF("level", "total"), batchId = 0L)
    store.append(Seq(("click", 4L), ("open", 1L))
      .toDF("level", "total"), batchId = 1L)

    def totals(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals(store.readAsOf(spark, 0L)) == Map("click" -> 3L))
    assert(totals(store.readAsOf(spark, 1L))
      == Map("click" -> 7L, "open" -> 1L))
    // as-of at the head equals the live read
    assert(totals(store.readAsOf(spark, 1L)) == totals(store.read(spark)))

    store.compact(spark)
    assert(totals(store.read(spark))
      == Map("click" -> 7L, "open" -> 1L), "compaction preserves totals")
    intercept[IllegalArgumentException] {
      store.readAsOf(spark, 0L).collect()
    }
  }
}
