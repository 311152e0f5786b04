package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: per-TABLE FileScan counts for every registered
  * query, measured across EVERY QueryExecution the query fires
  * (parquet stage mode, so staged computations are visible — the
  * PlanShapeSpec countColumnScans machinery as a sweep). A table
  * scanned 3+ times in one query usually means a shared subtree is
  * re-computed per consumer: the class the BM25/unigram staging fixes
  * removed. Args: [0] query-name substring filter (optional), [1]
  * dataset dir (optional; also via SPARK_GRAFT_SF_DIR, defaulting to
  * the sf0.001 fixture) — so the sweep can target any scale factor or
  * layout, not one machine's path.
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.drop(1).headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.001")
    val filter = args.headOption.getOrElse("")
    val tables = Seq("region", "nation", "customer", "supplier",
      "part", "orders", "lineitem", "events", "documents",
      "embeddings")
    val scanRe = ("FileScan parquet [^\\n]*/(" +
      tables.mkString("|") + ")\\.parquet").r
    val hits = new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicInteger]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        val plan = qe.explainString(
            org.apache.spark.sql.execution.SimpleMode)
          .split("== Initial Plan ==").head
        scanRe.findAllMatchIn(plan).foreach { m =>
          hits.computeIfAbsent(m.group(1),
            _ => new java.util.concurrent.atomic.AtomicInteger)
            .incrementAndGet()
        }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    spark.conf.set(graft.scale.Staging.ModeConf, "parquet")
    spark.conf.set(graft.scale.Staging.DirConf,
      java.nio.file.Files.createTempDirectory("scanaudit").toString)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.contains(filter)).foreach { case (name, fn) =>
        hits.clear()
        try {
          fn(spark, sf).collect()
          // drain the async listener bus
          var last = -1
          var stable = 0
          var waited = 0
          while (stable < 2 && waited < 8000) {
            val now = hits.values().stream()
              .mapToInt(_.get()).sum()
            if (now == last) stable += 1 else stable = 0
            last = now
            Thread.sleep(250); waited += 250
          }
          val counts = new java.util.TreeMap[String, Integer]()
          hits.forEach((k, v) => counts.put(k, v.get()))
          val flagged = counts.entrySet().stream()
            .filter(_.getValue > 2).count()
          val marker = if (flagged > 0) "  <-- 3+" else ""
          println(s"$name: $counts$marker")
        } catch {
          case e: Throwable =>
            println(s"$name: ERROR ${e.getClass.getSimpleName}")
        }
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
    spark.stop()
  }
}
