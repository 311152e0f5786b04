package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared session for specs: one local session per suite, UTC, small
  * shuffle fan-out for test speed. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")

  override def afterAll(): Unit = {
    // sessions are shared across suites in one JVM; don't stop here
    super.afterAll()
  }

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  val sf0001 = "/root/testdata/sf0.001"

  /** Final physical-plan strings of EVERY QueryExecution fired while
    * `body` runs, in parquet stage mode — staged computations
    * ([[graft.scale.Staging.materialize]]) execute through a write
    * action whose plan flows past a QueryExecutionListener, so
    * scan-shape pins survive a subtree being staged (the
    * localCheckpoint default hides staged jobs from final-plan
    * inspection; round-15: the BM25 probe staging moved the
    * bucket-pruned scan out of the query's own executedPlan). AQE
    * explain prints the initial plan after the final one — only the
    * final section is kept. The listener bus is async; drain by
    * waiting for the plan count to go quiet. */
  def plansDuring(body: => Unit): Seq[String] = {
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        plans.add(qe.explainString(
            org.apache.spark.sql.execution.SimpleMode)
          .split("== Initial Plan ==").head)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    val oldMode = spark.conf.getOption(graft.scale.Staging.ModeConf)
    val oldDir = spark.conf.getOption(graft.scale.Staging.DirConf)
    spark.listenerManager.register(listener)
    try {
      spark.conf.set(graft.scale.Staging.ModeConf, "parquet")
      spark.conf.set(graft.scale.Staging.DirConf,
        tmpDir("plans-during"))
      body
      var last = -1
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 8000) {
        val now = plans.size
        if (now == last) stable += 1 else stable = 0
        last = now
        Thread.sleep(250); waited += 250
      }
    } finally {
      spark.listenerManager.unregister(listener)
      oldMode match {
        case Some(m) => spark.conf.set(graft.scale.Staging.ModeConf, m)
        case None => spark.conf.unset(graft.scale.Staging.ModeConf)
      }
      oldDir match {
        case Some(v) => spark.conf.set(graft.scale.Staging.DirConf, v)
        case None => spark.conf.unset(graft.scale.Staging.DirConf)
      }
    }
    val out = plans.toArray(Array.empty[String]).toSeq
    // Round-15 ADVICE: the listener bus is async and the drain above
    // is time-bounded — an empty capture would make every NEGATIVE
    // assertion built on this helper (plans.forall(!_.contains(...)))
    // pass vacuously, silently disarming the scan pins. Every call
    // site executes at least one action inside `body`, so zero
    // captured plans is a broken capture, never a valid result.
    assert(out.nonEmpty,
      "plansDuring captured no plans — listener bus drained empty; " +
        "negative plan pins would pass vacuously")
    out
  }
}
