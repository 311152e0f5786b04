package graft.scale

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Pins scale/Staging: the size-guarded broadcast picks the broadcast
  * plan under the row threshold and falls back to a shuffle join over
  * it, and the parquet stage mode produces the same rows as the
  * localCheckpoint mode (the capstone query is the integration case).
  */
class StagingSpec extends SparkSpec {
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) =>
      k -> spark.conf.getOption(k)
    }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def joinPlan(): String = {
    val facts = (1 to 1000).map(i => (i % 10, i.toLong)).toDF("k", "v")
    val dim = (0 until 10).map(i => (i, s"name$i")).toDF("k", "name")
    facts.join(Staging.guardedBroadcast(dim), "k")
      .queryExecution.executedPlan.toString
  }

  test("guardedBroadcast under threshold plans a broadcast join") {
    // auto-broadcast off so the plan shape is decided by the hint alone
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      assert(joinPlan().contains("BroadcastHashJoin"))
    }
  }

  test("guardedBroadcast over threshold falls back to a shuffle join") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
        Staging.BroadcastRowsConf -> "5") {
      val plan = joinPlan()
      assert(!plan.contains("BroadcastHashJoin"), plan)
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), plan)
    }
  }

  test("parquet stage mode returns the same rows and cuts lineage") {
    val df = (1 to 100).map(i => (i, i * 2L)).toDF("id", "dbl")
    withConf(Staging.ModeConf -> "parquet",
        Staging.DirConf -> tmpDir("stage")) {
      val staged = Staging.materialize(df, "spec")
      assert(staged.orderBy("id").collect().toSeq
        == df.orderBy("id").collect().toSeq)
      // the stage is a plain file scan — re-readable by ANY executor,
      // unlike checkpoint blocks pinned to the one that wrote them
      assert(staged.queryExecution.executedPlan.toString
        .contains("FileScan parquet"))
    }
  }

  test("capstone pipeline: parquet stage mode matches local mode") {
    val local = graft.query.CurationQueries
      .queries("pipeline_pretraining_corpus")(spark, sf0001)
      .collect().toSeq
    withConf(Staging.ModeConf -> "parquet",
        Staging.DirConf -> tmpDir("stage-capstone")) {
      val staged = graft.query.CurationQueries
        .queries("pipeline_pretraining_corpus")(spark, sf0001)
        .collect().toSeq
      assert(staged == local)
    }
  }

  test("capstone gate joins shuffle when the gram-flag list is too big") {
    // force the fallback: with maxRows=0 nothing broadcasts, and the
    // query must still produce identical results via shuffle joins
    val local = graft.query.CurationQueries
      .queries("pipeline_pretraining_corpus")(spark, sf0001)
      .collect().toSeq
    withConf(Staging.BroadcastRowsConf -> "0",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val fallback = graft.query.CurationQueries
        .queries("pipeline_pretraining_corpus")(spark, sf0001)
        .collect().toSeq
      assert(fallback == local)
    }
  }

  test("stage mode defaults by master URL: local masters checkpoint, " +
      "cluster masters stage to parquet") {
    // pure mode choice per (master, shared-stage-dir): local masters
    // always checkpoint; cluster masters stage to parquet only when a
    // shared stage location exists (explicit DirConf or a non-file
    // default FS) — a file://-default cluster with no DirConf would
    // stage to per-machine local dirs and silently lose partitions
    assert(Staging.defaultModeFor("local[4]", true) == "local")
    assert(Staging.defaultModeFor("local[*]", false) == "local")
    // local-cluster spawns real separate executor JVMs -> losable;
    // and it is single-machine by construction, so file:// counts as
    // shared — parquet regardless of the shared-dir guard
    assert(Staging.defaultModeFor("local-cluster[2,1,1024]", true)
      == "parquet")
    assert(Staging.defaultModeFor("local-cluster[2,1,1024]", false)
      == "parquet")
    assert(Staging.defaultModeFor("spark://host:7077", true) == "parquet")
    assert(Staging.defaultModeFor("yarn", true) == "parquet")
    assert(Staging.defaultModeFor("k8s://https://host:443", true)
      == "parquet")
    // no shared stage dir -> the parquet stage would be WORSE than
    // the fragile checkpoint; keep local
    assert(Staging.defaultModeFor("spark://host:7077", false) == "local")
    assert(Staging.defaultModeFor("yarn", false) == "local")
    // and on THIS local session with no conf set, materialize takes
    // the localCheckpoint path (LogicalRDD: lineage truncated into
    // block storage, no parquet round-trip)
    val saved = spark.conf.getOption(Staging.ModeConf)
    try {
      spark.conf.unset(Staging.ModeConf)
      val staged = Staging.materialize(
        Seq((1, "a"), (2, "b")).toDF("k", "v"), "mode-default")
      assert(staged.queryExecution.analyzed.getClass.getSimpleName
          == "LogicalRDD",
        staged.queryExecution.analyzed.getClass.getName)
      assert(staged.collect().length == 2)
    } finally saved.foreach(spark.conf.set(Staging.ModeConf, _))
  }
}
