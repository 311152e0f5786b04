package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Pins TopK.topK (SpaceSaving heavy hitters): exact when capacity
  * covers the vocabulary, and in the genuinely-approximate regime the
  * SpaceSaving guarantees — overestimate bounded by err_max, true
  * count never above the estimate, heavy items never evicted. */
class TopKSpec extends SparkSpec {

  private def words = Tables.documents(spark, sf0001)
    .select(explode(split(lower(col("text")), "[^a-z]+")).as("token"))
    .filter(col("token") =!= "")

  test("capacity >= vocabulary => identical to exact groupBy count") {
    val approx = TopK.topK(words, col("token"), k = 100, capacity = 4096)
    val exact = words.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(100)
    val a = approx.select("term", "cnt_est").collect().map(r =>
      (r.getString(0), r.getLong(1)))
    val e = exact.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(a.toSeq === e.toSeq)
    assert(approx.filter(col("err_max") =!= 0).isEmpty,
      "no eviction may occur below capacity, so every row certifies exact")
  }

  test("topKWeighted: exact weight sums below capacity, bounds when evicting") {
    import spark.implicits._
    // weighted truth: item i carries total weight 1000 * (51 - i)
    val rows = (1 to 50).flatMap(i =>
      Seq.fill(10)((f"p$i%02d", (51 - i) * 100L)))
    val df = spark.sparkContext.parallelize(rows, 4).toDF("item", "w")
    val exact = TopK.topKWeighted(df, col("item"), col("w"), k = 50,
        capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(exact.length === 50)
    exact.foreach { case (t, est, err) =>
      val i = t.drop(1).toInt
      assert(est === (51 - i) * 1000L && err === 0L,
        s"$t: expected exact weight sum, got ($est, $err)")
    }
    // Trim-heavy regime (capacity 16 ≪ 50 distinct): merging trimmed
    // summaries compounds the absent-item floors, so upper-bound
    // ESTIMATES of mid items can legitimately leapfrog heavies — only
    // the bounds are merge-order-robust here (the scaladoc's
    // capacity ≫ k guidance exists exactly because of this regime).
    val truth = rows.groupBy(_._1).map { case (k, v) =>
      k -> v.map(_._2).sum
    }
    val approx = TopK.topKWeighted(df, col("item"), col("w"), k = 10,
        capacity = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(approx.nonEmpty)
    approx.foreach { case (t, est, err) =>
      assert(est >= truth(t) && est - err <= truth(t),
        s"$t: weighted SpaceSaving bounds violated")
    }
  }

  test("small capacity on a skewed stream: bounds hold, heavies survive") {
    import spark.implicits._
    // Zipf-ish planted stream: item i appears ceil(2000 / i) times.
    val stream = (1 to 50).flatMap(i =>
      Seq.fill(math.ceil(2000.0 / i).toInt)(f"item$i%02d"))
    // Deterministic multi-partition layout (approximation must engage
    // in both reduce-eviction and summary-merge paths).
    val df = spark.sparkContext.parallelize(stream, 8).toDF("token")
    val truth = stream.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong
    }
    val got = TopK.topK(df, col("token"), k = 10, capacity = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 10)
    got.foreach { case (term, est, err) =>
      val t = truth(term)
      assert(est >= t, s"$term: SpaceSaving never underestimates")
      assert(est - err <= t, s"$term: overestimate must be within err_max")
    }
    // Presence: the dominant item (true count 2000, ~2x the runner-up
    // and far above any light item's worst-case inflation of
    // true + sum-of-merge-floors ~= 1100) must survive any merge
    // order. Lighter heavies CAN legitimately reorder vs inflated
    // light items, so only the safely-dominant one is asserted.
    val kept = got.map(_._1).toSet
    assert(kept.contains("item01"),
      s"the dominant item must survive eviction and merges, got $kept")
  }

  test("negative weights are refused, not silently absorbed") {
    import spark.implicits._
    // a negative weight would invalidate the floor/err_max soundness
    // guarantees — both the direct buffer and the SQL aggregate
    // surface must reject it rather than corrupt the summary
    val b = new TopK.SpaceSavingBuffer(4)
    intercept[IllegalArgumentException] {
      b.add(org.apache.spark.unsafe.types.UTF8String.fromString("x"), -1L)
    }
    graft.functions.GraftExtensions.register(spark)
    val df = Seq(("a", 5L), ("b", -3L)).toDF("item", "w")
    val e = intercept[Exception] {
      df.selectExpr("space_saving_topk(item, w, 8)").collect()
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else t.toString +: causes(t.getCause)
    assert(causes(e).exists(_.contains("negative weight")), causes(e))
  }
}
