package graft.scale

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave matches a driver-side Morton reference") {
    def morton(a: Int, b: Int): Int =
      (0 until ZOrder.BitsPerDim).map { bit =>
        (((a >> bit) & 1) << (2 * bit + 1)) | (((b >> bit) & 1) << (2 * bit))
      }.sum
    val pairs = Seq((0, 0), (5, 3), (255, 255), (1, 128), (170, 85))
    val got = pairs.toDF("a", "b")
      .select(ZOrder.interleave(Seq(col("a"), col("b"))).as("z"))
      .collect().map(_.getInt(0))
    assert(got.toSeq == pairs.map { case (a, b) => morton(a, b) })
  }

  test("bucketRank counts cut points at or below the value, nulls first") {
    val cuts = Seq(10.0, 20.0, 30.0)
    val got = Seq[(java.lang.Integer)](5, 10, 25, 99, null).toDF("v")
      .select(ZOrder.bucketRank(col("v"), cuts).as("r"))
      .collect().map(_.getInt(0))
    assert(got.toSeq == Seq(0, 1, 2, 3, 0))
  }

  test("z-order layout prunes files on BOTH columns; linear sort only on one") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val files = 16
    val zPath = tmpDir("zorder") + "/z"
    val lexPath = tmpDir("zorder") + "/lex"
    ZOrder.writeZOrdered(li, zPath, Seq("l_orderkey", "l_partkey"), files)
    // the linear baseline: same file count, range-partitioned + sorted
    // by the leading column only (the best single-column layout)
    li.repartitionByRange(files, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"), col("l_partkey"))
      .write.mode("overwrite").parquet(lexPath)

    val z = spark.read.parquet(zPath)
    val lex = spark.read.parquet(lexPath)
    val Seq(pkLo, pkHi) = {
      val mm = li.agg(min("l_partkey"), max("l_partkey")).head()
      val (lo, hi) = (mm.getLong(0).toDouble, mm.getLong(1).toDouble)
      Seq(lo, lo + (hi - lo) * 0.1) // a 10% slab of the partkey domain
    }
    val zFrac = ZOrder.fileSurvivalFraction(z, "l_partkey", pkLo, pkHi)
    val lexFrac = ZOrder.fileSurvivalFraction(lex, "l_partkey", pkLo, pkHi)
    info(f"partkey-slab file survival: zorder $zFrac%.2f vs linear $lexFrac%.2f")
    // the linear layout cannot prune on the trailing column at all
    assert(lexFrac == 1.0, s"expected no trailing-column pruning, got $lexFrac")
    assert(zFrac <= 0.7, s"z-order should skip files on partkey, got $zFrac")

    // and the z-ordered layout still prunes on the leading column too
    val okLo = {
      val mm = li.agg(min("l_orderkey"), max("l_orderkey")).head()
      (mm.getLong(0).toDouble, mm.getLong(1).toDouble)
    }
    val zOk = ZOrder.fileSurvivalFraction(z, "l_orderkey",
      okLo._1, okLo._1 + (okLo._2 - okLo._1) * 0.1)
    info(f"orderkey-slab file survival under zorder: $zOk%.2f")
    assert(zOk <= 0.7, s"z-order lost leading-column pruning: $zOk")

    // layout changes bytes, never rows
    assert(z.count() == li.count() && lex.count() == li.count())
  }
}
