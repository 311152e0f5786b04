package graft.scale

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Pins the ClickHouse-PROJECTION analog: layout selection by filter
  * columns, row parity across layouts, and the actual point — file
  * pruning on the projection's key where the base layout reads
  * everything. */
class ProjectionSpec extends SparkSpec {

  test("projection routing, parity, and trailing-column pruning") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val path = tmpDir("graft-proj") + "/lineitem"
    Projection.write(li, path, Seq("l_orderkey"), files = 16)
    Projection.addProjection(spark, path, "by_part",
      Seq("l_partkey"), files = 16)

    // routing: filters on the projection key pick the projection,
    // anything else falls back to base
    assert(Projection.choose(spark, path, Set("l_partkey")) === "proj_by_part")
    assert(Projection.choose(spark, path, Set("l_orderkey")) === "base")
    assert(Projection.choose(spark, path, Set("l_quantity")) === "base")
    assert(Projection.choose(spark, path,
      Set("l_partkey", "l_orderkey")) === "base",
      "tie on prefix length 1 must prefer base")

    // parity: layouts are the same logical table
    val base = spark.read.parquet(s"$path/base")
    val proj = Projection.scan(spark, path, Set("l_partkey"))
    assert(proj.count() === li.count())
    assert(proj.exceptAll(base).isEmpty && base.exceptAll(proj).isEmpty)

    // pruning: a 10% partkey slab skips most projection files but no
    // base files (partkey is unsorted trailing noise there)
    val mm = li.agg(min("l_partkey"), max("l_partkey")).head()
    val (lo, hi) = (mm.getLong(0).toDouble, mm.getLong(1).toDouble)
    val slabHi = lo + (hi - lo) * 0.1
    val projFrac = ZOrder.fileSurvivalFraction(proj, "l_partkey", lo, slabHi)
    val baseFrac = ZOrder.fileSurvivalFraction(base, "l_partkey", lo, slabHi)
    info(f"partkey-slab file survival: projection $projFrac%.2f vs base $baseFrac%.2f")
    assert(baseFrac === 1.0, s"base should not prune on partkey: $baseFrac")
    assert(projFrac <= 0.3, s"projection should prune hard: $projFrac")
  }
}
