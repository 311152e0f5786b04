package graft.scale

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout — multi-dimensional data skipping for
  * the 100 TB scan path.
  *
  * Partition/sort layout prunes on ONE leading column; a query filtering
  * the second sort column still reads every file because each file spans
  * that column's full range. Interleaving the bits of several columns'
  * range-bucket ranks into one sort key clusters files in ALL of them at
  * once: every file covers a small hyper-rectangle, so parquet
  * row-group/file min-max stats prune scans on ANY of the z-ordered
  * columns. This is the same mechanism lakehouse engines expose as
  * `OPTIMIZE ... ZORDER BY`, built here from plain Spark pieces:
  * driver-side approx-quantile cut points (tiny), a codegen'd
  * bucket-rank + bit-interleave expression, and a range-partitioned
  * sorted write — no shuffle beyond the one the rewrite itself needs.
  */
object ZOrder {

  /** Bits per dimension; 2 dims x 8 bits = 65 536 z-cells, plenty to
    * separate files while keeping cut-point arrays literal-sized. */
  val BitsPerDim = 8

  /** Rank `c` into 0..2^bits-1 by the given ascending cut points
    * (length 2^bits - 1): the count of cut points <= c. A HOF over a
    * literal array — codegen'd, no UDF, null-safe (nulls rank 0 and
    * sort first, matching nulls-first file stats).
    */
  private[scale] def bucketRank(c: Column, cuts: Seq[Double]): Column =
    coalesce(
      size(filter(
        array(cuts.map(lit): _*),
        cut => c.cast("double") >= cut)),
      lit(0))

  /** Interleave the low `BitsPerDim` bits of the per-dimension ranks
    * (dimension 0 gets the higher bit of each pair). Pure integer
    * Column arithmetic — whole-stage codegen keeps this in the write
    * pipeline's tight loop.
    */
  private[scale] def interleave(ranks: Seq[Column]): Column = {
    val d = ranks.length
    val terms = for {
      bit <- 0 until BitsPerDim
      (r, dim) <- ranks.zipWithIndex
    } yield shiftleft(
      shiftright(r, bit).bitwiseAND(lit(1)),
      bit * d + (d - 1 - dim))
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** The z-value column for `cols` of `df`: approx-quantile cut points
    * per column (one driver-side pass over column sketches — KBs), then
    * rank + interleave as a single codegen'd expression.
    */
  def zValue(df: DataFrame, cols: Seq[String]): Column = {
    val nCuts = (1 << BitsPerDim) - 1
    val probs = (1 to nCuts).map(_.toDouble / (nCuts + 1)).toArray
    val ranks = cols.map { c =>
      val cuts = df.stat.approxQuantile(c, probs, 0.001).toSeq.distinct
      bucketRank(col(c), cuts)
    }
    interleave(ranks)
  }

  /** Rewrite `df` z-ordered by `cols` into `numFiles` files: range
    * partition by the z-value (contiguous curve segments per file) and
    * sort within each — every output file covers a compact
    * hyper-rectangle of the z-ordered columns, which is exactly what
    * min-max pruning needs.
    */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int): Unit = {
    val z = zValue(df, cols).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Fraction of files a range predicate on `c` must read under
    * min-max skipping: files whose [min, max] of `c` intersects
    * [lo, hi]. Diagnostic for tests/layout tuning — mirrors the pruning
    * decision parquet readers make from footer stats.
    */
  def fileSurvivalFraction(df: DataFrame, c: String,
      lo: Double, hi: Double): Double = {
    val stats = df
      .groupBy(input_file_name().as("f"))
      .agg(min(col(c).cast("double")).as("mn"),
        max(col(c).cast("double")).as("mx"))
      .collect()
    val hit = stats.count(r => r.getDouble(2) >= lo && r.getDouble(1) <= hi)
    hit.toDouble / stats.length
  }
}
