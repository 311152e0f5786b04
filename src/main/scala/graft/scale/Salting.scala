package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffles — the manual fallback when AQE's
  * skew-join handling isn't available (e.g., stateful aggregations, or
  * build sides AQE can't split).
  *
  * A hot key (one campaign producing most events, SURVEY.md §1) sends
  * its whole partition to one task. Salting splits each key into
  * `salts` sub-keys: the skewed side gets a deterministic salt derived
  * from a high-cardinality column, the dimension side is replicated
  * once per salt. Both the join and the two-phase aggregation below
  * trade `salts`x replication/partials for an even task distribution.
  */
object Salting {

  /** Deterministic salt in [0, salts) from a discriminator column (an
    * id or hash-diverse column on the skewed side). */
  def saltCol(discriminator: Column, salts: Int): Column =
    pmod(xxhash64(discriminator), lit(salts.toLong)).cast("int")

  /** Skew-safe equi-join: skewed side salted by `discriminator`, dim
    * side exploded across all salt values. Result equals the plain
    * join; the shuffle key becomes (key, salt) so a hot key spreads
    * over `salts` tasks.
    */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
      discriminator: String, salts: Int = 8): DataFrame = {
    val saltedLeft = skewed.withColumn("_salt",
      saltCol(col(discriminator), salts))
    val saltedRight = dim.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }

  /** Skew-safe two-phase count: partial count per (key, salt), then
    * final sum per key — the groupBy analog of [[saltedJoin]]. Exactly
    * the partial/final split the MV pipeline already uses (SURVEY.md §2
    * E5), applied one level deeper.
    */
  def saltedCount(df: DataFrame, key: String, discriminator: String,
      salts: Int = 8): DataFrame =
    df.withColumn("_salt", saltCol(col(discriminator), salts))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("total"))
}
