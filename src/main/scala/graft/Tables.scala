package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  * One narrow scan each; Catalyst prunes columns / pushes filters.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.parquet`'s `ts` physical type has varied across driver data
    * generations: parquet TIMESTAMP(NANOS) (which the vectorized reader
    * rejects — read nanos as long and integer-DIV to micros; a double
    * division would lose precision at epoch-nanos magnitudes) and plain
    * TIMESTAMP(MICROS) without UTC adjustment (reads as TIMESTAMP_NTZ —
    * cast to the session TimestampType; sessions pin UTC so the cast is
    * value-preserving). Normalize both to TimestampType micros, matching
    * DuckDB's oracle-side CAST(ts AS TIMESTAMP).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** `documents` / `embeddings` go through the same drift-proofing as
    * [[events]]: the driver regenerates the warehouse each round and
    * physical types have drifted before (events ts, round 7). Each
    * column is cast to the canonical engine type ONLY if the read
    * layout differs (`sameType` ignores nullability), so the common
    * case stays a bare pruned scan; a future int32 doc_id or
    * list<double> embedding then lands here instead of breaking every
    * downstream getLong/array<float> consumer. Layouts are pinned by
    * written-fixture tests in TablesSpec. */
  def documents(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    normalize(load(s, d, "documents"),
      Seq("doc_id" -> LongType, "n_chars" -> LongType))
  }

  def embeddings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType}
    normalize(load(s, d, "embeddings"),
      Seq("vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
        "label" -> IntegerType))
  }

  private def normalize(df: DataFrame,
      canon: Seq[(String, org.apache.spark.sql.types.DataType)]): DataFrame =
    canon.foldLeft(df) { case (cur, (name, t)) =>
      import org.apache.spark.sql.functions.{col, concat, lit, raise_error, when}
      // catalogString compare = nullability-insensitive type equality
      // (DataType.sameType is private[sql])
      if (cur.schema(name).dataType.catalogString == t.catalogString) cur
      else if (t == org.apache.spark.sql.types.IntegerType) {
        // guarded integral narrowing: a non-ANSI cast silently WRAPS
        // an out-of-range long (review-caught — the same silent-
        // downcast corruption castToRawSchema raises on elsewhere);
        // drift normalization must fail loudly, never relabel
        cur.withColumn(name,
          when(col(name).isNotNull &&
              (col(name) < Int.MinValue.toLong ||
                col(name) > Int.MaxValue.toLong),
            raise_error(concat(
              lit(s"normalize: $name value out of int range: "),
              col(name).cast("string"))))
            .otherwise(col(name)).cast(t))
      } else cur.withColumn(name, col(name).cast(t))
    }

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view so users can `spark.sql`
    * against the warehouse by name (events via its nanos-safe loader).
    */
  def registerViews(s: SparkSession, d: String): Unit = names.foreach {
    case "events" => events(s, d).createOrReplaceTempView("events")
    case n => load(s, d, n).createOrReplaceTempView(n)
  }
}
