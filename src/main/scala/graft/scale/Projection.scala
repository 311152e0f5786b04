package graft.scale

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** ClickHouse PROJECTION analog: secondary physical layouts of ONE
  * logical table, chosen automatically at read time by the filter
  * columns — the answer to "my table is sorted by (campaign, time) but
  * this query filters on email".
  *
  * A projection here is a full sorted copy (range-partitioned +
  * sorted-within-files by its own key), so parquet min/max file stats
  * prune scans on ITS leading columns; [[scan]] picks the layout whose
  * sort key has the longest leading prefix inside the query's filter
  * column set, exactly like ClickHouse's projection selection. Storage
  * cost × layouts, read cost ÷ (pruning on every layout's key) — the
  * standard trade, and at 100 TB the projection rewrite is the same
  * one-shuffle job per layout as any sorted write, maintained
  * incrementally by re-running [[addProjection]] on changed partitions
  * (or Z-ORDER one layout — [[ZOrder]] — when two columns must share a
  * single copy).
  *
  * ClickHouse's AGGREGATE projections (pre-grouped rollups) are the
  * other half of the feature; that role is filled by the MV path
  * ([[graft.agg.SummingStore]] / DailyRollup), which this class
  * deliberately does not duplicate.
  */
object Projection {

  private def metaPath(layoutDir: Path) = new Path(layoutDir, "_graft_sort")

  private def fs(spark: SparkSession, path: String): FileSystem =
    Hdfs.of(spark, path)

  private def writeLayout(df: DataFrame, dir: String,
      sortCols: Seq[String], files: Int): Unit = {
    df.repartitionByRange(files, col(sortCols.head))
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(dir)
    val f = fs(df.sparkSession, dir)
    val out = f.create(metaPath(new Path(dir)), true)
    try out.write(sortCols.mkString(",")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Write the base layout of the table under `path/base`. */
  def write(df: DataFrame, path: String, sortCols: Seq[String],
      files: Int = 16): Unit =
    writeLayout(df, s"$path/base", sortCols, files)

  /** Materialize an additional layout (`path/proj_<name>`) sorted by
    * `sortCols`, from the base layout. */
  def addProjection(spark: SparkSession, path: String, name: String,
      sortCols: Seq[String], files: Int = 16): Unit =
    writeLayout(spark.read.parquet(s"$path/base"),
      s"$path/proj_$name", sortCols, files)

  /** All layouts: name -> sort columns ("base" included). */
  def layouts(spark: SparkSession, path: String): Map[String, Seq[String]] = {
    val f = fs(spark, path)
    f.listStatus(new Path(path)).toSeq
      .filter(st => st.isDirectory && f.exists(metaPath(st.getPath)))
      .map { st =>
        val in = f.open(metaPath(st.getPath))
        val cols =
          try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8).split(",").toSeq
          finally in.close()
        st.getPath.getName -> cols
      }.toMap
  }

  /** The layout [[scan]] would use for a query filtering on
    * `filterCols`: longest leading-prefix of a layout's sort key
    * contained in the filter set wins; ties (and no match) fall back
    * to "base". Exposed for tests and EXPLAIN-style tooling. */
  def choose(spark: SparkSession, path: String,
      filterCols: Set[String]): String = {
    def prefixLen(sortCols: Seq[String]): Int =
      sortCols.takeWhile(filterCols.contains).length
    val all = layouts(spark, path)
    val best = all.toSeq
      .sortBy { case (name, cols) =>
        (-prefixLen(cols), if (name == "base") 0 else 1, name)
      }.head
    if (prefixLen(best._2) == 0) "base" else best._1
  }

  /** Read the table through the best layout for `filterCols`. Every
    * layout holds identical rows, so this only changes which files the
    * engine can SKIP, never the result. */
  def scan(spark: SparkSession, path: String,
      filterCols: Set[String]): DataFrame =
    spark.read.parquet(s"$path/${choose(spark, path, filterCols)}")
}
