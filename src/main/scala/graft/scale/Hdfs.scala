package graft.scale

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Path-scheme-correct FileSystem resolution.
  *
  * `FileSystem.get(conf)` resolves the DEFAULT filesystem, not the
  * scheme of the path being operated on — a store on a non-default FS
  * (an `s3a://` layout under an HDFS default, or vice versa) would
  * have its batch dirs listed/deleted on the wrong filesystem
  * (review-caught, round 9 ADVICE). Harmless on `local[*]` where
  * everything is `file://`, wrong on exactly the clusters this code
  * is designed for — so every store/layout helper resolves its
  * FileSystem from the path it operates on, through here.
  */
object Hdfs {

  def of(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def of(spark: SparkSession, path: Path): FileSystem =
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)
}
