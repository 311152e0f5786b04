package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Sampling

/** Deterministic sampling surface over the documents corpus — the
  * split/sample/stratify operators a training-data pipeline runs before
  * anything else. Hash-keyed (see [[graft.ops.Sampling]]), so each
  * query is exactly reproducible and oracle-paired.
  */
object SamplingQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 80/20 split summary: volumes and char mass per (split, lang).
    "sample_split_8020" -> ((s, d) =>
      Sampling.trainTestSplit(Tables.documents(s, d), col("doc_id"), 80)
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars"))
        .orderBy(col("split"), col("lang"))),

    // At most 5 docs per language, drawn by hash order.
    "sample_stratified_lang" -> ((s, d) =>
      Sampling.stratifiedFixedN(Tables.documents(s, d), col("lang"),
          col("doc_id"), 5)
        .select(col("lang"), col("doc_id"), col("source"))
        .orderBy(col("lang"), col("doc_id")))
  )

  private val hash = "(doc_id * 2654435761) % 4294967296"

  val oracles: Map[String, String] = Map(
    "sample_split_8020" ->
      s"""SELECT CASE WHEN $hash % 100 < 80 THEN 'train' ELSE 'test' END
        |  AS split, lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sample_stratified_lang" ->
      s"""SELECT lang, doc_id, source FROM documents
        |QUALIFY row_number() OVER (PARTITION BY lang
        |  ORDER BY $hash % 1073741824, doc_id) <= 5
        |ORDER BY lang, doc_id""".stripMargin
  )
}
