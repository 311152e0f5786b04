package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions.{vec_dot, vec_norm}

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot matches manual computation on float and double arrays") {
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    assert(df.select(vec_dot(col("a"), col("b"))).head().getDouble(0)
      == 32.0)
    val dd = df.select(transform(col("a"), _.cast("double")).as("a"),
      col("b"))
    assert(dd.select(vec_dot(col("a"), col("b"))).head().getDouble(0)
      == 32.0, "mixed double/float arrays")
  }

  test("vec_norm is the L2 norm") {
    val df = Seq(Tuple1(Array(3f, 4f))).toDF("a")
    assert(df.select(vec_norm(col("a"))).head().getDouble(0) == 5.0)
  }

  test("null inputs yield null") {
    val df = Seq((Some(Array(1f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    assert(df.select(vec_dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("interpreted (non-codegen) eval path agrees") {
    val rec = VectorDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1f, 2f),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(3f, 4f),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    assert(rec.eval(null) == 11.0)
  }

  test("SQL registration via GraftExtensions") {
    GraftExtensions.register(spark)
    Seq((Array(1f, 0f), Array(0f, 1f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val r = spark.sql(
      "SELECT vec_dot(a, b) AS d, vec_norm(a) AS n FROM vecs").head()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 1.0)
  }
}
