package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the PQ expressions — pure-JVM fuzzing of
  * the encode/score kernels against naive reference implementations
  * (the specs pin behavior on real data; these pin the arithmetic on
  * arbitrary inputs).
  */
object PqProps extends Properties("Pq") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("PqProps")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  private def sc = spark.sparkContext

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(30)

  private val M = 4
  private val K = 5
  private val SubDim = 3
  private val Dim = M * SubDim

  private val comp: Gen[Double] =
    Gen.choose(-4.0, 4.0).map(x => math.rint(x * 64) / 64)
  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(Dim, comp).map(_.map(_.toFloat).toArray)
  private val booksGen: Gen[Array[Array[Array[Double]]]] =
    Gen.listOfN(M * K * SubDim, comp).map { xs =>
      xs.grouped(SubDim).map(_.toArray).grouped(K).map(_.toArray)
        .toArray
    }

  private def mkBooks(cents: Array[Array[Array[Double]]]): PqCodebooks =
    PqCodebooks(M, K, SubDim, cents,
      cents.map(_.map(c => c.map(x => x * x).sum)))

  private def naiveEncode(v: Array[Float],
      cb: PqCodebooks): Array[Int] =
    Array.tabulate(cb.m) { s =>
      val base = s * cb.subDim
      (0 until cb.k).minBy { j =>
        val d = (0 until cb.subDim).map(i =>
          v(base + i).toDouble - cb.cents(s)(j)(i))
        // L2 with deterministic lowest-index tie-break: minBy keeps
        // the first minimum, matching the expression's `<` compare
        (d.map(x => x * x).sum, j)
      }
    }

  property("PqEncode == naive per-sub-space L2 argmin") =
    Prop.forAll(vecGen, booksGen) { (v, cents) =>
      val cb = mkBooks(cents)
      val expr = PqEncode(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          org.apache.spark.sql.functions.lit(1)), sc.broadcast(cb))
      val got = expr.encode(new GenericArrayData(v.map(_.toDouble)))
        .map(_ & 0xff).toSeq
      got == naiveEncode(v, cb).toSeq
    }

  property("PqAdcCosine == cosine against the naive reconstruction") =
    Prop.forAll(vecGen, vecGen, booksGen) { (q, v, cents) =>
      val cb = mkBooks(cents)
      val enc = PqEncode(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          org.apache.spark.sql.functions.lit(1)), sc.broadcast(cb))
      val codes = enc.encode(new GenericArrayData(v.map(_.toDouble)))
      val qd = q.map(_.toDouble)
      val lut = Array(Array.tabulate(M) { s =>
        Array.tabulate(K) { j =>
          (0 until SubDim).map(i =>
            qd(s * SubDim + i) * cb.cents(s)(j)(i)).sum
        }
      })
      val qnorm = math.sqrt(qd.map(x => x * x).sum)
      val adc = PqAdcCosine(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          org.apache.spark.sql.functions.lit(1)),
        sc.broadcast(PqAdcLut(Array(7L), Array(qnorm), lut,
          cb.centNormSq)))
      val got = adc.cosines(codes).toDoubleArray()(0)
      // naive: reconstruct v-hat from the codes, cosine directly
      val vhat = Array.tabulate(Dim)(i =>
        cb.cents(i / SubDim)(codes(i / SubDim) & 0xff)(i % SubDim))
      val num = (0 until Dim).map(i => qd(i) * vhat(i)).sum
      val den = qnorm * math.sqrt(vhat.map(x => x * x).sum)
      val want = if (den == 0.0) 0.0 else num / den
      (math.abs(got - want) <= 1e-9) :| s"got $got want $want"
    }
}
