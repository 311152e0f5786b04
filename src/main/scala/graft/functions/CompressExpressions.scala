package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native `deflate_ratio(text)`: DEFLATE-compressed size over raw
  * UTF-8 size — the compression-ratio quality signal large pretraining
  * pipelines gate on (Gopher's repetition filters approximate it;
  * FineWeb/CCNet-style curation uses it directly): highly repetitive
  * or templated text compresses far below natural prose, and
  * near-random bytes sit at ~1.0+.
  *
  * Determinism contract: fixed compression level, raw-deflate (no
  * zlib header), one shared code path — the value is a pure function
  * of the bytes within any one JVM/zlib build, which is what a gate
  * threshold and the engine's replay/retry semantics need. It is NOT
  * pinned across zlib versions, so the registered query is rows-only
  * and the spec asserts ORDER and RANGE properties (repetitive <<
  * natural < random), never exact byte counts.
  *
  * Scale shape: per-thread [[java.util.zip.Deflater]] reuse (native
  * allocation amortized across every row the executor thread
  * processes — bounded by thread count, reset per row), streaming
  * into a fixed scratch buffer whose bytes are COUNTED, never kept:
  * O(1) heap at any document size.
  */
object Compress {
  private val deflaters =
    ThreadLocal.withInitial[java.util.zip.Deflater](() =>
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION,
        /* nowrap = raw deflate, no header bytes skewing short docs */
        true))

  /** compressed/raw byte ratio; 0.0 for empty input (nothing to
    * compress — callers gate on doc length separately). */
  def ratio(bytes: Array[Byte]): Double = {
    if (bytes.isEmpty) return 0.0
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val scratch = new Array[Byte](8192)
    var out = 0L
    while (!d.finished()) out += d.deflate(scratch)
    out.toDouble / bytes.length
  }
}

case class DeflateRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio expects string, got ${t.catalogString}")
  }

  /** Public so generated code calls it through the referenced
    * expression object (the CentroidTopCells pattern). */
  def compute(s: UTF8String): Double = Compress.ratio(s.getBytes)

  override def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("deflateRatio", this,
      classOf[DeflateRatio].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "deflate_ratio"
}

object CompressFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def deflate_ratio(text: Column): Column =
    ColumnBridge.column(DeflateRatio(ColumnBridge.expression(text)))
}
