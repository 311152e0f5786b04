package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Gram-bloom primitives behind [[graft.scale.TextSkipIndex]] — the
  * ClickHouse `ngrambf_v1` / `tokenbf_v1` granule-index analog
  * (kafka+clickhouse.md:132-141 creates the table layout such indexes
  * attach to). A text predicate parquet cannot push down (substring
  * or token containment) gets a skip structure instead: one bloom per
  * data file over every gram of every row's text, probed with the
  * needle's grams — a file may be skipped iff ANY needle gram is
  * rejected (all grams of a true match are necessarily present, so
  * skipping is exact; false positives only cost a scan).
  *
  * `n >= 2` selects character n-grams (`ngrambf_v1(n)`); `n == 0`
  * selects alphanumeric tokens (`tokenbf_v1`). Both sides — the
  * build aggregate and the probe — derive grams through the one
  * shared [[GramBloom.grams]], so they can never disagree on
  * tokenization.
  *
  * Scale shape: the aggregate is a [[TypedImperativeAggregate]], so
  * grouping rows by file runs as an ObjectHashAggregate with map-side
  * partials — each input partition inserts its rows' grams locally
  * and only the fixed-size bloom bitsets (not text) cross the
  * shuffle. The probe is a per-row predicate over the sidecar table
  * (one row per data file), evaluated distributed — the driver never
  * holds all blooms, only the surviving file names.
  */
object GramBloom {

  /** Token separator of the `n == 0` mode — also the contract for
    * query-side exact filters (`split(text, TokenSep)`) and any
    * oracle (`regexp_split_to_array(text, ...)`). */
  val TokenSep = "[^A-Za-z0-9]+"

  private val tokenPattern = Pattern.compile(TokenSep)

  /** All grams of `text`: character n-grams for `n >= 2`, non-empty
    * alphanumeric tokens for `n == 0`. Text shorter than n has no
    * grams (and is therefore unprunable — see [[GramBloomAdmits]]). */
  def grams(text: String, n: Int): Iterator[String] =
    if (n == 0) tokenPattern.split(text).iterator.filter(_.nonEmpty)
    else if (text.length < n) Iterator.empty
    else (0 to text.length - n).iterator.map(i => text.substring(i, i + n))

  private def requireParams(n: Int, expectedGrams: Long,
      fpp: Double): Unit = {
    require(n == 0 || n >= 2,
      s"gram_bloom n must be 0 (tokens) or >= 2 (char n-grams), got $n")
    require(expectedGrams >= 1,
      s"gram_bloom expectedGrams must be >= 1, got $expectedGrams")
    require(fpp > 0 && fpp < 0.5,
      s"gram_bloom fpp must be in (0, 0.5), got $fpp")
  }

  private[functions] def encode(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  private[functions] def decode(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  /** Codegen/eval helper: does the encoded bloom admit every gram?
    * (Vacuously true on an empty gram set — an unprunable needle.) */
  def admitsAll(bytes: Array[Byte], grams: Array[String]): Boolean = {
    val bf = decode(bytes)
    var i = 0
    while (i < grams.length) {
      if (!bf.mightContainString(grams(i))) return false
      i += 1
    }
    true
  }

  /** `gram_bloom(text, n, expectedGrams, fpp)` -> BINARY: a bloom
    * over every gram of every non-null input row. All buffers of one
    * aggregation share (expectedGrams, fpp), so partial merges are
    * compatible by construction. */
  case class GramBloomAgg(
      child: Expression,
      n: Int,
      expectedGrams: Long,
      fpp: Double,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[BloomFilter]
      with UnaryLike[Expression] {
    requireParams(n, expectedGrams, fpp)

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType != StringType)
        TypeCheckResult.TypeCheckFailure(
          s"gram_bloom expects a STRING column, got " +
            child.dataType.catalogString)
      else TypeCheckResult.TypeCheckSuccess

    override def createAggregationBuffer(): BloomFilter =
      BloomFilter.create(expectedGrams, fpp)

    override def update(buf: BloomFilter,
        input: InternalRow): BloomFilter = {
      val v = child.eval(input)
      if (v != null) grams(v.toString, n).foreach(buf.putString)
      buf
    }

    override def merge(buf: BloomFilter,
        other: BloomFilter): BloomFilter = buf.mergeInPlace(other)

    override def eval(buf: BloomFilter): Any = encode(buf)
    override def serialize(buf: BloomFilter): Array[Byte] = encode(buf)
    override def deserialize(storage: Array[Byte]): BloomFilter =
      decode(storage)

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false

    override def withNewMutableAggBufferOffset(
        newOffset: Int): GramBloomAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(
        newOffset: Int): GramBloomAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(
        newChild: Expression): GramBloomAgg = copy(child = newChild)

    override def prettyName: String = "gram_bloom"
  }

  /** `gram_bloom_admits(bloom)` for a fixed needle: true iff EVERY
    * gram of the needle might be in the bloom. A needle with no
    * grams (shorter than n, or no alphanumeric tokens) admits
    * everything — the index cannot prune what it cannot decompose,
    * and must-scan is the only exact answer.
    *
    * The needle is driver-known and constant per query, so its grams
    * are derived once and ride the expression as a reference object;
    * codegen calls [[GramBloom.admitsAll]] (the sidecar has one row
    * per data file — this predicate is never on a data-sized hot
    * path). */
  case class GramBloomAdmits(child: Expression, needle: String, n: Int)
      extends UnaryExpression with Predicate {
    requireParams(n, 1L, 0.01)

    @transient private lazy val needleGrams: Array[String] =
      grams(needle, n).toSeq.distinct.toArray

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType != BinaryType)
        TypeCheckResult.TypeCheckFailure(
          s"gram_bloom_admits expects a BINARY bloom, got " +
            child.dataType.catalogString)
      else TypeCheckResult.TypeCheckSuccess

    override def nullSafeEval(v: Any): Any =
      admitsAll(v.asInstanceOf[Array[Byte]], needleGrams)

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val gramsRef = ctx.addReferenceObj("needleGrams", needleGrams,
        "java.lang.String[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.GramBloom$$.MODULE$$.admitsAll($c, $gramsRef)")
    }

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)

    override def prettyName: String = "gram_bloom_admits"
  }

  def gram_bloom(text: Column, n: Int, expectedGrams: Long,
      fpp: Double): Column =
    ColumnBridge.column(GramBloomAgg(ColumnBridge.expression(text), n,
      expectedGrams, fpp).toAggregateExpression())

  def gram_bloom_admits(bloom: Column, needle: String, n: Int): Column =
    ColumnBridge.column(
      GramBloomAdmits(ColumnBridge.expression(bloom), needle, n))
}
