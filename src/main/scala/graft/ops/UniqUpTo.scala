package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded-state distinct counting — the ClickHouse `uniqUpTo(N)(x)`
  * aggregate: the EXACT number of distinct values when it is <= N,
  * and N+1 ("more than N") once it isn't. The workhorse for "does
  * this group have more than a handful of distinct X" questions
  * (suppliers per part, devices per account, langs per domain) where
  * the full distinct count is priced like a cardinality sketch but
  * the answer must be exact in the small regime that matters.
  *
  * Why this shape at 100 TB: `countDistinct` plans an Expand plus a
  * shuffle keyed on (group, value) — state and network proportional
  * to the number of DISTINCT values. Here per-task state is a set
  * capped at N+1 longs that stops growing the moment it saturates,
  * so partials ship <= N+1 longs per group regardless of cardinality,
  * and the merge is union-with-cap (associative, order-invariant —
  * saturation loses nothing because every element past N+1 is
  * indistinguishable from the N+2nd).
  *
  * Keys are BIGINT (callers with non-long keys hash through
  * `xxhash64`, the same convention as [[DetSample]]'s determinator —
  * a 2^-64 per-pair collision rate, below any verify gate's
  * resolution but technically "exact up to hashing" there; native
  * long keys like the TPC-H surrogate keys are exact outright).
  */
object UniqUpTo {

  /** `uniq_up_to(key)` -> BIGINT in [0, n+1]. Buffer is a grow-only
    * long set capped at n+1 entries. */
  case class UniqUpToAgg(
      child: Expression,
      n: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.HashSet[java.lang.Long]]
      with UnaryLike[Expression] {
    require(n > 0, "uniqUpTo threshold must be positive")

    private val cap = n + 1

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType != LongType)
        TypeCheckResult.TypeCheckFailure(
          s"uniq_up_to key must be BIGINT, got ${child.dataType.catalogString}")
      else TypeCheckResult.TypeCheckSuccess

    override def createAggregationBuffer(): java.util.HashSet[java.lang.Long] =
      new java.util.HashSet[java.lang.Long](8)

    override def update(
        buf: java.util.HashSet[java.lang.Long],
        input: InternalRow): java.util.HashSet[java.lang.Long] = {
      if (buf.size < cap) {
        val v = child.eval(input)
        if (v != null) buf.add(v.asInstanceOf[Long])
      }
      buf
    }

    override def merge(
        buf: java.util.HashSet[java.lang.Long],
        other: java.util.HashSet[java.lang.Long])
        : java.util.HashSet[java.lang.Long] = {
      val it = other.iterator()
      while (buf.size < cap && it.hasNext) buf.add(it.next())
      buf
    }

    override def eval(buf: java.util.HashSet[java.lang.Long]): Any =
      buf.size.toLong

    override def serialize(
        buf: java.util.HashSet[java.lang.Long]): Array[Byte] = {
      val bytes = new ByteArrayOutputStream()
      val out = new DataOutputStream(bytes)
      out.writeInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) out.writeLong(it.next())
      out.flush()
      bytes.toByteArray
    }

    override def deserialize(
        storage: Array[Byte]): java.util.HashSet[java.lang.Long] = {
      val in = new DataInputStream(new ByteArrayInputStream(storage))
      val m = in.readInt()
      val buf = new java.util.HashSet[java.lang.Long](m * 2)
      var i = 0
      while (i < m) { buf.add(in.readLong()); i += 1 }
      buf
    }

    override def dataType: DataType = LongType
    override def nullable: Boolean = false

    override def withNewMutableAggBufferOffset(newOffset: Int): UniqUpToAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): UniqUpToAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(
        newChild: Expression): UniqUpToAgg = copy(child = newChild)

    override def prettyName: String = "uniq_up_to"
  }

  /** Aggregate column over a native BIGINT key: exact. */
  def uniqUpTo(key: Column, n: Int): Column =
    ColumnBridge.column(
      UniqUpToAgg(ColumnBridge.expression(key), n).toAggregateExpression())

  /** Aggregate column over arbitrary key columns, hashed to BIGINT
    * with xxhash64 (exact up to 2^-64 per-pair collisions). */
  def uniqUpToHashed(n: Int, keys: Column*): Column =
    uniqUpTo(xxhash64(keys: _*), n)
}
