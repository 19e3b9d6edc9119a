package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aggregation over the wide-integer string carrier (Int128/UInt128/
  * Int256/UInt256 values as canonical decimal strings — see
  * WideIntKernels). Closes the documented round-4 cap "wide AGGREGATION
  * unbuilt": sumWide/minWide/maxWide/avgWide are TypedImperativeAggregates
  * whose buffer is one BigInteger (serialized via toByteArray), so partial
  * aggregation is map-side combinable exactly like a native SUM — the
  * shuffle carries one ~16-32 byte buffer per group, never the rows.
  *
  * Deviations (consistent with the string-carrier design, documented in
  * FUNCTIONS.md): sums are EXACT unbounded integers (the reference wraps
  * at the lane width; an unbounded string carrier makes silent wraparound
  * an artificial data loss — use modulo(…, '2^N') for wrap semantics).
  * avgWide returns Float64 like the reference's avg. Reference:
  * src/AggregateFunctions/AggregateFunctionSum.h (Int128/Int256
  * specializations), AggregateFunctionMinMaxAny.h.
  */
object WideAggregates {

  private def parseInt(s: UTF8String): BigInteger = {
    if (s == null) return null
    try new BigInteger(s.toString.trim)
    catch { case _: NumberFormatException => null }
  }

  abstract class WideAgg extends TypedImperativeAggregate[Array[BigInteger]] {
    def child: Expression
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = true
    override def serialize(b: Array[BigInteger]): Array[Byte] =
      if (b(0) == null) Array.emptyByteArray else b(0).toByteArray
    override def deserialize(bytes: Array[Byte]): Array[BigInteger] =
      if (bytes.isEmpty) Array[BigInteger](null)
      else Array(new BigInteger(bytes))
    protected def valueOf(input: InternalRow): BigInteger = {
      val v = child.eval(input)
      if (v == null) null else parseInt(v.asInstanceOf[UTF8String])
    }
  }

  /** Exact integer SUM; empty/all-null input yields 0 like the reference. */
  case class WideSum(child: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends WideAgg {
    override def dataType: DataType = StringType
    override def createAggregationBuffer(): Array[BigInteger] =
      Array(BigInteger.ZERO)
    override def update(b: Array[BigInteger], input: InternalRow): Array[BigInteger] = {
      val v = valueOf(input)
      if (v != null) b(0) = b(0).add(v)
      b
    }
    override def merge(b: Array[BigInteger], o: Array[BigInteger]): Array[BigInteger] = {
      if (o(0) != null) b(0) = b(0).add(o(0))
      b
    }
    override def eval(b: Array[BigInteger]): Any =
      UTF8String.fromString(b(0).toString)
    override def withNewMutableAggBufferOffset(n: Int): WideSum =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): WideSum =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): WideSum = copy(child = c.head)
    override def prettyName: String = "sumwide"
  }

  /** Numeric MIN/MAX over the carrier (BigInteger order, not string
    * order); NULL on empty input like the reference's min/max. */
  case class WideExtreme(child: Expression, isMax: Boolean,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends WideAgg {
    override def dataType: DataType = StringType
    override def createAggregationBuffer(): Array[BigInteger] =
      Array[BigInteger](null)
    private def pick(a: BigInteger, b: BigInteger): BigInteger =
      if (a == null) b else if (b == null) a
      else if ((a.compareTo(b) >= 0) == isMax) a else b
    override def update(b: Array[BigInteger], input: InternalRow): Array[BigInteger] = {
      b(0) = pick(b(0), valueOf(input)); b
    }
    override def merge(b: Array[BigInteger], o: Array[BigInteger]): Array[BigInteger] = {
      b(0) = pick(b(0), o(0)); b
    }
    override def eval(b: Array[BigInteger]): Any =
      if (b(0) == null) null else UTF8String.fromString(b(0).toString)
    override def withNewMutableAggBufferOffset(n: Int): WideExtreme =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): WideExtreme =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): WideExtreme = copy(child = c.head)
    override def prettyName: String = if (isMax) "maxwide" else "minwide"
  }

  /** Float64 average like the reference's avg — buffer carries the exact
    * sum; the count rides in a second BigInteger cell. */
  case class WideAvg(child: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[BigInteger]] {
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = true
    override def dataType: DataType = DoubleType
    override def createAggregationBuffer(): Array[BigInteger] =
      Array(BigInteger.ZERO, BigInteger.ZERO)
    override def update(b: Array[BigInteger], input: InternalRow): Array[BigInteger] = {
      val v = child.eval(input)
      val p = if (v == null) null else parseInt(v.asInstanceOf[UTF8String])
      if (p != null) { b(0) = b(0).add(p); b(1) = b(1).add(BigInteger.ONE) }
      b
    }
    override def merge(b: Array[BigInteger], o: Array[BigInteger]): Array[BigInteger] = {
      b(0) = b(0).add(o(0)); b(1) = b(1).add(o(1)); b
    }
    override def eval(b: Array[BigInteger]): Any =
      if (b(1).signum == 0) null
      else new java.math.BigDecimal(b(0))
        .divide(new java.math.BigDecimal(b(1)), java.math.MathContext.DECIMAL64)
        .doubleValue()
    override def serialize(b: Array[BigInteger]): Array[Byte] = {
      val s = b(0).toByteArray; val c = b(1).toByteArray
      val out = java.nio.ByteBuffer.allocate(4 + s.length + c.length)
      out.putInt(s.length).put(s).put(c)
      out.array()
    }
    override def deserialize(bytes: Array[Byte]): Array[BigInteger] = {
      val in = java.nio.ByteBuffer.wrap(bytes)
      val sl = in.getInt
      val s = new Array[Byte](sl); in.get(s)
      val c = new Array[Byte](bytes.length - 4 - sl); in.get(c)
      Array(new BigInteger(s), new BigInteger(c))
    }
    override def withNewMutableAggBufferOffset(n: Int): WideAvg =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): WideAvg =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): WideAvg = copy(child = c.head)
    override def prettyName: String = "avgwide"
  }
}
