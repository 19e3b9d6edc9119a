package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** quantileTiming — the reference's fixed-histogram timing sketch
  * (src/AggregateFunctions/QuantileTiming.h QuantileTimingLarge), bin
  * layout reproduced exactly:
  *   - values < 1024: one exact count per integer value (EXACT quantiles
  *     on sub-1024 data — the whole point of the engine for latencies),
  *   - 1024 <= x < 30000: 16-wide bins whose representative value gets
  *     the reference's intHash32<0>-based +-8 jitter
  *     (QuantileTiming.h:265 indexInBigToValue),
  *   - x >= 30000: counted but unbinned; quantiles past the last bin
  *     return BIG_THRESHOLD = 30000 (QuantileTiming.h:62 clamp).
  * Rank convention is the reference's: index = floor(count * level),
  * walk the histogram until the cumulative count exceeds it. Negative
  * inputs clamp to 0 (the reference takes unsigned). Merge is elementwise
  * bin addition — trivially re-aggregable. */
object TimingSketch {

  final val SmallThreshold = 1024
  final val BigThreshold = 30000
  final val BigPrecision = 16
  final val BigSize: Int = (BigThreshold - SmallThreshold) / BigPrecision

  /** Hash.h intHash32<0> — the reference's bin-value jitter source. */
  private def intHash32Salt0(key0: Long): Long = {
    var key = key0
    key = (~key) + (key << 18)
    key = key ^ ((key >>> 31) | (key << 33))
    key = key * 21
    key = key ^ ((key >>> 11) | (key << 53))
    key = key + (key << 6)
    key = key ^ ((key >>> 22) | (key << 42))
    key & 0xFFFFFFFFL
  }

  private def indexInBigToValue(i: Int): Int =
    i * BigPrecision + SmallThreshold +
      (intHash32Salt0(i.toLong) % BigPrecision - BigPrecision / 2).toInt

  final class Buf {
    var count = 0L
    val small = new Array[Long](SmallThreshold)
    val big = new Array[Long](BigSize)

    def insert(x0: Long): Unit = {
      val x = math.max(0L, x0)
      count += 1
      if (x < SmallThreshold) small(x.toInt) += 1
      else if (x < BigThreshold)
        big(((x - SmallThreshold) / BigPrecision).toInt) += 1
    }

    def mergeFrom(o: Buf): Unit = {
      count += o.count
      var i = 0
      while (i < SmallThreshold) { small(i) += o.small(i); i += 1 }
      i = 0
      while (i < BigSize) { big(i) += o.big(i); i += 1 }
    }

    def get(level: Double): Int = {
      if (count == 0) return 0
      val pos = if (level < 1) (count * level).toLong else count - 1
      var acc = 0L
      var i = 0
      while (i < SmallThreshold) {
        acc += small(i)
        if (acc > pos) return i
        i += 1
      }
      i = 0
      while (i < BigSize) {
        acc += big(i)
        if (acc > pos) return indexInBigToValue(i)
        i += 1
      }
      BigThreshold
    }
  }

  case class QuantileTiming(child: Expression, q: Double,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buf] {
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = true
    override def dataType: DataType = IntegerType
    override def createAggregationBuffer(): Buf = new Buf
    override def update(b: Buf, input: InternalRow): Buf = {
      val v = child.eval(input)
      if (v != null) b.insert(v.asInstanceOf[Number].longValue())
      b
    }
    override def merge(b: Buf, o: Buf): Buf = { b.mergeFrom(o); b }
    override def eval(b: Buf): Any = if (b.count == 0) null else b.get(q)
    override def serialize(b: Buf): Array[Byte] = {
      // sparse: (index, count) pairs — the reference's sparse wire form
      var nz = 0
      var i = 0
      while (i < SmallThreshold) { if (b.small(i) != 0) nz += 1; i += 1 }
      i = 0
      while (i < BigSize) { if (b.big(i) != 0) nz += 1; i += 1 }
      val out = ByteBuffer.allocate(8 + 4 + nz * 12)
      out.putLong(b.count)
      out.putInt(nz)
      i = 0
      while (i < SmallThreshold) {
        if (b.small(i) != 0) { out.putInt(i); out.putLong(b.small(i)) }
        i += 1
      }
      i = 0
      while (i < BigSize) {
        if (b.big(i) != 0) {
          out.putInt(i + SmallThreshold); out.putLong(b.big(i))
        }
        i += 1
      }
      out.array()
    }
    override def deserialize(bytes: Array[Byte]): Buf = {
      val in = ByteBuffer.wrap(bytes)
      val b = new Buf
      b.count = in.getLong
      var n = in.getInt
      while (n > 0) {
        val idx = in.getInt; val c = in.getLong
        if (idx < SmallThreshold) b.small(idx) = c
        else b.big(idx - SmallThreshold) = c
        n -= 1
      }
      b
    }
    override def withNewMutableAggBufferOffset(n: Int): QuantileTiming =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): QuantileTiming =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): QuantileTiming = copy(child = c.head)
    override def prettyName: String = "quantiletiming"
  }
}
