package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** estimateCompressionRatio([codec[, block_size_kb]])(column) — the
  * reference's AggregateFunctionEstimateCompressionRatio.cpp streams the
  * column's serialized bytes through the named codec's
  * CompressedWriteBuffer and returns uncompressed/compressed.
  *
  * Spark rendering: the SAME codec families through Spark's bundled
  * lz4-java / zstd-jni, over a BOUNDED per-group sample (default 1 MiB)
  * of the serialized values — the scale-safe analog of the reference's
  * block stream: the result is a RATIO, and a bounded prefix sample
  * estimates it with O(1) aggregation-buffer state per group at any
  * corpus size (an unbounded byte buffer per group would be a
  * scale-killer at 100 TB). NONE is exact (ratio 1.0) by construction.
  */
object CompressionRatio {

  private val SampleCap = 1 << 20 // 1 MiB per group

  final class Buf {
    var sampleLen: Int = 0
    var sample: Array[Byte] = Array.emptyByteArray

    def add(bytes: Array[Byte]): Unit = {
      if (sampleLen < SampleCap && bytes.length > 0) {
        val take = math.min(bytes.length, SampleCap - sampleLen)
        if (sample.length < sampleLen + take) {
          val grown = new Array[Byte](
            math.min(SampleCap, math.max(64, (sampleLen + take) * 2)))
          System.arraycopy(sample, 0, grown, 0, sampleLen)
          sample = grown
        }
        System.arraycopy(bytes, 0, sample, sampleLen, take)
        sampleLen += take
      }
    }

    def mergeFrom(o: Buf): Unit = {
      if (o.sampleLen > 0) {
        val slice = java.util.Arrays.copyOf(o.sample, o.sampleLen)
        add(slice)
      }
    }
  }

  private def compressedSize(codec: String, bytes: Array[Byte]): Int = {
    val c = codec.toUpperCase.trim
    if (c == "NONE") bytes.length
    else if (c.startsWith("LZ4"))
      net.jpountz.lz4.LZ4Factory.fastestInstance()
        .fastCompressor().compress(bytes).length
    else if (c.startsWith("ZSTD")) {
      val level = "\\((\\d+)\\)".r.findFirstMatchIn(c)
        .map(_.group(1).toInt).getOrElse(3)
      com.github.luben.zstd.Zstd.compress(bytes, level).length
    } else throw new IllegalArgumentException(
      s"estimateCompressionRatio: unknown codec $codec " +
        "(LZ4 / ZSTD[(level)] / NONE)")
  }

  /** Little-endian value image — a stable per-type serialization (the
    * reference serializes through the column's native layout). */
  private def imageOf(v: Any): Array[Byte] = v match {
    case s: UTF8String => s.getBytes
    case b: Array[Byte] => b
    case i: java.lang.Integer =>
      ByteBuffer.allocate(4).putInt(i.intValue()).array()
    case l: java.lang.Long =>
      ByteBuffer.allocate(8).putLong(l.longValue()).array()
    case d: java.lang.Double =>
      ByteBuffer.allocate(8).putDouble(d.doubleValue()).array()
    case f: java.lang.Float =>
      ByteBuffer.allocate(4).putFloat(f.floatValue()).array()
    case s: java.lang.Short =>
      ByteBuffer.allocate(2).putShort(s.shortValue()).array()
    case b: java.lang.Byte => Array(b.byteValue())
    case b: java.lang.Boolean => Array(if (b) 1.toByte else 0.toByte)
    case other => UTF8String.fromString(String.valueOf(other)).getBytes
  }

  case class EstimateCompressionRatio(child: Expression, codec: String,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buf] {
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = true
    override def dataType: DataType = DoubleType
    override def createAggregationBuffer(): Buf = new Buf

    override def update(b: Buf, input: InternalRow): Buf = {
      val v = child.eval(input)
      if (v != null) b.add(imageOf(v))
      b
    }

    override def merge(b: Buf, o: Buf): Buf = { b.mergeFrom(o); b }

    override def eval(b: Buf): Any =
      if (b.sampleLen == 0) null
      else {
        val bytes = java.util.Arrays.copyOf(b.sample, b.sampleLen)
        b.sampleLen.toDouble / math.max(1, compressedSize(codec, bytes))
      }

    override def serialize(b: Buf): Array[Byte] = {
      val out = ByteBuffer.allocate(4 + b.sampleLen)
      out.putInt(b.sampleLen)
      out.put(b.sample, 0, b.sampleLen)
      out.array()
    }

    override def deserialize(bytes: Array[Byte]): Buf = {
      val in = ByteBuffer.wrap(bytes)
      val n = in.getInt
      val b = new Buf
      val body = new Array[Byte](n)
      in.get(body)
      b.add(body)
      b
    }

    override def withNewMutableAggBufferOffset(n: Int): EstimateCompressionRatio =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): EstimateCompressionRatio =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): EstimateCompressionRatio =
      copy(child = c.head)
    override def prettyName: String = "estimatecompressionratio"
  }
}
