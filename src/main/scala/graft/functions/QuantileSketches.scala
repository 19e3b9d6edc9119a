package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Real quantile sketch engines for the reference's per-engine names —
  * replacing the single-ApproximatePercentile aliasing for the two
  * engines whose algorithms Spark does NOT already provide:
  *
  *  - quantileTDigest (AggregateFunctionQuantileTDigest.cpp): Dunning's
  *    MERGING t-digest, δ=100 — centroids sized by the 4·W·q(1-q)/δ
  *    bound so tails stay fine-grained; rank error concentrates at the
  *    median, asymptotically exact at q→0/1.
  *  - quantileDD (AggregateFunctionQuantileDD.cpp wraps DDSketch):
  *    logarithmic buckets with RELATIVE-error guarantee α — every
  *    estimate is within α of the true value for positive inputs (zero /
  *    negative ride dedicated buckets like the reference's collapsing
  *    store).
  *
  *  quantileGK stays on Spark's ApproximatePercentile because that IS the
  *  Greenwald-Khanna sketch — an alias only in name.
  *
  * Both buffers serialize compactly and merge associatively (partial
  * aggregation / -State re-aggregation contract).
  */
object QuantileSketches {

  // ---- merging t-digest ----------------------------------------------

  final class TD(val delta: Double) {
    var means = new Array[Double](0)
    var weights = new Array[Double](0)
    var buf = new java.util.ArrayList[Double]()

    def add(x: Double): Unit = {
      buf.add(x)
      if (buf.size >= 512) compress()
    }

    def mergeFrom(o: TD): Unit = {
      o.compress()
      var i = 0
      while (i < o.means.length) {
        appendPoint(o.means(i), o.weights(i)); i += 1
      }
      compress()
    }

    private def appendPoint(m: Double, w: Double): Unit = {
      // stash weighted centroids through the buffer as repeated merges
      means = means :+ m
      weights = weights :+ w
    }

    def compress(): Unit = {
      if (buf.isEmpty && isSorted) return
      val n = means.length + buf.size
      if (n == 0) return
      val ms = new Array[Double](n)
      val ws = new Array[Double](n)
      var i = 0
      while (i < means.length) { ms(i) = means(i); ws(i) = weights(i); i += 1 }
      val it = buf.iterator()
      while (it.hasNext) { ms(i) = it.next(); ws(i) = 1.0; i += 1 }
      buf.clear()
      // sort by mean (insertion of pairs via index sort)
      val idx = ms.zipWithIndex.sortBy(_._1).map(_._2)
      val sm = idx.map(ms); val sw = idx.map(ws)
      val total = sw.sum
      val om = new scala.collection.mutable.ArrayBuffer[Double](64)
      val ow = new scala.collection.mutable.ArrayBuffer[Double](64)
      var cm = sm(0); var cw = sw(0); var acc = 0.0
      i = 1
      while (i < n) {
        val q = (acc + cw / 2) / total
        val bound = math.max(1.0, 4.0 * total * q * (1.0 - q) / delta)
        if (cw + sw(i) <= bound) {
          cm = (cm * cw + sm(i) * sw(i)) / (cw + sw(i)); cw += sw(i)
        } else {
          om += cm; ow += cw; acc += cw; cm = sm(i); cw = sw(i)
        }
        i += 1
      }
      om += cm; ow += cw
      means = om.toArray; weights = ow.toArray
    }

    private def isSorted: Boolean = {
      var i = 1
      while (i < means.length) {
        if (means(i - 1) > means(i)) return false
        i += 1
      }
      true
    }

    def quantile(q: Double): Double = {
      compress()
      val n = means.length
      if (n == 0) return Double.NaN
      if (n == 1) return means(0)
      val total = weights.sum
      val target = q * total
      var acc = 0.0
      var i = 0
      while (i < n) {
        val mid = acc + weights(i) / 2
        if (target <= mid) {
          if (i == 0) return means(0)
          val prevMid = acc - weights(i - 1) / 2
          val t = (target - prevMid) / (mid - prevMid)
          return means(i - 1) + t * (means(i) - means(i - 1))
        }
        acc += weights(i)
        i += 1
      }
      means(n - 1)
    }
  }

  case class QuantileTDigest(child: Expression, q: Double,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[TD] {
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = true
    override def dataType: DataType = DoubleType
    override def createAggregationBuffer(): TD = new TD(100.0)
    override def update(b: TD, input: InternalRow): TD = {
      val v = child.eval(input)
      if (v != null) b.add(v.asInstanceOf[Number].doubleValue())
      b
    }
    override def merge(b: TD, o: TD): TD = { b.mergeFrom(o); b }
    override def eval(b: TD): Any = {
      val r = b.quantile(q)
      if (r.isNaN) null else r
    }
    override def serialize(b: TD): Array[Byte] = {
      b.compress()
      val n = b.means.length
      val out = ByteBuffer.allocate(4 + 16 * n)
      out.putInt(n)
      var i = 0
      while (i < n) { out.putDouble(b.means(i)); out.putDouble(b.weights(i)); i += 1 }
      out.array()
    }
    override def deserialize(bytes: Array[Byte]): TD = {
      val in = ByteBuffer.wrap(bytes)
      val n = in.getInt
      val b = new TD(100.0)
      b.means = new Array[Double](n); b.weights = new Array[Double](n)
      var i = 0
      while (i < n) { b.means(i) = in.getDouble; b.weights(i) = in.getDouble; i += 1 }
      b
    }
    override def withNewMutableAggBufferOffset(n: Int): QuantileTDigest =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): QuantileTDigest =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): QuantileTDigest = copy(child = c.head)
    override def prettyName: String = "quantiletdigest"
  }

  // ---- DDSketch -------------------------------------------------------

  /** Relative-error buckets: index(x) = ceil(ln(x)/ln(gamma)) for x > 0
    * with gamma = (1+α)/(1-α); the bucket midpoint 2·γ^i/(γ+1) is within
    * α of every value in the bucket. Zeros and negatives ride dedicated
    * side stores (counts + negative mirror). */
  final class DD(val alpha: Double) {
    val gamma: Double = (1 + alpha) / (1 - alpha)
    val lg: Double = math.log(gamma)
    val pos = new java.util.HashMap[Integer, java.lang.Long]()
    val neg = new java.util.HashMap[Integer, java.lang.Long]()
    var zeros = 0L

    private def bump(m: java.util.HashMap[Integer, java.lang.Long], k: Int,
        by: Long): Unit =
      m.merge(k, java.lang.Long.valueOf(by), (a, b) => a + b)

    def add(x: Double): Unit =
      if (x > 0) bump(pos, math.ceil(math.log(x) / lg).toInt, 1L)
      else if (x < 0) bump(neg, math.ceil(math.log(-x) / lg).toInt, 1L)
      else zeros += 1

    def mergeFrom(o: DD): Unit = {
      o.pos.forEach((k, v) => bump(pos, k, v))
      o.neg.forEach((k, v) => bump(neg, k, v))
      zeros += o.zeros
    }

    def count: Long =
      pos.values.stream.mapToLong(_.longValue).sum +
        neg.values.stream.mapToLong(_.longValue).sum + zeros

    private def mid(i: Int): Double = 2.0 * math.pow(gamma, i) / (gamma + 1)

    def quantile(q: Double): Double = {
      val n = count
      if (n == 0) return Double.NaN
      val target = math.max(1L, math.round(q * n))
      var acc = 0L
      // negatives ascend from most-negative (largest bucket index) down
      val negKeys = neg.keySet.toArray(new Array[Integer](0)).sorted.reverse
      for (k <- negKeys) {
        acc += neg.get(k)
        if (acc >= target) return -mid(k)
      }
      acc += zeros
      if (acc >= target && zeros > 0) return 0.0
      val posKeys = pos.keySet.toArray(new Array[Integer](0)).sorted
      for (k <- posKeys) {
        acc += pos.get(k)
        if (acc >= target) return mid(k)
      }
      if (posKeys.nonEmpty) mid(posKeys.last.intValue)
      else if (zeros > 0) 0.0
      else -mid(negKeys.last.intValue)
    }
  }

  case class QuantileDD(child: Expression, q: Double, alpha: Double,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[DD] {
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = true
    override def dataType: DataType = DoubleType
    override def createAggregationBuffer(): DD = new DD(alpha)
    override def update(b: DD, input: InternalRow): DD = {
      val v = child.eval(input)
      if (v != null) b.add(v.asInstanceOf[Number].doubleValue())
      b
    }
    override def merge(b: DD, o: DD): DD = { b.mergeFrom(o); b }
    override def eval(b: DD): Any = {
      val r = b.quantile(q)
      if (r.isNaN) null else r
    }
    override def serialize(b: DD): Array[Byte] = {
      val out = ByteBuffer.allocate(8 + 4 + (b.pos.size + b.neg.size) * 12 + 4)
      out.putLong(b.zeros)
      out.putInt(b.pos.size)
      b.pos.forEach((k, v) => { out.putInt(k); out.putLong(v); () })
      out.putInt(b.neg.size)
      b.neg.forEach((k, v) => { out.putInt(k); out.putLong(v); () })
      out.array()
    }
    override def deserialize(bytes: Array[Byte]): DD = {
      val in = ByteBuffer.wrap(bytes)
      val b = new DD(alpha)
      b.zeros = in.getLong
      var n = in.getInt
      while (n > 0) { b.pos.put(in.getInt, in.getLong); n -= 1 }
      n = in.getInt
      while (n > 0) { b.neg.put(in.getInt, in.getLong); n -= 1 }
      b
    }
    override def withNewMutableAggBufferOffset(n: Int): QuantileDD =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): QuantileDD =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): QuantileDD = copy(child = c.head)
    override def prettyName: String = "quantiledd"
  }
}
