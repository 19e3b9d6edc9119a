package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct sketch — the actual theta-sketch
  * estimator family behind the reference's uniqTheta
  * (src/AggregateFunctions/AggregateFunctionUniq.h uniqTheta via
  * src/Functions/UniqTheta/, which wraps the DataSketches theta sketch;
  * KMV is the canonical theta estimator: keep the k smallest hashes,
  * estimate (k-1)/theta where theta is the k-th smallest as a fraction of
  * the hash space).
  *
  * Buffer: a bounded long array of the k smallest hash values in UNSIGNED
  * order (xor MinValue trick), deduplicated — exact below k distinct
  * values (like the reference's sketch below its nominal entries), RSE
  * ~1/sqrt(k-2) ≈ 3.1% at the default k=1024 above it. Serialization is
  * the raw long array; merge is a k-bounded union — re-aggregable
  * partials, the -State/-Merge contract.
  */
object ThetaSketch {

  val defaultK = 1024

  /** Unsigned-comparable image of a hash. */
  @inline private def u(h: Long): Long = h ^ Long.MinValue

  final class Buf(val k: Int) {
    // sorted unsigned-order set of at most k hash images
    val set = new java.util.TreeSet[java.lang.Long]()
    def add(h: Long): Unit = {
      val v = java.lang.Long.valueOf(u(h))
      if (set.size < k) { set.add(v); () }
      else if (v.compareTo(set.last()) < 0) {
        if (set.add(v)) { set.pollLast(); () }
      }
    }
    def mergeFrom(o: Buf): Unit = {
      val it = o.set.iterator()
      while (it.hasNext) {
        val v = it.next()
        if (set.size < k) { set.add(v); () }
        else if (v.compareTo(set.last()) < 0) {
          if (set.add(v)) { set.pollLast(); () }
        }
      }
    }
    def estimate: Long = {
      val n = set.size
      if (n < k) n.toLong
      else {
        // stored images are h ^ MinValue, so unsigned(h) = image + 2^63;
        // theta = unsigned k-th smallest / 2^64, estimate = (k-1)/theta
        val image = set.last().longValue()
        val theta = (image.toDouble + 9.223372036854775808e18) /
          1.8446744073709552e19
        math.round((k - 1).toDouble / theta)
      }
    }
  }


  /** The -State form: same KMV buffer, finalized to the explicit-theta
    * serialized state [[Algebra]] operates on (full buffer → θ = k-th
    * image, k−1 retained strictly below; else exact mode). */
  case class UniqThetaState(child: Expression, k: Int = defaultK,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buf] {
    private lazy val hasher = XxHash64(Seq(child), 42L)
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType
    override def createAggregationBuffer(): Buf = new Buf(k)
    override def update(b: Buf, input: InternalRow): Buf = {
      if (child.eval(input) != null)
        b.add(hasher.eval(input).asInstanceOf[Long])
      b
    }
    override def merge(b: Buf, o: Buf): Buf = { b.mergeFrom(o); b }
    override def eval(b: Buf): Any = {
      import scala.jdk.CollectionConverters._
      val imgs = b.set.iterator().asScala.map(_.longValue()).toArray
      if (imgs.length < k) ThetaAlgebra.pack(k, Long.MaxValue, imgs)
      else ThetaAlgebra.pack(k, imgs.last, imgs.init)
    }
    override def serialize(b: Buf): Array[Byte] = {
      val out = ByteBuffer.allocate(4 + 8 * b.set.size)
      out.putInt(b.set.size)
      val it = b.set.iterator()
      while (it.hasNext) out.putLong(it.next().longValue())
      out.array()
    }
    override def deserialize(bytes: Array[Byte]): Buf = {
      val in = ByteBuffer.wrap(bytes)
      val n = in.getInt
      val b = new Buf(k)
      var i = 0
      while (i < n) { b.set.add(java.lang.Long.valueOf(in.getLong)); i += 1 }
      b
    }
    override def withNewMutableAggBufferOffset(n: Int): UniqThetaState =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): UniqThetaState =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): UniqThetaState = copy(child = c.head)
    override def prettyName: String = "uniqthetastate"
  }

  case class UniqTheta(child: Expression, k: Int = defaultK,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buf] {
    private lazy val hasher = XxHash64(Seq(child), 42L)
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = LongType
    override def createAggregationBuffer(): Buf = new Buf(k)
    override def update(b: Buf, input: InternalRow): Buf = {
      if (child.eval(input) != null)
        b.add(hasher.eval(input).asInstanceOf[Long])
      b
    }
    override def merge(b: Buf, o: Buf): Buf = { b.mergeFrom(o); b }
    override def eval(b: Buf): Any = b.estimate
    override def serialize(b: Buf): Array[Byte] = {
      val out = ByteBuffer.allocate(4 + 8 * b.set.size)
      out.putInt(b.set.size)
      val it = b.set.iterator()
      while (it.hasNext) out.putLong(it.next().longValue())
      out.array()
    }
    override def deserialize(bytes: Array[Byte]): Buf = {
      val in = ByteBuffer.wrap(bytes)
      val n = in.getInt
      val b = new Buf(k)
      var i = 0
      while (i < n) { b.set.add(java.lang.Long.valueOf(in.getLong)); i += 1 }
      b
    }
    override def withNewMutableAggBufferOffset(n: Int): UniqTheta =
      copy(mutableAggBufferOffset = n)
    override def withNewInputAggBufferOffset(n: Int): UniqTheta =
      copy(inputAggBufferOffset = n)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): UniqTheta = copy(child = c.head)
    override def prettyName: String = "uniqtheta"
  }
}


/** Scalar theta-sketch set algebra over EXPLICIT-THETA serialized
  * states — the reference's uniqThetaUnion / uniqThetaIntersect /
  * uniqThetaNot + finalizeAggregation surface
  * (src/Functions/UniqTheta/FunctionsUniqTheta.cpp wrapping the
  * DataSketches theta set operations; the math here is the published
  * theta-sketch framework: θ = min of the inputs' thresholds, retained
  * hashes strictly below θ, estimate = retained/θ — exact while both
  * inputs are exact).
  *
  * State layout: [int k][long thetaImage, MaxValue = exact mode]
  * [int n][n ascending image longs]. Images are h ^ Long.MinValue, so
  * SIGNED image order equals UNSIGNED hash order. */
object ThetaAlgebra {
  private def unpack(b: Array[Byte]): (Int, Long, Array[Long]) = {
    require(b.length >= 16, s"not a theta-sketch state (${b.length} bytes)")
    val in = ByteBuffer.wrap(b)
    val k = in.getInt
    val theta = in.getLong
    val n = in.getInt
    require(k > 0 && n >= 0 && n <= k && b.length == 16 + 8L * n,
      s"not a theta-sketch state (k=$k n=$n len=${b.length})")
    val a = new Array[Long](n)
    var i = 0
    while (i < n) { a(i) = in.getLong; i += 1 }
    (k, theta, a)
  }

  def pack(k: Int, theta: Long, imgs: Array[Long]): Array[Byte] = {
    val out = ByteBuffer.allocate(4 + 8 + 4 + 8 * imgs.length)
    out.putInt(k); out.putLong(theta); out.putInt(imgs.length)
    imgs.foreach(out.putLong)
    out.array()
  }

  /** A one-element exact-mode state from a pre-computed element hash —
    * the initializeAggregation('uniqThetaState', x) carrier
    * (src/Functions/initializeAggregation.cpp: build the aggregate
    * state a single-row aggregation would produce). */
  def singleton(h: Long): Array[Byte] =
    pack(ThetaSketch.defaultK, Long.MaxValue, Array(h ^ Long.MinValue))

  /** estimate = n (exact mode) or n / θ-fraction. */
  def estimate(state: Array[Byte]): Long = {
    val (_, theta, imgs) = unpack(state)
    if (theta == Long.MaxValue) imgs.length.toLong
    else {
      val frac = (theta.toDouble + 9.223372036854775808e18) /
        1.8446744073709552e19
      math.round(imgs.length / frac)
    }
  }

  private def combine(a: Array[Byte], b: Array[Byte])(
      merge: (Array[Long], Array[Long]) => Array[Long])
      : (Int, Long, Array[Long]) = {
    val (ka, ta, sa) = unpack(a)
    val (kb, tb, sb) = unpack(b)
    val k = math.min(ka, kb)
    val theta = math.min(ta, tb) // image order == unsigned hash order
    (k, theta, merge(sa, sb).filter(_ < theta).sorted)
  }

  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var (k, theta, s) = combine(a, b)((x, y) => (x ++ y).distinct)
    if (s.length > k) { theta = s(k); s = s.take(k) }
    pack(k, theta, s)
  }

  def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (k, theta, s) = combine(a, b) { (x, y) =>
      val ys = y.toSet; x.filter(ys.contains)
    }
    pack(k, theta, s)
  }

  /** a AND NOT b. */
  def andNot(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (k, theta, s) = combine(a, b) { (x, y) =>
      val ys = y.toSet; x.filterNot(ys.contains)
    }
    pack(k, theta, s)
  }
}