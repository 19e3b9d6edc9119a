package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String

/** Round-11 registry sweep #9 kernels (the FINAL reference-name diff —
  * see FUNCTIONS.md for the audited residue). Pure JVM functions bound
  * through StaticInvoke; each cites the reference function it
  * re-expresses. Statistical p-values use the regularized incomplete
  * beta / complementary error function from the published formulas
  * (Abramowitz & Stegun 26.5.8 / 7.1.26 and the Lentz continued
  * fraction, DLMF 8.17.22) — no reference code involved.
  */
object SweepKernels9 {

  /** errorCodeToName (src/Functions/errorCodeToName.cpp): the variable
    * name for the error code; empty for unknown/out-of-range codes. */
  def name(code: Long): UTF8String =
    UTF8String.fromString(ErrorCodeNames.name(code))

  // ---- calendar (toWeekYear / toWeekOfWeekYear — toCustomWeek.cpp
  // ISO-8601 week-year lanes) ------------------------------------------

  private def isoWeekFields(daysSinceEpoch: Int) = {
    val d = java.time.LocalDate.ofEpochDay(daysSinceEpoch.toLong)
    val wf = java.time.temporal.WeekFields.ISO
    (d.get(wf.weekBasedYear()), d.get(wf.weekOfWeekBasedYear()))
  }
  def toWeekYear(days: Int): Int = isoWeekFields(days)._1
  def toWeekOfWeekYear(days: Int): Int = isoWeekFields(days)._2

  /** timeZoneOffset (src/Functions/timezoneOffset.cpp): the UTC offset
    * in seconds of `tz` at the given instant. */
  def timeZoneOffset(micros: Long, tz: UTF8String): Int =
    java.time.ZoneId.of(tz.toString).getRules
      .getOffset(java.time.Instant.ofEpochSecond(
        Math.floorDiv(micros, 1000000L))).getTotalSeconds

  // ---- toBFloat16 (src/Functions/FunctionsConversion.cpp BFloat16
  // lane): round a float to bfloat16 precision — keep the top 16 bits
  // of the IEEE-754 image with round-to-nearest-even ------------------

  def toBFloat16(x: Double): Float = {
    val f = x.toFloat
    if (f.isNaN || f.isInfinite) return f
    val bits = java.lang.Float.floatToIntBits(f)
    val rounded = (bits + 0x7fff + ((bits >>> 16) & 1)) & 0xffff0000
    java.lang.Float.intBitsToFloat(rounded)
  }

  // ---- IPv6 CIDR (src/Functions/FunctionsCodingIP.cpp
  // IPv6CIDRToRange / cutIPv6) -----------------------------------------

  private def parseV6(s: String): Array[Byte] = {
    val addr = java.net.InetAddress.getByName(s)
    val raw = addr.getAddress
    if (raw.length == 16) raw
    else { // v4 in v6 text: map into ::ffff:a.b.c.d
      val out = new Array[Byte](16)
      out(10) = -1; out(11) = -1
      System.arraycopy(raw, 0, out, 12, 4)
      out
    }
  }
  private def renderV6(b: Array[Byte]): UTF8String =
    UTF8String.fromString(
      java.net.InetAddress.getByAddress(b).getHostAddress)

  /** IPv6CIDRToRange(addr, prefix) → (lo, hi) textual bounds. */
  def ipv6CidrToRange(addr: UTF8String, prefix: Int): InternalRow = {
    val p = math.max(0, math.min(128, prefix))
    val base = parseV6(addr.toString)
    val lo = base.clone(); val hi = base.clone()
    var bit = p
    while (bit < 128) {
      lo(bit / 8) = (lo(bit / 8) & ~(0x80 >> (bit % 8))).toByte
      hi(bit / 8) = (hi(bit / 8) | (0x80 >> (bit % 8))).toByte
      bit += 1
    }
    new GenericInternalRow(Array[Any](renderV6(lo), renderV6(hi)))
  }

  /** cutIPv6(addr, bytesToCutForIPv6, bytesToCutForIPv4): zero the low
    * `bytesToCutForIPv6` bytes (or `bytesToCutForIPv4` when the address
    * is a v4-mapped one) and render. */
  def cutIPv6(addr: UTF8String, cut6: Int, cut4: Int): UTF8String = {
    val b = parseV6(addr.toString)
    val isV4 = b.take(10).forall(_ == 0) && b(10) == -1 && b(11) == -1
    val cut = math.max(0, math.min(16, if (isV4) cut4 else cut6))
    var i = 16 - cut
    while (i < 16) { b(i) = 0; i += 1 }
    renderV6(b)
  }

  // ---- filesystem stats (src/Functions/filesystem.cpp) ---------------

  private def store = java.nio.file.Files.getFileStore(
    java.nio.file.Paths.get(".").toAbsolutePath)
  def filesystemAvailable(): Long = store.getUsableSpace
  def filesystemCapacity(): Long = store.getTotalSpace
  def filesystemUnreserved(): Long = store.getUnallocatedSpace

  // ---- special functions for the statistical tests -------------------

  /** Regularized incomplete beta I_x(a,b) via the Lentz continued
    * fraction (DLMF 8.17.22; Numerical Recipes §6.4 formulation). */
  def incBeta(a: Double, b: Double, x: Double): Double = {
    if (x <= 0) return 0.0
    if (x >= 1) return 1.0
    def lnGamma(z: Double): Double = {
      // Lanczos approximation (published coefficients, g=7)
      val c = Array(0.99999999999980993, 676.5203681218851,
        -1259.1392167224028, 771.32342877765313, -176.61502916214059,
        12.507343278686905, -0.13857109526572012, 9.9843695780195716e-6,
        1.5056327351493116e-7)
      if (z < 0.5)
        math.log(math.Pi / math.sin(math.Pi * z)) - lnGamma(1 - z)
      else {
        val zz = z - 1
        var xs = c(0)
        var i = 1
        while (i < 9) { xs += c(i) / (zz + i); i += 1 }
        val t = zz + 7.5
        0.5 * math.log(2 * math.Pi) + (zz + 0.5) * math.log(t) - t +
          math.log(xs)
      }
    }
    def betacf(a: Double, b: Double, x: Double): Double = {
      val eps = 1e-14; val fpmin = 1e-300
      val qab = a + b; val qap = a + 1; val qam = a - 1
      var c = 1.0
      var d = 1 - qab * x / qap
      if (math.abs(d) < fpmin) d = fpmin
      d = 1 / d
      var h = d
      var m = 1
      while (m <= 300) {
        val m2 = 2 * m
        var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1 + aa * d; if (math.abs(d) < fpmin) d = fpmin
        c = 1 + aa / c; if (math.abs(c) < fpmin) c = fpmin
        d = 1 / d; h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1 + aa * d; if (math.abs(d) < fpmin) d = fpmin
        c = 1 + aa / c; if (math.abs(c) < fpmin) c = fpmin
        d = 1 / d
        val del = d * c
        h *= del
        if (math.abs(del - 1) < eps) return h
        m += 1
      }
      h
    }
    val front = math.exp(lnGamma(a + b) - lnGamma(a) - lnGamma(b) +
      a * math.log(x) + b * math.log(1 - x))
    if (x < (a + 1) / (a + b + 2)) front * betacf(a, b, x) / a
    else 1 - math.exp(lnGamma(a + b) - lnGamma(a) - lnGamma(b) +
      b * math.log(1 - x) + a * math.log(x)) * betacf(b, a, 1 - x) / b
  }

  /** Two-sided p-value of a t statistic with df degrees of freedom. */
  private def tTestP(t: Double, df: Double): Double =
    incBeta(df / 2, 0.5, df / (df + t * t))

  /** Collect the (value, sampleIndex) pairs into per-sample stats. */
  private def twoSampleStats(pairs: ArrayData)
      : (Long, Double, Double, Long, Double, Double) = {
    var n0 = 0L; var s0 = 0.0; var ss0 = 0.0
    var n1 = 0L; var s1 = 0.0; var ss1 = 0.0
    var i = 0
    val n = pairs.numElements()
    while (i < n) {
      val r = pairs.getStruct(i, 2)
      val v = r.getDouble(0)
      if (r.getLong(1) == 0L) { n0 += 1; s0 += v; ss0 += v * v }
      else { n1 += 1; s1 += v; ss1 += v * v }
      i += 1
    }
    (n0, s0, ss0, n1, s1, ss1)
  }

  /** studentTTest (AggregateFunctionTTest.h student lane): two-sample
    * pooled-variance t test over (value, sample_index ∈ {0,1}) rows →
    * (t statistic, two-sided p). */
  def studentTTest(pairs: ArrayData): InternalRow = {
    val (n0, s0, ss0, n1, s1, ss1) = twoSampleStats(pairs)
    val m0 = s0 / n0; val m1 = s1 / n1
    val v0 = (ss0 - n0 * m0 * m0) / (n0 - 1)
    val v1 = (ss1 - n1 * m1 * m1) / (n1 - 1)
    val df = (n0 + n1 - 2).toDouble
    val sp2 = ((n0 - 1) * v0 + (n1 - 1) * v1) / df
    val t = (m0 - m1) / math.sqrt(sp2 * (1.0 / n0 + 1.0 / n1))
    new GenericInternalRow(Array[Any](t, tTestP(t, df)))
  }

  /** welchTTest (AggregateFunctionTTest.h welch lane): unequal-variance
    * t test with Welch–Satterthwaite df. */
  def welchTTest(pairs: ArrayData): InternalRow = {
    val (n0, s0, ss0, n1, s1, ss1) = twoSampleStats(pairs)
    val m0 = s0 / n0; val m1 = s1 / n1
    val v0 = (ss0 - n0 * m0 * m0) / (n0 - 1)
    val v1 = (ss1 - n1 * m1 * m1) / (n1 - 1)
    val se0 = v0 / n0; val se1 = v1 / n1
    val t = (m0 - m1) / math.sqrt(se0 + se1)
    val df = (se0 + se1) * (se0 + se1) /
      (se0 * se0 / (n0 - 1) + se1 * se1 / (n1 - 1))
    new GenericInternalRow(Array[Any](t, tTestP(t, df)))
  }

  /** rankCorr (AggregateFunctionRankCorrelation.h): Spearman rank
    * correlation over (x, y) pairs — Pearson correlation of average
    * ranks (ties share the mean rank). */
  def rankCorr(pairs: ArrayData): Double = {
    val n = pairs.numElements()
    val xs = new Array[Double](n); val ys = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = pairs.getStruct(i, 2)
      xs(i) = r.getDouble(0); ys(i) = r.getDouble(1)
      i += 1
    }
    def ranks(a: Array[Double]): Array[Double] = {
      val idx = a.indices.sortBy(a)
      val out = new Array[Double](a.length)
      var i = 0
      while (i < idx.length) {
        var j = i
        while (j + 1 < idx.length && a(idx(j + 1)) == a(idx(i))) j += 1
        val avg = (i + j + 2) / 2.0 // mean of 1-based ranks i+1..j+1
        for (k <- i to j) out(idx(k)) = avg
        i = j + 1
      }
      out
    }
    val rx = ranks(xs); val ry = ranks(ys)
    var sx = 0.0; var sy = 0.0; var sxx = 0.0; var syy = 0.0; var sxy = 0.0
    i = 0
    while (i < n) {
      sx += rx(i); sy += ry(i); sxx += rx(i) * rx(i)
      syy += ry(i) * ry(i); sxy += rx(i) * ry(i)
      i += 1
    }
    val cov = sxy - sx * sy / n
    val dx = sxx - sx * sx / n
    val dy = syy - sy * sy / n
    cov / math.sqrt(dx * dy)
  }

  /** exponentialMovingAverage(halfLife)(v, t)
    * (AggregateFunctionExponentialMovingAverage.cpp): every
    * observation decays by 2^(−Δt/halfLife) to the LATEST time; the
    * result is the decayed weighted mean. */
  def exponentialMovingAverage(pairs: ArrayData, halfLife: Double): Double = {
    val n = pairs.numElements()
    var tMax = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      tMax = math.max(tMax, pairs.getStruct(i, 2).getDouble(1)); i += 1
    }
    var num = 0.0; var den = 0.0
    i = 0
    while (i < n) {
      val r = pairs.getStruct(i, 2)
      val w = math.pow(2.0, -(tMax - r.getDouble(1)) / halfLife)
      num += r.getDouble(0) * w; den += w
      i += 1
    }
    num / den
  }

  /** lttb(n)(x, y) (AggregateFunctionLargestTriangleThreeBuckets.cpp —
    * Steinarsson 2013 "Downsampling Time Series for Visual
    * Representation", the published LTTB algorithm): downsample the
    * x-sorted series to n points keeping visual shape. Returns an
    * array of (x, y) pairs. */
  def lttb(pairs0: ArrayData, n: Int): ArrayData = {
    val m = pairs0.numElements()
    val pts = Array.tabulate(m) { i =>
      val r = pairs0.getStruct(i, 2); (r.getDouble(0), r.getDouble(1))
    }.sortBy(_._1)
    def row(p: (Double, Double)): AnyRef =
      new GenericInternalRow(Array[Any](p._1, p._2))
    if (n <= 0 || m == 0) return new GenericArrayData(Array.empty[Any])
    if (m <= n || n < 3)
      return new GenericArrayData(pts.take(math.max(n, 0)).map(row))
    val out = new Array[AnyRef](n)
    out(0) = row(pts(0))
    val bucket = (m - 2).toDouble / (n - 2)
    var a = 0
    var i = 0
    while (i < n - 2) {
      val rs = 1 + math.floor(i * bucket).toInt
      val re = math.min(1 + math.floor((i + 1) * bucket).toInt, m - 1)
      val ns = 1 + math.floor((i + 1) * bucket).toInt
      val ne = math.min(1 + math.floor((i + 2) * bucket).toInt, m)
      var avgX = 0.0; var avgY = 0.0
      var j = ns
      while (j < ne) { avgX += pts(j)._1; avgY += pts(j)._2; j += 1 }
      val cnt = math.max(ne - ns, 1)
      avgX /= cnt; avgY /= cnt
      var best = rs; var bestArea = -1.0
      j = rs
      while (j < re) {
        val area = math.abs(
          (pts(a)._1 - avgX) * (pts(j)._2 - pts(a)._2) -
            (pts(a)._1 - pts(j)._1) * (avgY - pts(a)._2))
        if (area > bestArea) { bestArea = area; best = j }
        j += 1
      }
      out(i + 1) = row(pts(best))
      a = best
      i += 1
    }
    out(n - 1) = row(pts(m - 1))
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  // ---- REAL hash kernels (upgrading the round-2 stand-ins, like the
  // sweep-#7 SipHash upgrade): MurmurHash2/MurmurHash3 re-implemented
  // from Appleby's PUBLISHED public-domain algorithms (smhasher), the
  // Java/Hive 31-recurrence from the JDK contract, CRC-64 from the
  // textbook reflected table-driven form with the reference's ECMA-182
  // polynomial (CRC.cpp:42 — a constant, not logic). Seeds per
  // FunctionsHashing.h: murmurHash2_32/64 and murmurHash3_* use 0. ----

  /** MurmurHash2 (32-bit, Appleby): m=0x5bd1e995, r=24. */
  def murmurHash2WithSeed(data: Array[Byte], seed: Int): Int = {
    val m = 0x5bd1e995
    val r = 24
    var h = seed ^ data.length
    val n4 = data.length / 4
    var i = 0
    while (i < n4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) | ((data(i4 + 1) & 0xff) << 8) |
        ((data(i4 + 2) & 0xff) << 16) | ((data(i4 + 3) & 0xff) << 24)
      k *= m; k ^= k >>> r; k *= m
      h *= m; h ^= k
      i += 1
    }
    val tail = n4 * 4
    val rem = data.length & 3
    if (rem >= 3) h ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) h ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) { h ^= data(tail) & 0xff; h *= m }
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h
  }
  def murmurHash2_32(data: Array[Byte]): Long =
    murmurHash2WithSeed(data, 0).toLong & 0xffffffffL

  /** MurmurHash64A (Appleby) with caller seed — murmurHash2_64 uses 0,
    * gccMurmurHash (Tail7) 0xc70f6907. */
  def murmurHash64A(data: Array[Byte], seed: Long): Long = {
    val m = 0xc6a4a7935bd1e995L
    val r = 47
    var h = seed ^ (data.length * m)
    val full = data.length & ~7
    var i = 0
    while (i < full) {
      var k = 0L
      var j = 0
      while (j < 8) { k |= (data(i + j) & 0xffL) << (8 * j); j += 1 }
      k *= m; k ^= k >>> r; k *= m
      h ^= k; h *= m
      i += 8
    }
    val rem = data.length & 7
    var j = rem - 1
    while (j >= 0) { h ^= (data(full + j) & 0xffL) << (8 * j); j -= 1 }
    if (rem > 0) h *= m
    h ^= h >>> r; h *= m; h ^= h >>> r
    h
  }
  def murmurHash2_64(data: Array[Byte]): Long = murmurHash64A(data, 0L)

  /** MurmurHash3 x86_32 (Appleby), canonical tail handling (Spark's
    * builtin deviates on unaligned tails, so it cannot carry this). */
  def murmurHash3_32(data: Array[Byte]): Long = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = 0
    val n4 = data.length / 4
    var i = 0
    while (i < n4) {
      val i4 = i * 4
      var k = (data(i4) & 0xff) | ((data(i4 + 1) & 0xff) << 8) |
        ((data(i4 + 2) & 0xff) << 16) | ((data(i4 + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 1
    }
    val tail = n4 * 4
    var k1 = 0
    if ((data.length & 3) >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if ((data.length & 3) >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if ((data.length & 3) >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h ^= k1
    }
    h ^= data.length
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35
    h ^= h >>> 16
    h.toLong & 0xffffffffL
  }

  /** MurmurHash3 x64_128 (Appleby) → (h1, h2). */
  private def murmur3x64128(data: Array[Byte]): (Long, Long) = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    var h1 = 0L; var h2 = 0L
    def longLE(o: Int): Long = {
      var k = 0L; var j = 0
      while (j < 8) { k |= (data(o + j) & 0xffL) << (8 * j); j += 1 }
      k
    }
    val nblocks = data.length / 16
    var i = 0
    while (i < nblocks) {
      var k1 = longLE(i * 16); var k2 = longLE(i * 16 + 8)
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1
      h1 = java.lang.Long.rotateLeft(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2
      h2 = java.lang.Long.rotateLeft(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }
    val tail = nblocks * 16
    var k1 = 0L; var k2 = 0L
    val rem = data.length & 15
    var j = math.min(rem, 15) - 1
    while (j >= 8) { k2 ^= (data(tail + j) & 0xffL) << (8 * (j - 8)); j -= 1 }
    if (rem > 8) {
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2
    }
    j = math.min(rem, 8) - 1
    while (j >= 0) { k1 ^= (data(tail + j) & 0xffL) << (8 * j); j -= 1 }
    if (rem > 0) {
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1
    }
    h1 ^= data.length; h2 ^= data.length
    h1 += h2; h2 += h1
    def fmix(k0: Long): Long = {
      var k = k0
      k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
      k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
      k ^= k >>> 33
      k
    }
    h1 = fmix(h1); h2 = fmix(h2)
    h1 += h2; h2 += h1
    (h1, h2)
  }
  /** murmurHash3_64 = x64_128(seed 0) halves XOR'd
    * (FunctionsHashing.h:485). */
  def murmurHash3_64(data: Array[Byte]): Long = {
    val (a, b) = murmur3x64128(data); a ^ b
  }
  /** murmurHash3_128: the 16 raw little-endian bytes of (h1, h2) —
    * the reference memcpys the union image. */
  def murmurHash3_128(data: Array[Byte]): Array[Byte] = {
    val (a, b) = murmur3x64128(data)
    val bb = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(a); bb.putLong(b); bb.array()
  }

  /** javaHash over bytes: h = 31·h + signext(byte), signed Int32
    * (FunctionsHashing.h:543-549). */
  def javaHash(data: Array[Byte]): Int = {
    var h = 0
    var i = 0
    while (i < data.length) { h = 31 * h + data(i); i += 1 }
    h
  }
  /** hiveHash = javaHash with the sign bit cleared. */
  def hiveHash(data: Array[Byte]): Int = javaHash(data) & 0x7fffffff

  /** CRC-64 (reflected table-driven CRC, init 0, no xorout) with the
    * ECMA-182 polynomial constant the reference uses (CRC.cpp:42). */
  private lazy val crc64Table: Array[Long] = {
    val poly = 0xc96c5795d7870f42L
    Array.tabulate(256) { n =>
      var c = n.toLong
      var k = 0
      while (k < 8) { c = if ((c & 1L) != 0) poly ^ (c >>> 1) else c >>> 1; k += 1 }
      c
    }
  }
  def crc64(data: Array[Byte]): Long = {
    var crc = 0L
    var i = 0
    while (i < data.length) {
      crc = crc64Table(((crc ^ data(i)) & 0xff).toInt) ^ (crc >>> 8)
      i += 1
    }
    crc
  }

  /** groupArrayIntersect (AggregateFunctionGroupArrayIntersect.cpp):
    * intersection of all aggregated arrays, deduplicated; order follows
    * the first array's element order. Kernel over the collected list of
    * arrays (per-group buffer, like the reference's state). */
  def groupArrayIntersect(arrays: ArrayData): ArrayData = {
    val n = arrays.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    def elems(i: Int): Seq[Long] = {
      val a = arrays.getArray(i)
      (0 until a.numElements()).map(a.getLong)
    }
    var acc = elems(0).distinct
    var i = 1
    while (i < n && acc.nonEmpty) {
      val s = elems(i).toSet
      acc = acc.filter(s.contains)
      i += 1
    }
    new GenericArrayData(acc.toArray[Any])
  }

  /** sparkbar(width)(x, y) (AggregateFunctionSparkbar.cpp): bucket the
    * (x, y) pairs into `width` equal x-ranges, sum y per bucket, render
    * one of the 8 block glyphs per bucket scaled to the max bucket. */
  def sparkbar(pairs: ArrayData, width: Int): UTF8String = {
    val n = pairs.numElements()
    if (n == 0 || width <= 0) return UTF8String.fromString("")
    val xs = new Array[Double](n); val ys = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = pairs.getStruct(i, 2)
      xs(i) = r.getDouble(0); ys(i) = r.getDouble(1)
      i += 1
    }
    val lo = xs.min; val hi = xs.max
    val sums = new Array[Double](width)
    i = 0
    while (i < n) {
      val b =
        if (hi == lo) 0
        else math.min(width - 1,
          math.floor((xs(i) - lo) / (hi - lo) * width).toInt)
      sums(b) += ys(i)
      i += 1
    }
    val mx = sums.max
    val blocks = " ▁▂▃▄▅▆▇█"
    val sb = new StringBuilder
    sums.foreach { s =>
      val level =
        if (mx <= 0) 0
        else math.min(8, math.ceil(s / mx * 8).toInt)
      sb.append(blocks.charAt(level))
    }
    UTF8String.fromString(sb.toString)
  }

  // ---- wave 2: interval sweeps, more statistical tests, histogram ----

  /** entropy (AggregateFunctionEntropy.h): Shannon entropy (bits) of
    * the value distribution. */
  def entropy(values: ArrayData): Double = {
    val n = values.numElements()
    if (n == 0) return 0.0
    val freq = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < n) {
      val k = if (values.isNullAt(i)) "" else values.getUTF8String(i).toString
      freq.merge(k, 1L, _ + _)
      i += 1
    }
    var h = 0.0
    freq.values.forEach { c =>
      val p = c.toDouble / n
      h -= p * (math.log(p) / math.log(2))
    }
    h
  }

  /** histogram(bins)(x) (AggregateFunctionHistogram.h): (lower, upper,
    * height) triples. Equal-width bins over [min, max] — the reference
    * uses an adaptive streaming merge whose bin EDGES differ; the
    * contract (buckets cover the range, heights sum to n) is the same
    * (documented deviation). */
  def histogram(values: ArrayData, bins: Int): ArrayData = {
    val n = values.numElements()
    if (n == 0 || bins <= 0) return new GenericArrayData(Array.empty[Any])
    val xs = Array.tabulate(n)(values.getDouble)
    val lo = xs.min; val hi = xs.max
    val counts = new Array[Long](bins)
    xs.foreach { x =>
      val b = if (hi == lo) 0
        else math.min(bins - 1, math.floor((x - lo) / (hi - lo) * bins).toInt)
      counts(b) += 1
    }
    val w = if (hi == lo) 1.0 else (hi - lo) / bins
    new GenericArrayData(Array.tabulate[Any](bins) { b =>
      new GenericInternalRow(Array[Any](
        lo + b * w, lo + (b + 1) * w, counts(b).toDouble))
    })
  }

  private def intervalPairs(pairs: ArrayData): Array[(Double, Double)] =
    Array.tabulate(pairs.numElements()) { i =>
      val r = pairs.getStruct(i, 2); (r.getDouble(0), r.getDouble(1))
    }

  /** maxIntersections (AggregateFunctionMaxIntersections.cpp): the
    * maximum number of simultaneously-overlapping [start, end)
    * intervals — boundary sweep. */
  def maxIntersections(pairs: ArrayData): Long = {
    val events = intervalPairs(pairs).flatMap { case (s, e) =>
      Seq((s, 1), (e, -1)) }.sortBy(x => (x._1, x._2))
    var cur = 0L; var best = 0L
    events.foreach { case (_, d) =>
      cur += d; if (cur > best) best = cur }
    best
  }

  /** maxIntersectionsPosition: the leftmost position where the maximum
    * overlap is reached. */
  def maxIntersectionsPosition(pairs: ArrayData): Double = {
    val events = intervalPairs(pairs).flatMap { case (s, e) =>
      Seq((s, 1), (e, -1)) }.sortBy(x => (x._1, x._2))
    var cur = 0L; var best = 0L; var pos = 0.0
    events.foreach { case (x, d) =>
      cur += d; if (cur > best) { best = cur; pos = x } }
    pos
  }

  /** intervalLengthSum (AggregateFunctionIntervalLengthSum.h): total
    * length of the UNION of the intervals (overlaps counted once). */
  def intervalLengthSum(pairs: ArrayData): Double = {
    val iv = intervalPairs(pairs).sortBy(_._1)
    var total = 0.0
    var curS = Double.NaN; var curE = Double.NaN
    iv.foreach { case (s, e) =>
      if (curS.isNaN) { curS = s; curE = e }
      else if (s <= curE) { if (e > curE) curE = e }
      else { total += curE - curS; curS = s; curE = e }
    }
    if (!curS.isNaN) total += curE - curS
    total
  }

  /** Complementary error function (Abramowitz & Stegun 7.1.26
    * rational approximation, |ε| ≤ 1.5e-7). */
  def erfc(x: Double): Double = {
    val z = math.abs(x)
    val t = 1.0 / (1.0 + 0.5 * z)
    val ans = t * math.exp(-z * z - 1.26551223 + t * (1.00002368 +
      t * (0.37409196 + t * (0.09678418 + t * (-0.18628806 +
      t * (0.27886807 + t * (-1.13520398 + t * (1.48851587 +
      t * (-0.82215223 + t * 0.17087277)))))))))
    if (x >= 0) ans else 2.0 - ans
  }

  /** meanZTest(popVarX, popVarY)(v, idx) (AggregateFunctionMeanZTest
    * .h): z over known population variances → (z, two-sided p). */
  def meanZTest(pairs: ArrayData, varX: Double, varY: Double): InternalRow = {
    val (n0, s0, _, n1, s1, _) = twoSampleStats(pairs)
    val z = (s0 / n0 - s1 / n1) / math.sqrt(varX / n0 + varY / n1)
    new GenericInternalRow(Array[Any](z, erfc(math.abs(z) / math.sqrt(2.0))))
  }

  /** mannWhitneyUTest(v, idx) (AggregateFunctionMannWhitney.h): U of
    * sample 0 + two-sided p via the tie-corrected normal approximation
    * (the reference uses the same continuity-corrected normal form). */
  def mannWhitneyUTest(pairs: ArrayData): InternalRow = {
    val n = pairs.numElements()
    val v = new Array[Double](n); val s = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = pairs.getStruct(i, 2); v(i) = r.getDouble(0); s(i) = r.getLong(1)
      i += 1
    }
    val idx = (0 until n).sortBy(v)
    val rank = new Array[Double](n)
    var tieCorr = 0.0
    i = 0
    while (i < n) {
      var j = i
      while (j + 1 < n && v(idx(j + 1)) == v(idx(i))) j += 1
      val t = (j - i + 1).toDouble
      tieCorr += t * t * t - t
      val avg = (i + j + 2) / 2.0
      for (k <- i to j) rank(idx(k)) = avg
      i = j + 1
    }
    val n0 = s.count(_ == 0L).toDouble; val n1 = n - n0
    val r0 = (0 until n).filter(s(_) == 0L).map(rank).sum
    val u = r0 - n0 * (n0 + 1) / 2
    val mu = n0 * n1 / 2
    val sigma = math.sqrt(n0 * n1 / 12.0 *
      ((n + 1) - tieCorr / (n.toDouble * (n - 1))))
    val z = (u - mu) / sigma
    new GenericInternalRow(Array[Any](u, erfc(math.abs(z) / math.sqrt(2.0))))
  }

  /** kolmogorovSmirnovTest(v, idx) (AggregateFunctionKolmogorov
    * SmirnovTest.cpp): two-sample D + the asymptotic Kolmogorov
    * p-value 2·Σ(−1)^{k−1}e^{−2k²λ²} (the published series). */
  def kolmogorovSmirnovTest(pairs: ArrayData): InternalRow = {
    val n = pairs.numElements()
    val a = scala.collection.mutable.ArrayBuffer[Double]()
    val b = scala.collection.mutable.ArrayBuffer[Double]()
    var i = 0
    while (i < n) {
      val r = pairs.getStruct(i, 2)
      if (r.getLong(1) == 0L) a += r.getDouble(0) else b += r.getDouble(0)
      i += 1
    }
    val x = a.sorted.toArray; val y = b.sorted.toArray
    var ia = 0; var ib = 0; var d = 0.0
    while (ia < x.length && ib < y.length) {
      val vx = x(ia); val vy = y(ib)
      val m = math.min(vx, vy)
      while (ia < x.length && x(ia) <= m) ia += 1
      while (ib < y.length && y(ib) <= m) ib += 1
      d = math.max(d,
        math.abs(ia.toDouble / x.length - ib.toDouble / y.length))
    }
    val en = math.sqrt(x.length.toDouble * y.length / (x.length + y.length))
    val lambda = (en + 0.12 + 0.11 / en) * d
    var p = 0.0
    var k = 1
    while (k <= 100) {
      p += 2.0 * math.pow(-1.0, k - 1) * math.exp(-2.0 * k * k * lambda * lambda)
      k += 1
    }
    new GenericInternalRow(Array[Any](d, math.max(0.0, math.min(1.0, p))))
  }

  /** analysisOfVariance / anova(v, group)
    * (AggregateFunctionAnalysisOfVariance.cpp): one-way ANOVA →
    * (F statistic, p via the regularized incomplete beta). */
  def anova(pairs: ArrayData): InternalRow = {
    val n = pairs.numElements()
    val sums = new java.util.HashMap[Long, Array[Double]]() // (sum, count)
    var total = 0.0
    var i = 0
    while (i < n) {
      val r = pairs.getStruct(i, 2)
      val v = r.getDouble(0); val g = r.getLong(1)
      val acc = sums.computeIfAbsent(g, _ => Array(0.0, 0.0))
      acc(0) += v; acc(1) += 1
      total += v
      i += 1
    }
    val k = sums.size
    val grand = total / n
    var ssb = 0.0
    sums.values.forEach(acc => {
      val m = acc(0) / acc(1); ssb += acc(1) * (m - grand) * (m - grand) })
    var ssw = 0.0
    i = 0
    while (i < n) {
      val r = pairs.getStruct(i, 2)
      val acc = sums.get(r.getLong(1))
      val m = acc(0) / acc(1)
      ssw += (r.getDouble(0) - m) * (r.getDouble(0) - m)
      i += 1
    }
    val df1 = (k - 1).toDouble; val df2 = (n - k).toDouble
    val f = (ssb / df1) / (ssw / df2)
    val p = incBeta(df2 / 2, df1 / 2, df2 / (df2 + df1 * f))
    new GenericInternalRow(Array[Any](f, p))
  }

  /** groupArrayInsertAt(x, pos): position-addressed array build; gaps
    * stay null (string carrier — documented). Last write wins on
    * duplicate positions after a deterministic (pos, value) sort. */
  def groupArrayInsertAt(pairs: ArrayData): ArrayData = {
    val n = pairs.numElements()
    var maxPos = -1L
    var i = 0
    while (i < n) {
      maxPos = math.max(maxPos, pairs.getStruct(i, 2).getLong(0)); i += 1
    }
    if (maxPos < 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any]((maxPos + 1).toInt)
    val items = Array.tabulate(n) { j =>
      val r = pairs.getStruct(j, 2)
      (r.getLong(0), if (r.isNullAt(1)) null else r.getUTF8String(1))
    }.sortBy(x => (x._1, if (x._2 == null) "" else x._2.toString))
    items.foreach { case (pos, v) => out(pos.toInt) = v }
    new GenericArrayData(out)
  }

  /** The exact byte span URLHash hashes (FunctionsHashing.h:1520-1588
    * URLHashImpl/URLHierarchyHashImpl): cut to hierarchy `level` (0 =
    * whole URL), then drop ONE trailing '/', '?' or '#'. The hash
    * itself is the session's cityHash64 carrier (XxHash64 stand-in,
    * documented at its registration). */
  def urlHashCut(url: UTF8String, level: Long): UTF8String = {
    val s = url.toString
    val cut =
      if (level <= 0) s
      else {
        val proto = s.indexOf("://")
        if (proto <= 0) { if (level == 0) s else "" }
        else {
          var pos = proto + 3
          while (pos < s.length && !"/?#".contains(s.charAt(pos))) pos += 1
          if (pos < s.length) pos += 1
          var cur = 0L
          while (cur != level && pos < s.length) {
            while (pos < s.length && "/?#".contains(s.charAt(pos))) pos += 1
            if (pos < s.length) {
              while (pos < s.length && !"/?#".contains(s.charAt(pos)))
                pos += 1
              if (pos < s.length) pos += 1
              cur += 1
            }
          }
          if (cur == level) s.substring(0, pos) else ""
        }
      }
    val trimmed =
      if (cut.nonEmpty && "/?#".contains(cut.charAt(cut.length - 1)))
        cut.substring(0, cut.length - 1)
      else cut
    UTF8String.fromString(trimmed)
  }

  /** isDecimalOverflow (src/Functions/isDecimalOverflow.cpp): do the
    * decimal's significant digits exceed the precision? */
  def isDecimalOverflow(d: Decimal, precision: Int): Boolean =
    d.toJavaBigDecimal.unscaledValue.abs.toString.length > precision

  // ---- JSON path introspection (src/Functions/JSONPaths.cpp family)
  // over the engine's TEXT/Variant JSON carrier: AllPaths walks the
  // document's leaf paths; on a text carrier every path is a dynamic
  // path and there is no shared-data section, so DynamicPaths ≡
  // AllPaths and SharedDataPaths ≡ [] (documented — those split on the
  // reference's column-layout internals, which have no analog here) ---

  private def jsonLeafPaths(json: String): Seq[(String, String)] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    def typeName(n: com.fasterxml.jackson.databind.JsonNode): String =
      if (n.isNull) "None"
      else if (n.isBoolean) "Bool"
      else if (n.isIntegralNumber) "Int64"
      else if (n.isNumber) "Float64"
      else if (n.isTextual) "String"
      else if (n.isArray) {
        import scala.jdk.CollectionConverters._
        val inner = n.elements.asScala.map(typeName).toSeq.distinct
        s"Array(${if (inner.size == 1) s"Nullable(${inner.head})"
          else "Nullable(String)"})"
      } else "String"
    def walk(n: com.fasterxml.jackson.databind.JsonNode,
        prefix: String): Unit =
      if (n.isObject) {
        val it = n.fields()
        while (it.hasNext) {
          val e = it.next()
          val p = if (prefix.isEmpty) e.getKey else s"$prefix.${e.getKey}"
          if (e.getValue.isObject) walk(e.getValue, p)
          else out += ((p, typeName(e.getValue)))
        }
      }
    walk(root, "")
    out.sortBy(_._1).toSeq
  }

  def jsonAllPaths(json: UTF8String): ArrayData =
    new GenericArrayData(jsonLeafPaths(json.toString)
      .map(p => UTF8String.fromString(p._1): Any).toArray)

  def jsonAllPathsWithTypes(json: UTF8String)
      : org.apache.spark.sql.catalyst.util.MapData = {
    val ps = jsonLeafPaths(json.toString)
    org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      ps.map(p => UTF8String.fromString(p._1)).toArray,
      ps.map(p => UTF8String.fromString(p._2)).toArray)
  }

  /** bitmapTransform(bitmap, fromArr, toArr)
    * (src/Functions/FunctionsBitmap.h bitmapTransform): for each
    * from[i] present in the bitmap, remove it and add to[i]. */
  def bitmapTransform(b: Array[Byte], from: ArrayData,
      to: ArrayData): Array[Byte] = {
    require(from.numElements() == to.numElements(),
      "bitmapTransform: from/to arrays must be the same size")
    val values = BitmapKernels.toArr(b)
    val mapping = (0 until from.numElements())
      .map(i => from.getLong(i) -> to.getLong(i)).toMap
    val out = (0 until values.numElements())
      .map(i => { val v = values.getLong(i); mapping.getOrElse(v, v) })
      .distinct.toArray
    BitmapKernels.build(new GenericArrayData(out.map(x => x: Any)))
  }

  // ---- WKT geometry text readers (the OGC 06-103r4 well-known-text
  // grammar — a published spec; reference src/Functions/readWkt.cpp
  // consumes the same forms): POINT / LINESTRING / RING (a linestring
  // body) / POLYGON / MULTILINESTRING / MULTIPOLYGON. Output shapes
  // follow the engine's geo carrier: point = struct(x, y), ring/line =
  // array(point), polygon = array(ring), multi* = one more level. ----

  private def point(x: Double, y: Double): InternalRow =
    new GenericInternalRow(Array[Any](x, y))

  private def parsePointList(s: String): Array[Any] =
    s.split(",").map { p =>
      val xs = p.trim.split("\\s+")
      require(xs.length >= 2, s"WKT: bad point '$p'")
      point(xs(0).toDouble, xs(1).toDouble): Any
    }

  private def stripTag(wkt: String, tag: String): String = {
    val t = wkt.trim
    require(t.toUpperCase.startsWith(tag),
      s"WKT: expected $tag, got: ${t.take(24)}")
    val body = t.substring(tag.length).trim
    require(body.startsWith("(") && body.endsWith(")"),
      s"WKT: expected parenthesized $tag body")
    body.substring(1, body.length - 1)
  }

  /** Split a parenthesized list at depth 0 commas: "(a),(b)" → a, b. */
  private def splitGroups(body: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0; var start = -1
    var i = 0
    while (i < body.length) {
      body.charAt(i) match {
        case '(' => if (depth == 0) start = i + 1; depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) out += body.substring(start, i)
        case _ =>
      }
      i += 1
    }
    out.toSeq
  }

  def readWktPoint(wkt: UTF8String): InternalRow = {
    val xs = stripTag(wkt.toString, "POINT").trim.split("\\s+")
    point(xs(0).toDouble, xs(1).toDouble)
  }
  def readWktLineString(wkt: UTF8String): ArrayData =
    new GenericArrayData(parsePointList(stripTag(wkt.toString, "LINESTRING")))
  /** A ring is a linestring body (readWkt.cpp registers the same
    * parser under the Ring name). */
  def readWktRing(wkt: UTF8String): ArrayData = {
    val s = wkt.toString.trim
    val body =
      if (s.toUpperCase.startsWith("POLYGON"))
        splitGroups(stripTag(s, "POLYGON")).head // first = outer ring
      else stripTag(s, "LINESTRING")
    new GenericArrayData(parsePointList(body))
  }
  def readWktPolygon(wkt: UTF8String): ArrayData = {
    val body = stripTag(wkt.toString, "POLYGON")
    new GenericArrayData(splitGroups(body)
      .map(g => new GenericArrayData(parsePointList(g)): Any).toArray)
  }
  def readWktMultiLineString(wkt: UTF8String): ArrayData = {
    val body = stripTag(wkt.toString, "MULTILINESTRING")
    new GenericArrayData(splitGroups(body)
      .map(g => new GenericArrayData(parsePointList(g)): Any).toArray)
  }
  def readWktMultiPolygon(wkt: UTF8String): ArrayData = {
    val body = stripTag(wkt.toString, "MULTIPOLYGON")
    // each polygon is itself a parenthesized group of rings
    new GenericArrayData(splitGroups(body).map { poly =>
      new GenericArrayData(splitGroups(poly)
        .map(g => new GenericArrayData(parsePointList(g)): Any).toArray): Any
    }.toArray)
  }

  /** pointInPolygon((x, y), polygon) (src/Functions/pointInPolygon.cpp
    * non-indexed path): even-odd crossing number over the outer ring,
    * minus any hole that contains the point. `rings` = array of rings
    * of struct(x, y). */
  def pointInPolygonRings(x: Double, y: Double, rings: ArrayData): Boolean = {
    def inRing(ring: ArrayData): Boolean = {
      val n = ring.numElements()
      var inside = false
      var i = 0
      var j = n - 1
      while (i < n) {
        val pi = ring.getStruct(i, 2); val pj = ring.getStruct(j, 2)
        val xi = pi.getDouble(0); val yi = pi.getDouble(1)
        val xj = pj.getDouble(0); val yj = pj.getDouble(1)
        if (((yi > y) != (yj > y)) &&
            (x < (xj - xi) * (y - yi) / (yj - yi) + xi)) inside = !inside
        j = i; i += 1
      }
      inside
    }
    val nr = rings.numElements()
    if (nr == 0) return false
    if (!inRing(rings.getArray(0))) return false
    var h = 1
    while (h < nr) {
      if (inRing(rings.getArray(h))) return false
      h += 1
    }
    true
  }

  /** sequenceNextNode(direction, base)(ts, event, base_cond, cond1..N)
    * (AggregateFunctionSequenceNextNode.cpp:348-421): sort by
    * timestamp, locate the base row (head / tail / first_match /
    * last_match — match rows need cond1 AND base_cond), walk the
    * condition chain forward or backward, and return the EVENT VALUE of
    * the node after the chain — null if the chain breaks. Input rows:
    * (ts, event, canBase, condition bitmask). */
  def sequenceNextNode(direction: UTF8String, base: UTF8String,
      rows: ArrayData, nConds: Int): UTF8String = {
    val n = rows.numElements()
    if (n == 0) return null
    val idx = (0 until n).sortBy(i => rows.getStruct(i, 4).getLong(0))
    def ev(i: Int): UTF8String = rows.getStruct(idx(i), 4).getUTF8String(1)
    def canBase(i: Int): Boolean = rows.getStruct(idx(i), 4).getLong(2) != 0
    def bit(i: Int, b: Int): Boolean =
      (rows.getStruct(idx(i), 4).getLong(3) & (1L << b)) != 0
    val fwd = direction.toString.toLowerCase match {
      case "forward" => true
      case "backward" => false
      case other => throw new IllegalArgumentException(
        s"sequenceNextNode: unknown direction '$other'")
    }
    val baseIdx: Option[Int] = base.toString.toLowerCase match {
      case "head" => Some(0).filter(canBase)
      case "tail" => Some(n - 1).filter(canBase)
      case "first_match" =>
        (0 until n).find(i => bit(i, 0) && canBase(i))
      case "last_match" =>
        (0 until n).findLast(i => bit(i, 0) && canBase(i))
      case other => throw new IllegalArgumentException(
        s"sequenceNextNode: unknown base '$other'")
    }
    baseIdx.flatMap { b =>
      var i = 0
      var ok = true
      while (ok && i < nConds) {
        val at = if (fwd) b + i else b - i
        ok = at >= 0 && at < n && bit(at, i)
        i += 1
      }
      val next = if (fwd) b + nConds else b - nConds
      if (ok && next >= 0 && next < n) Some(ev(next)) else None
    }.orNull
  }

  /** deltaSumTimestamp(value, ts)
    * (AggregateFunctionDeltaSumTimestamp.cpp): the sum of POSITIVE
    * deltas of `value` in TIMESTAMP order — unlike deltaSum (block-
    * order dependent, documented out), the ordering column makes this
    * deterministic on a shuffled engine. */
  def deltaSumTimestamp(pairs: ArrayData): Double = {
    val n = pairs.numElements()
    if (n == 0) return 0.0
    val idx = (0 until n).sortBy(i => pairs.getStruct(i, 2).getDouble(1))
    var sum = 0.0
    var prev = pairs.getStruct(idx(0), 2).getDouble(0)
    var i = 1
    while (i < n) {
      val v = pairs.getStruct(idx(i), 2).getDouble(0)
      if (v > prev) sum += v - prev
      prev = v
      i += 1
    }
    sum
  }

  /** sequenceMatch / sequenceCount pattern subset
    * (AggregateFunctionSequenceMatch.h): `(?N)` event steps separated
    * by `.*` (any gap) — the dominant funnel shapes. `.` (exactly one
    * event) and time conditions reject loudly as documented. Input:
    * (tsMicros, condBitmask) pairs; a row may satisfy several conds. */
  private def parseSeqPattern(pattern: String): Seq[Int] = {
    val stepRe = "\\(\\?(\\d+)\\)".r
    val stripped = pattern.replace(".*", "")
    val steps = stepRe.findAllMatchIn(pattern).map(_.group(1).toInt).toSeq
    require(stepRe.replaceAllIn(stripped, "").isEmpty,
      s"sequenceMatch: only the '(?N)' and '.*' pattern atoms are " +
        s"supported (documented subset), got: $pattern")
    steps
  }

  private def sortedEvents(pairs: ArrayData): (Array[Long], Array[Long]) = {
    val n = pairs.numElements()
    val ts = new Array[Long](n); val mask = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = pairs.getStruct(i, 2)
      ts(i) = r.getLong(0); mask(i) = r.getLong(1)
      i += 1
    }
    val idx = (0 until n).sortBy(ts)
    (idx.map(ts).toArray, idx.map(mask).toArray)
  }

  def sequenceMatch(pattern: UTF8String, pairs: ArrayData): Boolean =
    sequenceSearch(pattern, pairs, countAll = false) > 0

  /** sequenceMatchEvents: the timestamps of the FIRST match's step
    * events (AggregateFunctionSequenceMatch.h events lane). */
  def sequenceMatchEvents(pattern: UTF8String, pairs: ArrayData): ArrayData = {
    val steps = parseSeqPattern(pattern.toString)
    val (ts, mask) = sortedEvents(pairs)
    val hit = new Array[Any](steps.length)
    var pos = 0; var step = 0
    while (pos < mask.length && step < steps.length) {
      if ((mask(pos) & (1L << (steps(step) - 1))) != 0) {
        hit(step) = ts(pos)
        step += 1
      }
      pos += 1
    }
    if (step == steps.length) new GenericArrayData(hit)
    else new GenericArrayData(Array.empty[Any])
  }

  def sequenceCount(pattern: UTF8String, pairs: ArrayData): Long =
    sequenceSearch(pattern, pairs, countAll = true)

  private def sequenceSearch(pattern: UTF8String, pairs: ArrayData,
      countAll: Boolean): Long = {
    val steps = parseSeqPattern(pattern.toString)
    val (_, mask) = sortedEvents(pairs)
    var count = 0L
    var pos = 0
    var step = 0
    while (pos < mask.length) {
      if ((mask(pos) & (1L << (steps(step) - 1))) != 0) {
        step += 1
        if (step == steps.length) {
          count += 1
          if (!countAll) return count
          step = 0 // non-overlapping continuation, like the reference
        }
      }
      pos += 1
    }
    count
  }
}
