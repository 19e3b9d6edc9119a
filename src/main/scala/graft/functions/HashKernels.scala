package graft.functions

/** Wrap-exact integer hash finalizers from the reference
  * (src/Common/HashTable/Hash.h:499 intHash32, :487 intHash64;
  * salts applied per src/Functions/FunctionsHashing.h:173-192).
  *
  * JVM long arithmetic wraps mod 2^64 exactly like C++ UInt64 for
  * `*`, `+`, `^`, `<<`; `>>>` is the unsigned right shift. These are
  * invoked from the SQL registry via StaticInvoke — a single static
  * call that whole-stage codegen inlines, kept out of Catalyst tree
  * form because ANSI mode would reject the intentional overflow of
  * the multiply/add steps. */
object HashKernels {

  // ---- SimHash / MinHash scalar family (FunctionsStringHash.cpp:
  // ngramSimHash*, wordShingleSimHash*, ngramMinHash*) — name-compatible
  // stand-ins per the engine-wide hash policy (never value-pinned): the
  // gram hash is FNV-1a finalized through intHash64; simhash is the
  // 64-lane majority bit vote; minhash is the (min, secondary-min) pair.

  private def fnv1a(s: String, from: Int, len: Int, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < len) { h ^= s.charAt(from + i); h *= 0x100000001b3L; i += 1 }
    intHash64(h)
  }

  private def simHashOf(hashes: Iterator[Long]): Long = {
    val votes = new Array[Int](64)
    var n = 0
    hashes.foreach { h =>
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1; b += 1 }
      n += 1
    }
    if (n == 0) 0L
    else {
      var out = 0L; var b = 0
      while (b < 64) { if (votes(b) > 0) out |= 1L << b; b += 1 }
      out
    }
  }

  private def gramHashes(s0: String, n: Int, ci: Boolean, seed: Long): Iterator[Long] = {
    val s = if (ci) s0.toLowerCase else s0
    if (s.length < n) Iterator.single(fnv1a(s, 0, s.length, seed))
    else (0 to s.length - n).iterator.map(i => fnv1a(s, i, n, seed))
  }

  private def shingleHashes(s0: String, k: Int, ci: Boolean, seed: Long): Iterator[Long] = {
    val words = (if (ci) s0.toLowerCase else s0).split("\\s+").filter(_.nonEmpty)
    if (words.length == 0) Iterator.empty
    else if (words.length < k) Iterator.single(fnv1a(words.mkString(" "), 0, words.mkString(" ").length, seed))
    else words.sliding(k).map { sh => val j = sh.mkString(" "); fnv1a(j, 0, j.length, seed) }
  }

  def ngramSimHash(s: org.apache.spark.unsafe.types.UTF8String, n: Int): Long =
    simHashOf(gramHashes(s.toString, n, ci = false, 0L))
  def ngramSimHashCI(s: org.apache.spark.unsafe.types.UTF8String, n: Int): Long =
    simHashOf(gramHashes(s.toString, n, ci = true, 0L))
  def wordShingleSimHash(s: org.apache.spark.unsafe.types.UTF8String, k: Int): Long =
    simHashOf(shingleHashes(s.toString, k, ci = false, 0L))
  def wordShingleSimHashCI(s: org.apache.spark.unsafe.types.UTF8String, k: Int): Long =
    simHashOf(shingleHashes(s.toString, k, ci = true, 0L))

  private def minOf(it: Iterator[Long]): Long =
    if (it.isEmpty) 0L else it.min

  def ngramMinHashA(s: org.apache.spark.unsafe.types.UTF8String, n: Int): Long =
    minOf(gramHashes(s.toString, n, ci = false, 0L))
  def ngramMinHashB(s: org.apache.spark.unsafe.types.UTF8String, n: Int): Long =
    minOf(gramHashes(s.toString, n, ci = false, 0x9e3779b97f4a7c15L))
  def wordShingleMinHashA(s: org.apache.spark.unsafe.types.UTF8String, k: Int): Long =
    minOf(shingleHashes(s.toString, k, ci = false, 0L))
  def wordShingleMinHashB(s: org.apache.spark.unsafe.types.UTF8String, k: Int): Long =
    minOf(shingleHashes(s.toString, k, ci = false, 0x9e3779b97f4a7c15L))
  // CaseInsensitive spellings (FunctionsStringHash.cpp CI lanes): same
  // two-lane stand-in over lowercased input; the UTF8 spellings share
  // the base kernels (strings are Unicode here)
  def ngramMinHashACI(s: org.apache.spark.unsafe.types.UTF8String, n: Int): Long =
    minOf(gramHashes(s.toString, n, ci = true, 0L))
  def ngramMinHashBCI(s: org.apache.spark.unsafe.types.UTF8String, n: Int): Long =
    minOf(gramHashes(s.toString, n, ci = true, 0x9e3779b97f4a7c15L))
  def wordShingleMinHashACI(s: org.apache.spark.unsafe.types.UTF8String, k: Int): Long =
    minOf(shingleHashes(s.toString, k, ci = true, 0L))
  def wordShingleMinHashBCI(s: org.apache.spark.unsafe.types.UTF8String, k: Int): Long =
    minOf(shingleHashes(s.toString, k, ci = true, 0x9e3779b97f4a7c15L))

  // *Arg variants (FunctionsStringHash.cpp *Arg lanes): the SHINGLE that
  // achieves each lane's min hash — what the reference exposes as the
  // tuple-of-tuples payload for near-dup diagnosis
  private def argMinGram(s0: String, n: Int, ci: Boolean, seed: Long): String = {
    val s = if (ci) s0.toLowerCase else s0
    if (s.length < n) s
    else (0 to s.length - n).minByOption(i => fnv1a(s, i, n, seed))
      .map(i => s.substring(i, i + n)).getOrElse("")
  }
  private def argMinShingle(s0: String, k: Int, ci: Boolean, seed: Long): String = {
    val words = (if (ci) s0.toLowerCase else s0).split("\\s+").filter(_.nonEmpty)
    if (words.length == 0) ""
    else if (words.length < k) words.mkString(" ")
    else words.sliding(k).map(_.mkString(" "))
      .minByOption(j => fnv1a(j, 0, j.length, seed)).getOrElse("")
  }
  def ngramMinHashArg(s: org.apache.spark.unsafe.types.UTF8String, n: Int,
      ci: Boolean, laneB: Boolean): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      argMinGram(s.toString, n, ci,
        if (laneB) 0x9e3779b97f4a7c15L else 0L))
  def wordShingleMinHashArg(s: org.apache.spark.unsafe.types.UTF8String,
      k: Int, ci: Boolean,
      laneB: Boolean): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      argMinShingle(s.toString, k, ci,
        if (laneB) 0x9e3779b97f4a7c15L else 0L))

  /** 128-bit stand-in: two independent 64-bit lanes, big-endian bytes
    * (FixedString(16) carrier like the reference's sipHash128). */
  def hash128(a: Long, b: Long): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(a); bb.putLong(b); bb.array()
  }

  /** bitSlice(s, offset, length) — bit-level substring
    * (src/Functions/bitSlice.cpp), 1-based bit offset, zero-padded tail.
    * Negative offset counts from the end like the reference. */
  def bitSlice(bytes: Array[Byte], offset0: Int, len: Int): Array[Byte] = {
    val totalBits = bytes.length * 8
    val start0 =
      if (offset0 > 0) offset0 - 1
      else if (offset0 < 0) math.max(totalBits + offset0, 0)
      else 0
    val n = math.max(math.min(len, totalBits - start0), 0)
    val out = new Array[Byte]((n + 7) / 8)
    var i = 0
    while (i < n) {
      val srcBit = start0 + i
      val bit = (bytes(srcBit / 8) >> (7 - srcBit % 8)) & 1
      if (bit == 1) out(i / 8) = (out(i / 8) | (1 << (7 - i % 8))).toByte
      i += 1
    }
    out
  }

  /** intHash64(x ^ seed): the murmur-style 64-bit finalizer. Returns the
    * UInt64 result's signed-long bit pattern (callers render unsigned). */
  def intHash64(x0: Long): Long = {
    var x = x0 ^ 0x4CF2D2BAAE6DA887L
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** intHash32<salt>(key): 64-bit mix keyed down to UInt32 (Hash.h:499). */
  def intHash32(key0: Long): Long = {
    var key = key0 ^ 0x75D9543DE018BF45L
    key = (~key) + (key << 18)
    key = key ^ ((key >>> 31) | (key << 33))
    key = key * 21
    key = key ^ ((key >>> 11) | (key << 53))
    key = key + (key << 6)
    key = key ^ ((key >>> 22) | (key << 42))
    key & 0xFFFFFFFFL
  }
}
