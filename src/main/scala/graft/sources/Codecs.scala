package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Column compression codec suite — the Spark-side rendering of the
  * reference's per-column codec engine (`src/Compression/`):
  *
  *   - Delta(width)   — byte-lane delta pre-pass (CompressionCodecDelta.cpp)
  *   - DoubleDelta    — delta-of-delta + zigzag varint for timestamp-like
  *                      monotonic sequences (CompressionCodecDoubleDelta.cpp;
  *                      scheme from the published Gorilla paper §4.1.1)
  *   - Gorilla        — XOR + leading/meaningful-bit blocks for
  *                      slowly-varying floats (CompressionCodecGorilla.cpp;
  *                      Gorilla paper §4.1.2)
  *   - T64            — 64×64 bit-matrix transpose + bit-plane crop for
  *                      small-range integers (CompressionCodecT64.cpp)
  *   - GCD            — divide the lane by the column GCD
  *                      (CompressionCodecGCD.cpp)
  *   - LZ4 / ZSTD     — general byte codecs via the lz4-java / zstd-jni
  *                      libraries Spark already ships
  *   - NONE           — identity (CompressionCodecNone.cpp)
  *
  * These are independent Scala implementations of the published schemes —
  * the *wire format* here is this engine's own (each codec documents its
  * framing); the contract is lossless roundtrip + the compression-ratio
  * characteristics that make each codec worth choosing, both pinned in
  * `CodecsSpec`. Chaining (`CODEC(Delta, ZSTD)` in the reference DDL) is
  * `compressChain`/`decompressChain` — the specialized codec is a pre-pass
  * that makes the general codec's entropy coding bite, exactly the
  * reference's CompressionCodecMultiple.cpp pipeline.
  *
  * Everything operates on `Array[Byte]` so it drops into `mapPartitions`
  * over serialized column blocks: at cluster scale each task compresses its
  * own partition's blocks — embarrassingly parallel, no shuffle.
  */
object Codecs {

  // ---------------------------------------------------------------- framing

  /** Frame: [codecId:1][uncompressedLen:varint][payload]. */
  private def frame(id: Byte, uncompressedLen: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(payload.length + 6)
    out.write(id)
    writeVarint(out, uncompressedLen.toLong)
    out.write(payload)
    out.toByteArray
  }

  private def writeVarint(out: ByteArrayOutputStream, value0: Long): Unit = {
    var value = value0
    while ((value & ~0x7fL) != 0) { out.write(((value & 0x7f) | 0x80).toInt); value >>>= 7 }
    out.write(value.toInt)
  }

  private final class Reader(val buf: Array[Byte]) {
    var pos = 0
    def u8(): Int = { val b = buf(pos) & 0xff; pos += 1; b }
    def varint(): Long = {
      var shift = 0; var v = 0L; var b = 0
      do { b = u8(); v |= (b & 0x7fL) << shift; shift += 7 } while ((b & 0x80) != 0)
      v
    }
    def bytes(n: Int): Array[Byte] = { val a = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; a }
    def rest(): Array[Byte] = bytes(buf.length - pos)
  }

  private val IdNone: Byte = 0x00
  private val IdLz4: Byte = 0x01
  private val IdZstd: Byte = 0x02
  private val IdDelta: Byte = 0x03
  private val IdDoubleDelta: Byte = 0x04
  private val IdGorilla: Byte = 0x05
  private val IdT64: Byte = 0x06
  private val IdGcd: Byte = 0x07

  // ------------------------------------------------------------ public API

  /** Compress with one codec. `name` is the reference's DDL spelling,
    * case-insensitive: NONE, LZ4, ZSTD, ZSTD(level), Delta, Delta(width),
    * DoubleDelta, Gorilla, T64, GCD. Width-parameterized codecs interpret
    * the byte array as little-endian lanes of that width (default 8).
    */
  def compress(name: String, data: Array[Byte]): Array[Byte] = parse(name) match {
    case ("none", _)        => frame(IdNone, data.length, data)
    case ("lz4", _)         => lz4Compress(data)
    case ("zstd", lvl)      => zstdCompress(data, lvl.getOrElse(3))
    case ("delta", w)       => frame(IdDelta, data.length, Array((w.getOrElse(8)).toByte) ++ deltaEncode(data, w.getOrElse(8)))
    case ("doubledelta", w) => doubleDeltaCompress(data, w.getOrElse(8))
    case ("gorilla", w)     => gorillaCompress(data, w.getOrElse(8))
    case ("t64", _)         => t64Compress(data)
    case ("gcd", w)         => gcdCompress(data, w.getOrElse(8))
    case (other, _)         => throw new IllegalArgumentException(s"unknown codec $other")
  }

  def decompress(block: Array[Byte]): Array[Byte] = {
    val r = new Reader(block)
    val id = r.u8()
    val n = r.varint().toInt
    id.toByte match {
      case IdNone        => r.rest()
      case IdLz4         => lz4Decompress(r, n)
      case IdZstd        => zstdDecompress(r, n)
      case IdDelta       => val w = r.u8(); deltaDecode(r.rest(), w, n)
      case IdDoubleDelta => doubleDeltaDecompress(r, n)
      case IdGorilla     => gorillaDecompress(r, n)
      case IdT64         => t64Decompress(r, n)
      case IdGcd         => gcdDecompress(r, n)
      case other         => throw new IllegalArgumentException(s"bad codec id $other")
    }
  }

  /** CODEC(A, B, ...) chain: apply left-to-right on compress (the reference
    * applies the specialized pre-pass first, the general codec last). */
  def compressChain(names: Seq[String], data: Array[Byte]): Array[Byte] =
    names.foldLeft(data)((acc, n) => compress(n, acc))

  def decompressChain(depth: Int, block: Array[Byte]): Array[Byte] =
    (1 to depth).foldLeft(block)((acc, _) => decompress(acc))

  private def parse(name: String): (String, Option[Int]) = {
    val m = "(?i)^\\s*([A-Za-z0-9]+)\\s*(?:\\(\\s*(\\d+)\\s*\\))?\\s*$".r
    name match {
      case m(n, null) => (n.toLowerCase, None)
      case m(n, p)    => (n.toLowerCase, Some(p.toInt))
      case _ => throw new IllegalArgumentException(s"bad codec spec '$name'")
    }
  }

  // --------------------------------------------------------- lane helpers

  def longsToBytes(values: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(values.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    values.foreach(bb.putLong); bb.array()
  }

  def bytesToLongs(data: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(data.length / 8)(bb.getLong)
  }

  def doublesToBytes(values: Array[Double]): Array[Byte] =
    longsToBytes(values.map(java.lang.Double.doubleToRawLongBits))

  def bytesToDoubles(data: Array[Byte]): Array[Double] =
    bytesToLongs(data).map(java.lang.Double.longBitsToDouble)

  private def readLanes(data: Array[Byte], width: Int): Array[Long] = {
    require(data.length % width == 0, s"data not a multiple of lane width $width")
    val n = data.length / width
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var v = 0L; var b = 0
      while (b < width) { v |= (data(i * width + b) & 0xffL) << (8 * b); b += 1 }
      out(i) = v; i += 1
    }
    out
  }

  private def writeLanes(values: Array[Long], width: Int): Array[Byte] = {
    val out = new Array[Byte](values.length * width)
    var i = 0
    while (i < values.length) {
      var b = 0
      while (b < width) { out(i * width + b) = ((values(i) >>> (8 * b)) & 0xff).toByte; b += 1 }
      i += 1
    }
    out
  }

  // -------------------------------------------------------------- LZ4/ZSTD

  private def lz4Compress(data: Array[Byte]): Array[Byte] = {
    val c = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
    frame(IdLz4, data.length, c.compress(data))
  }

  private def lz4Decompress(r: Reader, n: Int): Array[Byte] = {
    val d = net.jpountz.lz4.LZ4Factory.fastestInstance().fastDecompressor()
    d.decompress(r.rest(), n)
  }

  private def zstdCompress(data: Array[Byte], level: Int): Array[Byte] =
    frame(IdZstd, data.length, com.github.luben.zstd.Zstd.compress(data, level))

  private def zstdDecompress(r: Reader, n: Int): Array[Byte] =
    com.github.luben.zstd.Zstd.decompress(r.rest(), n)

  // ----------------------------------------------------------------- Delta

  /** Per-lane delta: out[i] = in[i] - in[i-1] (lane arithmetic wraps, so
    * the inverse prefix-sum is exact for any input). Sorted keys become
    * small near-constant deltas — LZ4/ZSTD then collapse them. */
  private def deltaEncode(data: Array[Byte], width: Int): Array[Byte] = {
    val lanes = readLanes(data, width)
    val out = new Array[Long](lanes.length)
    var prev = 0L; var i = 0
    while (i < lanes.length) { out(i) = lanes(i) - prev; prev = lanes(i); i += 1 }
    writeLanes(out, width)
  }

  private def deltaDecode(payload: Array[Byte], width: Int, n: Int): Array[Byte] = {
    val lanes = readLanes(payload, width)
    var acc = 0L; var i = 0
    while (i < lanes.length) { acc += lanes(i); lanes(i) = acc; i += 1 }
    val out = writeLanes(lanes, width)
    require(out.length == n, s"delta decode length ${out.length} != $n")
    out
  }

  // ----------------------------------------------------------- DoubleDelta

  /** Delta-of-delta, zigzag + varint coded. Monotonic timestamps with a
    * stable step encode to ~1 byte per value. Frame payload:
    * [width:1][count:varint][first:varint zz][firstDelta:varint zz][dods...] */
  private def doubleDeltaCompress(data: Array[Byte], width: Int): Array[Byte] = {
    val lanes = readLanes(data, width)
    val out = new ByteArrayOutputStream(lanes.length + 16)
    out.write(width)
    writeVarint(out, lanes.length.toLong)
    if (lanes.nonEmpty) {
      writeVarint(out, zigzag(lanes(0)))
      if (lanes.length > 1) {
        val d0 = lanes(1) - lanes(0)
        writeVarint(out, zigzag(d0))
        var prev = lanes(1); var prevDelta = d0; var i = 2
        while (i < lanes.length) {
          val d = lanes(i) - prev
          writeVarint(out, zigzag(d - prevDelta))
          prevDelta = d; prev = lanes(i); i += 1
        }
      }
    }
    frame(IdDoubleDelta, data.length, out.toByteArray)
  }

  private def doubleDeltaDecompress(r: Reader, n: Int): Array[Byte] = {
    val width = r.u8()
    val count = r.varint().toInt
    val lanes = new Array[Long](count)
    if (count > 0) {
      lanes(0) = unzigzag(r.varint())
      if (count > 1) {
        var delta = unzigzag(r.varint())
        lanes(1) = lanes(0) + delta
        var i = 2
        while (i < count) {
          delta += unzigzag(r.varint())
          lanes(i) = lanes(i - 1) + delta
          i += 1
        }
      }
    }
    val out = writeLanes(lanes, width)
    require(out.length == n, s"doubledelta decode length ${out.length} != $n")
    out
  }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1L)

  // -------------------------------------------------------------- Gorilla

  /** XOR float scheme (Gorilla §4.1.2): xor with the previous value; a zero
    * xor is one '0' bit; otherwise '1' + either reuse of the previous
    * leading/meaningful-bit window ('0') or '1' + 6-bit leading count +
    * 6-bit meaningful length + the meaningful bits. */
  private def gorillaCompress(data: Array[Byte], width: Int): Array[Byte] = {
    val lanes = readLanes(data, width)
    val w = new BitWriter
    w.writeBits(width.toLong, 8)
    w.writeBits(lanes.length.toLong, 32)
    if (lanes.nonEmpty) {
      w.writeBits(lanes(0), width * 8)
      var prev = lanes(0)
      var prevLead = -1; var prevLen = -1
      var i = 1
      while (i < lanes.length) {
        val x = lanes(i) ^ prev
        if (x == 0L) w.writeBit(0)
        else {
          w.writeBit(1)
          val lead0 = java.lang.Long.numberOfLeadingZeros(x) - (64 - width * 8)
          val lead = math.min(lead0, 31)
          val trail = java.lang.Long.numberOfTrailingZeros(x)
          val len = width * 8 - lead - trail
          if (prevLead >= 0 && lead >= prevLead && lead + len <= prevLead + prevLen) {
            w.writeBit(0)
            w.writeBits(x >>> (width * 8 - prevLead - prevLen), prevLen)
          } else {
            w.writeBit(1)
            w.writeBits(lead.toLong, 6)
            // len ∈ [1, 64] won't fit 6 bits — store len-1 (Gorilla paper
            // stores the raw length and special-cases 0≡64; len-1 is simpler)
            w.writeBits((len - 1).toLong, 6)
            w.writeBits(x >>> trail, len)
            prevLead = lead; prevLen = len
          }
        }
        prev = lanes(i); i += 1
      }
    }
    frame(IdGorilla, data.length, w.toBytes)
  }

  private def gorillaDecompress(r: Reader, n: Int): Array[Byte] = {
    val br = new BitReader(r.rest())
    val width = br.readBits(8).toInt
    val count = br.readBits(32).toInt
    val lanes = new Array[Long](count)
    if (count > 0) {
      lanes(0) = br.readBits(width * 8)
      var prev = lanes(0); var lead = 0; var len = 0
      var i = 1
      while (i < count) {
        if (br.readBit() == 0) lanes(i) = prev
        else {
          if (br.readBit() == 1) { lead = br.readBits(6).toInt; len = br.readBits(6).toInt + 1 }
          val meaningful = br.readBits(len)
          lanes(i) = prev ^ (meaningful << (width * 8 - lead - len))
        }
        prev = lanes(i); i += 1
      }
    }
    val out = writeLanes(lanes, width)
    require(out.length == n, s"gorilla decode length ${out.length} != $n")
    out
  }

  private final class BitWriter {
    private val out = new ByteArrayOutputStream()
    private var cur = 0; private var nbits = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nbits += 1
      if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
    }
    def writeBits(v: Long, count: Int): Unit = {
      var i = count - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def toBytes: Array[Byte] = {
      if (nbits > 0) { out.write(cur << (8 - nbits)); cur = 0; nbits = 0 }
      out.toByteArray
    }
  }

  private final class BitReader(buf: Array[Byte]) {
    private var pos = 0; private var bit = 0
    def readBit(): Int = {
      val b = (buf(pos) >>> (7 - bit)) & 1
      bit += 1; if (bit == 8) { bit = 0; pos += 1 }
      b
    }
    def readBits(count: Int): Long = {
      var v = 0L; var i = 0
      while (i < count) { v = (v << 1) | readBit(); i += 1 }
      v
    }
  }

  // ------------------------------------------------------------------ T64

  /** 64×64 bit-matrix transpose over u64 lanes: per 64-value block, crop to
    * the used bit range and emit only those bit-planes — each plane is one
    * u64 of "bit b of all 64 values". Constant/small-range blocks shrink to
    * a handful of planes. Payload: [count:varint] then per block
    * [minVal:varint zz][bits:1][planes...]; values are encoded relative to
    * the block min so sign handling is free. */
  private def t64Compress(data: Array[Byte]): Array[Byte] = {
    val lanes = readLanes(data, 8)
    val out = new ByteArrayOutputStream(data.length / 2 + 16)
    writeVarint(out, lanes.length.toLong)
    var start = 0
    while (start < lanes.length) {
      val end = math.min(start + 64, lanes.length)
      var mn = lanes(start); var i = start + 1
      while (i < end) { if (lanes(i) < mn) mn = lanes(i); i += 1 }
      var maxRel = 0L; i = start
      while (i < end) { val rel = lanes(i) - mn; if (java.lang.Long.compareUnsigned(rel, maxRel) > 0) maxRel = rel; i += 1 }
      val bits = 64 - java.lang.Long.numberOfLeadingZeros(maxRel)
      writeVarint(out, zigzag(mn))
      out.write(bits)
      var b = 0
      while (b < bits) {
        var plane = 0L; i = start
        while (i < end) { plane |= (((lanes(i) - mn) >>> b) & 1L) << (i - start); i += 1 }
        val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(plane)
        out.write(bb.array()); b += 1
      }
      start = end
    }
    frame(IdT64, data.length, out.toByteArray)
  }

  private def t64Decompress(r: Reader, n: Int): Array[Byte] = {
    val count = r.varint().toInt
    val lanes = new Array[Long](count)
    var start = 0
    while (start < count) {
      val end = math.min(start + 64, count)
      val mn = unzigzag(r.varint())
      val bits = r.u8()
      var b = 0
      while (b < bits) {
        val plane = ByteBuffer.wrap(r.bytes(8)).order(ByteOrder.LITTLE_ENDIAN).getLong
        var i = start
        while (i < end) { lanes(i) |= ((plane >>> (i - start)) & 1L) << b; i += 1 }
        b += 1
      }
      var i = start
      while (i < end) { lanes(i) += mn; i += 1 }
      start = end
    }
    val out = writeLanes(lanes, 8)
    require(out.length == n, s"t64 decode length ${out.length} != $n")
    out
  }

  // ------------------------------------------------------------------ GCD

  /** Divide every lane by the column GCD, varint-encode the quotients.
    * Columns stored in fixed units (cents, micros, ms timestamps) collapse
    * by the unit factor. Payload: [width:1][gcd:varint][count:varint][q...] */
  private def gcdCompress(data: Array[Byte], width: Int): Array[Byte] = {
    val lanes = readLanes(data, width)
    var g = 0L
    lanes.foreach(v => g = gcd(g, v))
    g = if (g == Long.MinValue || g == 0) 1L else math.abs(g)
    val out = new ByteArrayOutputStream(data.length / 2 + 16)
    out.write(width)
    writeVarint(out, g)
    writeVarint(out, lanes.length.toLong)
    lanes.foreach(v => writeVarint(out, zigzag(v / g)))
    frame(IdGcd, data.length, out.toByteArray)
  }

  private def gcdDecompress(r: Reader, n: Int): Array[Byte] = {
    val width = r.u8()
    val g = r.varint()
    val count = r.varint().toInt
    val lanes = Array.fill(count)(unzigzag(r.varint()) * g)
    val out = writeLanes(lanes, width)
    require(out.length == n, s"gcd decode length ${out.length} != $n")
    out
  }

  @annotation.tailrec
  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
}
