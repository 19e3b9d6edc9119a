package graft

import graft.sources.Codecs
import scala.util.Random

/** Column codec suite (ref src/Compression/CompressionCodec*.cpp):
  * lossless-roundtrip properties on adversarial seeded-random inputs, and
  * the compression-ratio characteristics each codec exists for — a codec
  * that roundtrips but doesn't compress its target shape is mis-implemented.
  */
class CodecsSpec extends SparkFunSuite {

  private def roundtrip(codec: String, data: Array[Byte]): Array[Byte] =
    Codecs.decompress(Codecs.compress(codec, data))

  private def assertRt(codec: String, data: Array[Byte]): Unit =
    assert(roundtrip(codec, data).toSeq == data.toSeq, s"$codec roundtrip")

  private val rng = new Random(0xC0DEC5L)

  private val randomLongs = Array.fill(5000)(rng.nextLong())
  private val sortedKeys = {
    var acc = 1000000L
    Array.fill(5000) { acc += 1 + rng.nextInt(3); acc }
  }
  private val steadyTimestamps = {
    var acc = 1723622400000000L // µs epoch
    Array.fill(5000) { acc += 1000000L + rng.nextInt(2000) - 1000; acc }
  }
  private val smallInts = Array.fill(5000)((1 + rng.nextInt(50)).toLong)
  private val centValues = Array.fill(5000)((rng.nextInt(100000).toLong) * 25L)
  private val slowDoubles = {
    var acc = 500.0
    Array.fill(5000) { acc += (rng.nextDouble() - 0.5) * 0.25; acc }
  }

  private val allCodecs =
    Seq("NONE", "LZ4", "ZSTD", "ZSTD(9)", "Delta", "Delta(4)", "DoubleDelta",
      "Gorilla", "T64", "GCD")

  test("every codec roundtrips random, sorted, steady, small, and cent lanes") {
    val lanes = Seq(randomLongs, sortedKeys, steadyTimestamps, smallInts, centValues)
    for (c <- allCodecs; l <- lanes) assertRt(c, Codecs.longsToBytes(l))
  }

  test("every codec roundtrips empty and single-value blocks") {
    for (c <- allCodecs) {
      assertRt(c, Array.emptyByteArray)
      assertRt(c, Codecs.longsToBytes(Array(42L)))
      assertRt(c, Codecs.longsToBytes(Array(Long.MinValue, Long.MaxValue, 0L, -1L)))
    }
  }

  test("gorilla roundtrips doubles bit-exactly (incl. NaN/Inf/-0.0)") {
    val specials = Array(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue, 1.0 / 3.0)
    for (d <- Seq(slowDoubles, specials)) {
      val bytes = Codecs.doublesToBytes(d)
      val back = Codecs.bytesToDoubles(roundtrip("Gorilla", bytes))
      assert(back.length == d.length)
      back.zip(d).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToRawLongBits(a) ==
          java.lang.Double.doubleToRawLongBits(b))
      }
    }
  }

  test("delta(1/2/4/8) handles every lane width") {
    val bytes = Codecs.longsToBytes(sortedKeys) // 40000 bytes: divisible by all
    for (w <- Seq(1, 2, 4, 8)) assertRt(s"Delta($w)", bytes)
  }

  test("codec chains compose (Delta+ZSTD, GCD+LZ4, T64+ZSTD)") {
    for (chain <- Seq(Seq("Delta(8)", "ZSTD(3)"), Seq("GCD", "LZ4"), Seq("T64", "ZSTD"))) {
      val data = Codecs.longsToBytes(centValues)
      val block = Codecs.compressChain(chain, data)
      assert(Codecs.decompressChain(chain.length, block).toSeq == data.toSeq)
    }
  }

  // --- ratio pins: the reason each specialized codec exists ------------

  private def ratio(chain: Seq[String], data: Array[Byte]): Double =
    Codecs.compressChain(chain, data).length.toDouble / data.length

  test("Delta+ZSTD beats plain ZSTD on sorted keys") {
    val data = Codecs.longsToBytes(sortedKeys)
    val delta = ratio(Seq("Delta(8)", "ZSTD(3)"), data)
    val plain = ratio(Seq("ZSTD(3)"), data)
    assert(delta < plain * 0.8, s"delta=$delta plain=$plain")
    assert(delta < 0.30, s"delta=$delta")
  }

  test("DoubleDelta crushes steady timestamps") {
    val r = ratio(Seq("DoubleDelta"), Codecs.longsToBytes(steadyTimestamps))
    assert(r < 0.30, s"doubledelta ratio=$r") // ~2 bytes per 8-byte µs stamp
  }

  test("T64 crushes small-range integers") {
    val r = ratio(Seq("T64"), Codecs.longsToBytes(smallInts))
    assert(r < 0.20, s"t64 ratio=$r") // 6 bit-planes + header per 64 values
  }

  test("GCD division amplifies LZ4 on fixed-unit lanes") {
    val data = Codecs.longsToBytes(centValues)
    val gcd = ratio(Seq("GCD", "LZ4"), data)
    assert(gcd < 0.75, s"gcd+lz4 ratio=$gcd")
  }

  test("Gorilla compresses slowly-varying doubles") {
    val r = ratio(Seq("Gorilla"), Codecs.doublesToBytes(slowDoubles))
    assert(r < 0.80, s"gorilla ratio=$r")
  }

  test("random data passes through ZSTD/LZ4 without blowup") {
    val data = Codecs.longsToBytes(randomLongs)
    assert(ratio(Seq("ZSTD(3)"), data) < 1.05)
    assert(ratio(Seq("LZ4"), data) < 1.05)
  }
}
