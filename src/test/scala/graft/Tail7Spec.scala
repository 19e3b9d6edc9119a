package graft

import graft.functions.SweepKernels7
import graft.sql.ClickHouseSql
import org.apache.spark.unsafe.types.UTF8String

/** Round-10 sweep #7 contracts: the SipHash-2-4 implementation against
  * the OFFICIAL published test vectors, range semantics of the unsigned
  * conversion lanes, and kernel edges. */
class Tail7Spec extends SparkFunSuite {

  private val k0 = 0x0706050403020100L
  private val k1 = 0x0f0e0d0c0b0a0908L

  test("sipHash64Keyed matches the official SipHash-2-4 vectors") {
    // the reference C implementation's published vectors_sip64 for the
    // standard key over inputs 00..len-1
    val vectors = Map(
      0 -> 0x726fdb47dd0e0e31L, 1 -> 0x74f839c593dc67fdL,
      2 -> 0x0d6c8009d9a94f5aL, 3 -> 0x85676696d7fb7e2dL,
      8 -> 0x93f5f5799a932462L, 15 -> 0xa129ca6149be45e5L,
      16 -> 0x3f2acc7f57c29bdbL, 63 -> 0x958a324ceb064572L)
    vectors.foreach { case (len, expect) =>
      val data = Array.tabulate[Byte](len)(_.toByte)
      assert(SweepKernels7.sipHash64Keyed(k0, k1, data) == expect,
        s"len=$len")
    }
  }

  test("sipHash64 is the zero-key SipHash-2-4; 128 lanes are 16 bytes") {
    assert(SweepKernels7.sipHash64("abc".getBytes) ==
      SweepKernels7.sipHash64Keyed(0L, 0L, "abc".getBytes))
    assert(SweepKernels7.sipHash128("abc".getBytes).length == 16)
    assert(SweepKernels7.sipHash128Reference("abc".getBytes).length == 16)
    // legacy vs reference 128 differ (different finalizer constants)
    assert(!java.util.Arrays.equals(
      SweepKernels7.sipHash128("abc".getBytes),
      SweepKernels7.sipHash128Reference("abc".getBytes)))
  }

  test("halfMD5 is the MD5 top-8-bytes big-endian contract") {
    // MD5('abc') = 900150983cd24fb0... -> 0x900150983cd24fb0 signed
    assert(SweepKernels7.halfMd5("abc".getBytes) == 0x900150983cd24fb0L)
  }

  test("parseTimeDelta parses unit combinations and rejects junk") {
    assert(SweepKernels7.parseTimeDelta(UTF8String.fromString("1h 30m")) == 5400.0)
    assert(SweepKernels7.parseTimeDelta(UTF8String.fromString("2d")) == 172800.0)
    assert(SweepKernels7.parseTimeDelta(UTF8String.fromString("42")) == 42.0)
    assert(SweepKernels7.parseTimeDelta(
      UTF8String.fromString("1.5 s 100ms")) == 1.6)
    intercept[IllegalArgumentException] {
      SweepKernels7.parseTimeDelta(UTF8String.fromString("3 parsecs"))
    }
  }

  test("toFixedString pads with NUL and rejects over-length input") {
    assert(SweepKernels7.toFixedString(UTF8String.fromString("ab"), 4)
      .toSeq == Seq[Byte](97, 98, 0, 0))
    intercept[IllegalArgumentException] {
      SweepKernels7.toFixedString(UTF8String.fromString("abcdef"), 4)
    }
  }

  test("unsigned OrNull lanes range-check instead of wrapping") {
    val r = ClickHouseSql.sql(spark, """
      SELECT toUInt8OrNull('255') AS a, toUInt8OrNull('256') IS NULL AS b,
             toUInt16OrNull('-1') IS NULL AS c,
             toUInt32OrNull('4294967295') AS d,
             toUInt32OrNull('4294967296') IS NULL AS e""").collect().head
    assert(r.getShort(0) == 255)
    assert(r.getBoolean(1) && r.getBoolean(2))
    assert(r.getLong(3) == 4294967295L)
    assert(r.getBoolean(4))
  }

  test("sweep #8 kernels: serial monotonicity, byteSize recursion, charset") {
    // generateSerialID: successive statements draw increasing values
    val a = ClickHouseSql.sql(spark,
      "SELECT CAST(generateSerialID('t7_probe') AS BIGINT) AS v")
      .collect().head.getLong(0)
    val b = ClickHouseSql.sql(spark,
      "SELECT CAST(generateSerialID('t7_probe') AS BIGINT) AS v")
      .collect().head.getLong(0)
    assert(b > a, s"serial must be monotonic: $a then $b")
    // byteSize recurses into arrays of strings (len + 9 each + header)
    val bs = ClickHouseSql.sql(spark,
      "SELECT CAST(byteSize(array('ab', 'c')) AS BIGINT) AS v")
      .collect().head.getLong(0)
    assert(bs == 8 + (2 + 9) + (1 + 9), s"got $bs")
    // convertCharset decodes legacy bytes to the right text
    val cc = ClickHouseSql.sql(spark,
      "SELECT convertCharset(unhex('E9E8'), 'ISO-8859-1', 'UTF-8') AS v")
      .collect().head.getString(0)
    assert(cc == "éè")
  }

  test("currentUser follows SET user") {
    ClickHouseSql.sql(spark, "CREATE USER IF NOT EXISTS t7_user")
    try {
      ClickHouseSql.sql(spark, "SET user = 't7_user'")
      val who = ClickHouseSql.sql(spark, "SELECT currentUser() AS u")
        .collect().head.getString(0)
      assert(who == "t7_user")
    } finally {
      ClickHouseSql.sql(spark, "SET user = 'default'")
      ClickHouseSql.sql(spark, "DROP USER IF EXISTS t7_user")
    }
  }
}
