package graft

import java.nio.file.Files

import graft.sources.{ChMiscFormats, ChTextFormats}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-7 format tail: Npy / LineAsString / RawBLOB / MsgPack /
  * JSONColumns. Golden-byte pins nail the layouts to their PUBLIC specs
  * (numpy format v1.0, msgpack.org spec); roundtrips cover the
  * adversarial lanes the text formats already pin. */
class ChMiscFormatsSpec extends SparkFunSuite {

  private def tmp(n: String): String =
    Files.createTempDirectory(s"miscfmt_$n").toString

  test("npy golden bytes: magic, v1.0, padded header dict, LE data") {
    val ss = SparkTestBase.spark
    import ss.implicits._
    val p = tmp("npy")
    ChMiscFormats.writeNpy(Seq(1L, -2L, 300L).toDF("x").coalesce(1), p)
    val f = new java.io.File(p).listFiles().filter(_.getName.endsWith(".npy")).head
    val bytes = Files.readAllBytes(f.toPath)
    assert((bytes(0) & 0xff) == 0x93 && new String(bytes, 1, 5) == "NUMPY")
    assert(bytes(6) == 1 && bytes(7) == 0) // v1.0
    val hlen = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
    assert((10 + hlen) % 64 == 0, s"header must pad to 64, got ${10 + hlen}")
    val header = new String(bytes, 10, hlen)
    assert(header.contains("'descr': '<i8'") &&
      header.contains("'fortran_order': False") &&
      header.contains("'shape': (3,)") && header.endsWith("\n"))
    // little-endian longs follow
    val data = bytes.drop(10 + hlen)
    assert(data.length == 24)
    assert(data(0) == 1 && data(8) == -2.toByte && data(16) == (300 & 0xff).toByte)
    // numpy-written file reads back (round-trip through our own reader)
    val back = ChMiscFormats.readNpy(spark, p, "x")
      .collect().map(_.getLong(0)).toSeq
    assert(back == Seq(1L, -2L, 300L))
  }

  test("msgpack golden bytes per the public spec") {
    val p = tmp("mp")
    val schema = StructType(Seq(
      StructField("i", LongType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("d", DoubleType, nullable = false)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(7L, "ab", 1.5), Row(null, null, -0.0)), 1), schema)
    ChMiscFormats.writeMsgPack(df, p)
    val f = new java.io.File(p).listFiles().filter(_.getName.endsWith(".msgpack")).head
    val b = Files.readAllBytes(f.toPath).map(_ & 0xff)
    // row 1: 7 = positive fixint 0x07; "ab" = fixstr 0xa2 'a' 'b';
    // 1.5 = 0xcb + IEEE754 BE
    assert(b(0) == 0x07 && b(1) == 0xa2 && b(2) == 'a' && b(3) == 'b')
    assert(b(4) == 0xcb && b(5) == 0x3f && b(6) == 0xf8)
    // row 2: nil nil, then -0.0 as 0xcb 0x80 00...
    val r2 = 4 + 9
    assert(b(r2) == 0xc0 && b(r2 + 1) == 0xc0 && b(r2 + 2) == 0xcb && b(r2 + 3) == 0x80)
  }

  test("msgpack roundtrips adversarial strings, negative ints, long strings") {
    val p = tmp("mp2")
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("s", StringType, nullable = true)))
    val big = "x" * 300 // forces str16
    val rows = Seq(
      Row(-1L, "tab\there \"quote\" \\ back"),
      Row(-33L, big), // negative past fixint
      Row(1L << 40, ""), // int64 lane, empty string
      Row(0L, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    ChMiscFormats.writeMsgPack(df, p)
    val back = ChMiscFormats.readMsgPack(spark, p, schema)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .sortBy(_._1).toSeq
    assert(back == rows.map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getString(1))).sortBy(_._1))
  }

  test("RawBLOB: arbitrary bytes survive verbatim, one part per row") {
    val p = tmp("blob")
    val schema = StructType(Seq(StructField("b", BinaryType, nullable = false)))
    val blobs = Seq(
      Array[Byte](0, 1, 2, -1, -128, 127, 10, 13, 0),
      Array[Byte](),
      "plain text".getBytes("UTF-8"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(blobs.map(Row(_)), 2), schema)
    ChMiscFormats.writeRawBlob(df, p)
    assert(new java.io.File(p).listFiles().count(_.getName.endsWith(".blob")) == 3)
    val back = ChMiscFormats.readRawBlob(spark, p)
      .collect().map(_.getAs[Array[Byte]](0).toSeq).toSet
    assert(back == blobs.map(_.toSeq).toSet)
  }

  test("LineAsString: interior empty lines are rows; no escaping applied") {
    val ss = SparkTestBase.spark
    import ss.implicits._
    val p = tmp("lines")
    val vals = Seq("first", "", "tab\tstays literal", "last")
    ChMiscFormats.writeLineAsString(vals.toDF("line").coalesce(1), p)
    val back = ChMiscFormats.readLineAsString(spark, p)
      .collect().map(_.getString(0)).toSeq
    assert(back == vals)
  }

  test("Regexp format: groups bind in order; unmatched lines throw or skip") {
    val ss = SparkTestBase.spark
    import ss.implicits._
    val p = tmp("rx")
    ChMiscFormats.writeLineAsString(
      Seq("1|alpha|2.5", "not a row", "2|beta|-0.25").toDF("line").coalesce(1), p)
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType, nullable = false),
      StructField("d", DoubleType, nullable = false)))
    val rx = "(\\d+)\\|([^|]*)\\|(-?[0-9.]+)"
    // strict mode: the bad line is LOUD
    val err = intercept[org.apache.spark.SparkException] {
      ChMiscFormats.readRegexp(spark, p, schema, rx).collect()
    }
    assert(err.getMessage.contains("does not match") ||
      Option(err.getCause).exists(_.getMessage.contains("does not match")))
    // skip mode: exactly the matching rows
    val got = ChMiscFormats.readRegexp(spark, p, schema, rx,
      skipUnmatched = true).collect().sortBy(_.getLong(0))
    assert(got.length == 2 && got(0).getString(1) == "alpha" &&
      got(1).getDouble(2) == -0.25)
  }

  test("JSONAsString: brace-aware object split survives nested/escaped text") {
    val ss = SparkTestBase.spark
    import ss.implicits._
    val p = tmp("jas")
    // hand-authored stream: nested object, braces inside strings, escapes
    val payload =
      "{\"a\": 1, \"o\": {\"x\": \"}\"}}\n" +
      "{\"b\": \"quote \\\" and { brace\"}\n" +
      "{\"c\": [1, 2, {\"d\": 3}]}"
    ChMiscFormats.writeLineAsString(Seq(payload).toDF("l").coalesce(1), p)
    val objs = ChMiscFormats.readJsonAsString(spark, p, ext = "lines")
      .collect().map(_.getString(0))
    assert(objs.length == 3, s"got ${objs.toSeq}")
    assert(objs(0).contains("\"o\"") && objs(1).contains("brace") &&
      objs(2).endsWith("3}]}"))
  }

  test("JSONColumns roundtrips nulls, escapes, and column order by name") {
    val p = tmp("jc")
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType, nullable = true),
      StructField("d", DoubleType, nullable = true)))
    val rows = Seq(
      Row(1L, "quote \" comma, bracket ]", 1.25),
      Row(2L, null, Double.NaN),
      Row(3L, "newline\\n-as-text", null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    ChTextFormats.writeJsonColumns(df, p)
    val back = ChTextFormats.readJsonColumns(spark, p, schema)
      .collect().sortBy(_.getLong(0))
    assert(back.length == 3)
    assert(back(0).getString(1) == "quote \" comma, bracket ]")
    assert(back(1).isNullAt(1) && back(1).getDouble(2).isNaN)
    assert(back(2).isNullAt(2))
    // reader matches columns BY NAME: a reordered schema still lands
    val reordered = StructType(schema.fields.reverse)
    val viaName = ChTextFormats.readJsonColumns(spark, p, reordered)
      .collect().sortBy(_.getLong(2))
    assert(viaName(0).getDouble(0) == 1.25)
  }
}
