package graft

import java.nio.file.{Files, Paths}

import graft.sources.ChWireFormats
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** RowBinary / Native wire codecs (ref registerFormats.cpp,
  * docs/en/interfaces/formats.md). Golden-byte pins for the documented
  * layout plus full-type roundtrips including nulls, unicode, and the
  * EOF-probe path in the streaming row decoder. */
class ChWireFormatsSpec extends SparkFunSuite {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"wire_$name").toString
    new java.io.File(d).deleteOnExit()
    d
  }

  private val fullSchema = StructType(Seq(
    StructField("i8", ByteType, nullable = false),
    StructField("i16", ShortType, nullable = false),
    StructField("i32", IntegerType, nullable = false),
    StructField("i64", LongType, nullable = false),
    StructField("f32", FloatType, nullable = false),
    StructField("f64", DoubleType, nullable = false),
    StructField("s", StringType, nullable = true),
    StructField("b", BooleanType, nullable = false),
    StructField("d", DateType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("dec", DecimalType(12, 2), nullable = true)))

  private def fullRows: Seq[Row] = Seq(
    Row(1.toByte, 2.toShort, -3, 4L, 1.5f, -2.25,
      "héllo — ünïcode", true,
      java.sql.Date.valueOf("1995-06-17"),
      java.sql.Timestamp.valueOf("1995-06-17 12:34:56.789012"),
      new java.math.BigDecimal("12345.67")),
    Row((-128).toByte, 32767.toShort, Int.MaxValue, Long.MinValue + 1, 0f, 0d,
      null, false, null, null, null),
    Row(0.toByte, 0.toShort, 0, 0L, Float.NaN, Double.PositiveInfinity,
      "", true,
      java.sql.Date.valueOf("1970-01-01"),
      java.sql.Timestamp.valueOf("2038-01-19 03:14:07.0"),
      new java.math.BigDecimal("-0.01")))

  test("RowBinary roundtrips every supported type incl nulls and unicode") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(fullRows, 2), fullSchema)
    val dir = tmp("rb_full")
    ChWireFormats.writeRowBinary(df, dir)
    val back = ChWireFormats.readRowBinary(spark, dir, fullSchema)
    assert(back.orderBy("i8").collect().toSeq ==
      df.orderBy("i8").collect().toSeq)
  }

  test("Native roundtrips every supported type incl nulls and unicode") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(fullRows, 2), fullSchema)
    val dir = tmp("native_full")
    ChWireFormats.writeNative(df, dir)
    val back = ChWireFormats.readNative(spark, dir, fullSchema)
    assert(back.orderBy("i8").collect().toSeq ==
      df.orderBy("i8").collect().toSeq)
  }

  test("RowBinary golden bytes: LE int32, LEB128 string length, null marker") {
    val schema = StructType(Seq(
      StructField("k", IntegerType, nullable = false),
      StructField("v", StringType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(258, "AB"), Row(1, null)), 1), schema)
    val dir = tmp("rb_golden")
    ChWireFormats.writeRowBinary(df, dir)
    val bytes = Files.readAllBytes(Paths.get(dir, "part-00000.rowbinary"))
    // row 1: 258 = 02 01 00 00 LE; present marker 00; len 2; 'A' 'B'
    // row 2: 1 = 01 00 00 00; null marker 01
    val expect = Array[Byte](
      0x02, 0x01, 0x00, 0x00, 0x00, 0x02, 'A'.toByte, 'B'.toByte,
      0x01, 0x00, 0x00, 0x00, 0x01)
    assert(bytes.toSeq == expect.toSeq)
  }

  test("RowBinary LEB128 encodes long strings with a multi-byte length") {
    val schema = StructType(Seq(StructField("v", StringType, nullable = false)))
    val s300 = "x" * 300 // 300 = 0xAC 0x02 in LEB128
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(s300)), 1), schema)
    val dir = tmp("rb_leb")
    ChWireFormats.writeRowBinary(df, dir)
    val bytes = Files.readAllBytes(Paths.get(dir, "part-00000.rowbinary"))
    assert((bytes(0) & 0xff) == 0xac && (bytes(1) & 0xff) == 0x02)
    assert(bytes.length == 302)
    val back = ChWireFormats.readRowBinary(spark, dir, schema).collect()
    assert(back.head.getString(0) == s300)
  }

  test("WithNamesAndTypes header is written and verified; mismatch fails loudly") {
    val schema = StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("d", DateType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(7L, java.sql.Date.valueOf("2001-02-03"))), 1), schema)
    val dir = tmp("rb_wnt")
    ChWireFormats.writeRowBinary(df, dir, withNamesAndTypes = true)
    val ok = ChWireFormats.readRowBinary(spark, dir, schema, withNamesAndTypes = true)
    assert(ok.collect().head == df.collect().head)
    // wrong column name in the expected schema → header verification throws
    val bad = StructType(Seq(
      StructField("WRONG", LongType, nullable = false),
      StructField("d", DateType, nullable = true)))
    val ex = intercept[org.apache.spark.SparkException] {
      ChWireFormats.readRowBinary(spark, dir, bad, withNamesAndTypes = true).collect()
    }
    assert(ex.getMessage != null)
  }

  test("Native header carries CH type names; per-column null mask precedes values") {
    val schema = StructType(Seq(StructField("v", IntegerType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(5), Row(null), Row(7)), 1), schema)
    val dir = tmp("native_mask")
    ChWireFormats.writeNative(df, dir)
    val bytes = Files.readAllBytes(Paths.get(dir, "part-00000.native"))
    // varint 1 col, varint 3 rows, "v" (len 1 + byte), "Nullable(Int32)"
    // (len 15 + bytes), mask 00 01 00, values 05000000 00000000 07000000
    var p = 0
    assert(bytes(p) == 1); p += 1            // num_columns
    assert(bytes(p) == 3); p += 1            // num_rows
    assert(bytes(p) == 1 && bytes(p + 1) == 'v'.toByte); p += 2
    val tn = "Nullable(Int32)"
    assert(bytes(p) == tn.length.toByte); p += 1
    assert(new String(bytes.slice(p, p + tn.length), "UTF-8") == tn); p += tn.length
    assert(bytes.slice(p, p + 3).toSeq == Seq[Byte](0, 1, 0)); p += 3
    assert(bytes.slice(p, p + 4).toSeq == Seq[Byte](5, 0, 0, 0))
    val back = ChWireFormats.readNative(spark, dir, schema).collect()
    assert(back.map(r => Option(r.get(0))).toSet == Set(Some(5), None, Some(7)))
  }

  test("reader parallelism = part files; parts are independently decodable") {
    val df = spark.range(1, 1001)
      .select(col("id").as("n"), concat(lit("row"), col("id")).as("s"))
      .repartition(8)
    val dir = tmp("rb_parts")
    ChWireFormats.writeRowBinary(df, dir)
    val parts = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".rowbinary"))
    assert(parts.length == 8)
    val back = ChWireFormats.readRowBinary(spark, dir, df.schema)
    assert(back.rdd.getNumPartitions == 8)
    assert(back.agg(sum("n")).collect().head.getLong(0) == 500500L)
    assert(back.count() == 1000)
  }

  test("Date range guard: out-of-UInt16-range date fails the write loudly") {
    val schema = StructType(Seq(StructField("d", DateType, nullable = false)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(java.sql.Date.valueOf("2200-01-01"))), 1), schema)
    val dir = tmp("rb_daterange")
    val ex = intercept[org.apache.spark.SparkException] {
      ChWireFormats.writeRowBinary(df, dir)
    }
    assert(ex.getMessage != null)
  }
}
