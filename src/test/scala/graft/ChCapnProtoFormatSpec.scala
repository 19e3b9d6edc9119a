package graft

import graft.sources.ChCapnProtoFormat
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** CapnProto format (round 14 — the last unported data format;
  * reference CapnProtoRowInputFormat.cpp over libcapnp). Golden bytes
  * follow capnproto.org/encoding.html: the struct-pointer layout, the
  * compiler's hole-packing field offsets, list pointers, NUL-terminated
  * Text. */
class ChCapnProtoFormatSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._

  test("layout: the hole algorithm packs mixed sizes like capnpc " +
      "(Bool fills a hole left by Int32; Int16 after Int64 opens a " +
      "new word)") {
    val s = ChCapnProtoFormat.parseCapnp("""
      struct T {
        a @0 :Int32;
        b @1 :Bool;
        c @2 :Int64;
        d @3 :Int16;
        e @4 :Bool;
        t @5 :Text;
      }""", "T")
    // a: bits 0-31. b: the 1-bit hole pool after a starts at bit 32.
    // c: needs a fresh word → bits 64-127. d: 16-bit hole at bit 48.
    // e: second 1-bit hole = bit 33. t: pointer slot 0.
    assert(s.bitOffsets("a") == 0)
    assert(s.bitOffsets("b") == 32)
    assert(s.bitOffsets("c") == 64)
    assert(s.bitOffsets("d") == 48)
    assert(s.bitOffsets("e") == 33)
    assert(s.ptrSlots("t") == 0)
    assert(s.dataWords == 2 && s.ptrCount == 1)
  }

  test("golden bytes: the documented Point(1, 2) message, byte for byte") {
    val s = ChCapnProtoFormat.parseCapnp(
      "struct Point { x @0 :Int32; y @1 :Int32; }", "Point")
    val schema = StructType(Seq(
      StructField("x", IntegerType), StructField("y", IntegerType)))
    val row = new org.apache.spark.sql.catalyst.expressions
      .GenericRowWithSchema(Array[Any](1, 2), schema)
    val got = ChCapnProtoFormat.encodeRow(row, schema, s)
    val expect = Array[Int](
      0, 0, 0, 0, // segment count - 1 = 0
      2, 0, 0, 0, // segment size: 2 words
      0, 0, 0, 0, 1, 0, 0, 0, // root ptr: struct, off 0, 1 data word
      1, 0, 0, 0, 2, 0, 0, 0 // x = 1, y = 2
    ).map(_.toByte)
    assert(got.toSeq == expect.toSeq,
      s"got ${got.map(b => b & 0xff).mkString(",")}")
    val back = ChCapnProtoFormat.decodeRow(
      java.util.Arrays.copyOfRange(got, 8, got.length), s)
    assert(back == Row(1, 2))
  }

  test("roundtrip: scalars, enum by name, Text (incl. null), Data, " +
      "List(Int64) through the distributed writer/reader") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_capnp").toString
    try {
      val proto = """
        enum Color { red @0; green @1; blue @2; }
        struct R {
          id @0 :Int64;
          name @1 :Text;
          flag @2 :Bool;
          score @3 :Float64;
          color @4 :Color;
          vs @5 :List(Int64);
          blob @6 :Data;
        }"""
      val cs = ChCapnProtoFormat.parseCapnp(proto, "R")
      val schema = ChCapnProtoFormat.sparkSchema(cs)
      assert(schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
        Seq(("id", "long"), ("name", "string"), ("flag", "boolean"),
          ("score", "double"), ("color", "string"), ("vs", "array"),
          ("blob", "binary")), s"schema order: ${schema.simpleString}")
      val rows = Seq(
        Row(1L, "hello world", true, 1.5, "blue", Seq(7L, -9L),
          Array[Byte](1, 2, 3)),
        Row(2L, null, false, -0.25, "red", Seq.empty[Long],
          Array.emptyByteArray))
      // pure codec check first: element classes must match the schema
      val msg = ChCapnProtoFormat.encodeRow(
        new org.apache.spark.sql.catalyst.expressions
          .GenericRowWithSchema(rows.head.toSeq.toArray, schema), schema, cs)
      val dec = ChCapnProtoFormat.decodeRow(
        java.util.Arrays.copyOfRange(msg, 8, msg.length), cs)
      assert(dec.getSeq[Any](5).map(_.getClass.getSimpleName).distinct ==
        Seq("Long"), s"vs decoded as ${dec.getSeq[Any](5)
          .map(_.getClass.getName)}")
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      ChCapnProtoFormat.writeCapnProto(df, dir, proto, "R")
      val back = ChCapnProtoFormat.readCapnProto(spark, dir, proto, "R")
        .collect().sortBy(_.getLong(0))
      assert(back(0).getLong(0) == 1L &&
        back(0).getString(1) == "hello world" &&
        back(0).getBoolean(2) && back(0).getDouble(3) == 1.5 &&
        back(0).getString(4) == "blue" &&
        back(0).getSeq[Long](5) == Seq(7L, -9L) &&
        back(0).getAs[Array[Byte]](6).toSeq == Seq[Byte](1, 2, 3))
      assert(back(1).isNullAt(1), "null Text must round trip as null")
      assert(back(1).getString(4) == "red" &&
        back(1).getSeq[Long](5).isEmpty)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("loud gates: unions/groups, non-zero defaults, unknown types, " +
      "sparse ordinals") {
    def bad(s: String, what: String): Unit = {
      val e = intercept[IllegalArgumentException](
        ChCapnProtoFormat.parseCapnp(s, "T"))
      assert(e.getMessage.toLowerCase.contains(what),
        s"expected '$what' in: ${e.getMessage}")
    }
    bad("struct T { u :union { a @0 :Int32; b @1 :Int32; } }", "union")
    bad("struct T { a @0 :Int32 = 5; }", "default")
    bad("struct T { a @0 :Wobble; }", "unsupported")
    bad("struct T { a @0 :Int32; b @2 :Int32; }", "dense")
  }
}
