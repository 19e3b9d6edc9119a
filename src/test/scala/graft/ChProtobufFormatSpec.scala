package graft

import graft.sources.ChProtobufFormat
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Protobuf format (round-13 — closes the round-12 documented format
  * gap). Golden bytes follow the official wire-format documentation's
  * worked examples (varint 150 = 0x96 0x01, zigzag, packed repeated). */
class ChProtobufFormatSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._

  private val proto = """
    syntax = "proto3";
    message T {
      int64 id = 1;
      string name = 2;
      repeated int32 v = 3;
      sint32 z = 4;
      double d = 5;
    }"""

  private val fields = ChProtobufFormat.parseProto(proto, "T")

  test("parseProto: fields in number order; nested/enum reject loudly") {
    assert(fields.map(f => (f.name, f.number, f.ptype, f.repeated)) == Seq(
      ("id", 1, "int64", false), ("name", 2, "string", false),
      ("v", 3, "int32", true), ("z", 4, "sint32", false),
      ("d", 5, "double", false)))
    val e = intercept[IllegalArgumentException] {
      ChProtobufFormat.parseProto(
        "message A { message B { int32 x = 1; } int32 y = 2; }", "A")
    }
    assert(e.getMessage.contains("not found") ||
      e.getMessage.contains("unsupported") ||
      e.getMessage.contains("not supported"))
    val e2 = intercept[IllegalArgumentException] {
      ChProtobufFormat.parseProto("message A { SomeEnum e = 1; }", "A")
    }
    assert(e2.getMessage.contains("unsupported field type"))
    // round 14: map<> / oneof are SUPPORTED now (ChProtobufMapOneofSpec
    // owns their semantics) — here only the parse shape is pinned so a
    // regression back to the silent-skip era stays loud
    val withMap = ChProtobufFormat.parseProto(
      "message A { int64 id = 1; map<string,int64> tags = 2; }", "A")
    assert(withMap.map(f => (f.name, f.isMap)) ==
      Seq(("id", false), ("tags", true)))
    val withOneof = ChProtobufFormat.parseProto(
      "message A { int64 id = 1; oneof pick { int32 a = 2; } }", "A")
    assert(withOneof.map(f => (f.name, f.oneofGroup)) ==
      Seq(("id", None), ("a", Some("pick"))))
  }

  test("golden bytes: the documented wire encoding, byte for byte") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", ArrayType(IntegerType)),
      StructField("z", IntegerType), StructField("d", DoubleType)))
    val row = new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array[Any](150L, "abc", Seq(1, 2, 300), -2, 1.5), schema)
    val got = ChProtobufFormat.encodeRow(row, schema, fields)
      .map(b => f"${b & 0xff}%02x").mkString(" ")
    assert(got ==
      "08 96 01 " +            // field 1 varint 150
      "12 03 61 62 63 " +      // field 2 len-3 "abc"
      "1a 04 01 02 ac 02 " +   // field 3 packed [1, 2, 300]
      "20 03 " +               // field 4 zigzag(-2) = 3
      "29 00 00 00 00 00 00 f8 3f") // field 5 double 1.5 LE
  }

  test("decode ∘ encode is the identity; unknown fields skip; missing " +
      "fields read as proto3 defaults") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", ArrayType(IntegerType)),
      StructField("z", IntegerType), StructField("d", DoubleType)))
    val row = new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array[Any](-7L, "héllo", Seq(0, -1, 1 << 20), 2147483647, -0.25), schema)
    val back = ChProtobufFormat.decodeRow(
      ChProtobufFormat.encodeRow(row, schema, fields), fields)
    assert(back.getLong(0) == -7L)
    assert(back.getString(1) == "héllo")
    assert(back.getSeq[Int](2) == Seq(0, -1, 1 << 20))
    assert(back.getInt(3) == 2147483647)
    assert(back.getDouble(4) == -0.25)
    // unknown field 9 (varint) prepended — must skip cleanly
    val extra = Array[Byte](0x48, 0x2a) ++ // field 9, wt 0, value 42
      ChProtobufFormat.encodeRow(row, schema, fields)
    assert(ChProtobufFormat.decodeRow(extra, fields).getLong(0) == -7L)
    // empty message → all defaults
    val empty = ChProtobufFormat.decodeRow(Array.emptyByteArray, fields)
    assert(empty.getLong(0) == 0L && empty.getString(1) == "" &&
      empty.getSeq[Int](2) == Seq.empty && empty.getDouble(4) == 0.0)
  }

  test("Protobuf directory roundtrip across partitions; ProtobufSingle " +
      "enforces one bare message per stream") {
    val df = (1 to 100).map(i =>
      (i.toLong, s"n$i", Seq(i, i * 2), -i, i / 4.0))
      .toDF("id", "name", "v", "z", "d").repartition(4)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pb_spec").toString
    try {
      ChProtobufFormat.writeProtobuf(df, s"$dir/multi", proto, "T")
      val back = ChProtobufFormat
        .readProtobuf(spark, s"$dir/multi", proto, "T")
      assert(back.count() == 100L)
      val r5 = back.filter("id = 5").collect().head
      assert(r5.getString(1) == "n5" && r5.getSeq[Int](2) == Seq(5, 10) &&
        r5.getInt(3) == -5 && r5.getDouble(4) == 1.25)
      // single: one row per stream
      ChProtobufFormat.writeProtobuf(df.filter("id = 7").coalesce(1),
        s"$dir/single", proto, "T", single = true)
      val one = ChProtobufFormat
        .readProtobuf(spark, s"$dir/single", proto, "T", single = true)
        .collect()
      assert(one.length == 1 && one.head.getLong(0) == 7L)
      val e = intercept[Exception] {
        ChProtobufFormat.writeProtobuf(df.coalesce(1), s"$dir/bad", proto,
          "T", single = true)
      }
      assert(e.getMessage.contains("ProtobufSingle") ||
        Option(e.getCause).exists(_.getMessage.contains("ProtobufSingle")))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("INTO OUTFILE / FROM INFILE FORMAT Protobuf ride the dialect with " +
      "SET format_schema = 'file.proto:Message'; unset setting is loud") {
    val ch = (s: String) => graft.sql.ClickHouseSql.sql(spark, s)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pb_sql").toString
    val t = "graft_pb_t"
    try {
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(s"$dir/cust.proto"),
        "syntax = \"proto3\";\nmessage M { int64 k = 1; string s = 2; }\n")
      spark.sql(s"DROP TABLE IF EXISTS $t")
      ch(s"CREATE TABLE $t (k Int64, s String) ENGINE = MergeTree ORDER BY k")
      ch(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
      // no format_schema set → loud
      spark.conf.unset("graft.ch.format_schema")
      val e = intercept[Exception](ch(
        s"SELECT k, s FROM $t INTO OUTFILE '$dir/out' FORMAT Protobuf"))
      assert(e.getMessage.contains("format_schema"))
      ch(s"SET format_schema = '$dir/cust.proto:M'")
      val n = ch(s"SELECT k, s FROM $t ORDER BY k " +
        s"INTO OUTFILE '$dir/out' FORMAT Protobuf").collect().head.getLong(0)
      assert(n == 3L)
      // read back through INSERT ... FROM INFILE
      ch(s"TRUNCATE TABLE $t")
      val read = ch(s"INSERT INTO $t FROM INFILE '$dir/out' " +
        "FORMAT Protobuf").collect().head.getLong(0)
      assert(read == 3L)
      val rows = spark.table(t).orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally {
      spark.conf.unset("graft.ch.format_schema")
      scala.util.Try(spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("ProtobufList (round 14): one envelope per stream, rows as " +
      "field-1 sub-messages — golden framing bytes + roundtrip") {
    import graft.sources.ChProtobufFormat
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pblist").toString
    try {
      val proto = "syntax = \"proto3\";\n" +
        "message R { int64 k = 1; string s = 2; }"
      val df = Seq((1L, "a"), (2L, "bb")).toDF("k", "s").coalesce(1)
      ChProtobufFormat.writeProtobufList(df, dir, proto, "R")
      val back = ChProtobufFormat.readProtobufList(spark, dir, proto, "R")
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1).toSeq
      assert(back == Seq((1L, "a"), (2L, "bb")))
      // golden framing: <varint total><0x0A><len><row>…
      val f = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".pb")).head
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      // row1 = 08 01 12 01 61 (k=1, s="a") → 5 bytes; row2 = 08 02 12
      // 02 62 62 → 6 bytes; body = (0A 05 row1)(0A 06 row2) = 15 bytes
      assert((bytes(0) & 0xff) == 15, s"envelope length ${bytes(0)}")
      assert((bytes(1) & 0xff) == 0x0a && (bytes(2) & 0xff) == 5,
        "first row must be a field-1 length-5 sub-message")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("nested messages + enums (round 14): struct/enum/array-of-struct " +
      "round trip; open-enum numbers decode to digits; recursion is loud") {
    import graft.sources.ChProtobufFormat.{ProtoRegistry => _, _}
    val proto = """
      syntax = "proto3";
      enum Color { RED = 0; GREEN = 1; BLUE = 2; }
      message Inner { string s = 1; sint64 n = 2; }
      message Outer {
        int64 id = 1;
        Inner one = 2;
        Color color = 3;
        repeated Inner many = 4;
        repeated Color colors = 5;
      }"""
    val reg = parseRegistry(proto)
    assert(reg.enums("Color") == Map("RED" -> 0, "GREEN" -> 1, "BLUE" -> 2))
    val fields = parseProto(proto, "Outer")
    val schema = sparkSchema(fields, reg)
    assert(schema("one").dataType.isInstanceOf[StructType])
    assert(schema("color").dataType == StringType)
    val innerSchema = schema("one").dataType.asInstanceOf[StructType]
    def inner(s: String, n: Long) =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](s, n), innerSchema)
    val row = new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array[Any](7L, inner("hi", -3L), "BLUE",
        Seq(inner("a", 1L), inner("b", -2L)), Seq("RED", "GREEN")),
      schema)
    val back = decodeRow(encodeRow(row, schema, fields, reg), fields, reg)
    assert(back.getLong(0) == 7L)
    assert(back.getStruct(1).getString(0) == "hi" &&
      back.getStruct(1).getLong(1) == -3L)
    assert(back.getString(2) == "BLUE")
    assert(back.getSeq[Row](3).map(r => (r.getString(0), r.getLong(1))) ==
      Seq(("a", 1L), ("b", -2L)))
    assert(back.getSeq[String](4) == Seq("RED", "GREEN"))
    // absent sub-message decodes to null, absent enum to the 0-name
    val empty = decodeRow(Array.emptyByteArray, fields, reg)
    assert(empty.isNullAt(1) && empty.getString(2) == "RED")
    // open enum: an unknown number round-trips as its digits
    val rowNum = new org.apache.spark.sql.catalyst.expressions
      .GenericRowWithSchema(
        Array[Any](1L, null, "9", Seq.empty, Seq.empty), schema)
    assert(decodeRow(encodeRow(rowNum, schema, fields, reg), fields, reg)
      .getString(2) == "9")
    // unknown enum NAME is loud
    val rowBad = new org.apache.spark.sql.catalyst.expressions
      .GenericRowWithSchema(
        Array[Any](1L, null, "MAUVE", Seq.empty, Seq.empty), schema)
    val e = intercept[IllegalArgumentException](
      encodeRow(rowBad, schema, fields, reg))
    assert(e.getMessage.contains("MAUVE"))
    // recursive messages cannot be a table schema
    val e2 = intercept[IllegalArgumentException](parseRegistry(
      "message R { int64 id = 1; R next = 2; }"))
    assert(e2.getMessage.contains("recursive"))
  }
}
