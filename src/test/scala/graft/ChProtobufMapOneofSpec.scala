package graft

import graft.sources.ChProtobufFormat
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Protobuf `map<K, V>` + `oneof` (round 14 — closes the last
  * protobuf surface gap). Wire shape per the official encoding doc:
  * a map field is a repeated entry message (key = 1, value = 2, each
  * entry length-delimited, never packed); oneof members are plain
  * fields with EXPLICIT presence. Golden bytes are hand-derived from
  * the doc's worked examples. */
class ChProtobufMapOneofSpec extends SparkFunSuite {

  private def row(schema: StructType, vs: Any*): Row =
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      vs.toArray, schema)

  private val proto = """
    syntax = "proto3";
    message T {
      int64 id = 1;
      map<string, int64> tags = 2;
      oneof pick {
        int32 a = 3;
        string b = 4;
      }
    }"""
  private val reg = ChProtobufFormat.parseRegistry(proto)
  private val fields = ChProtobufFormat.parseProto(proto, "T")
  private val schema = ChProtobufFormat.sparkSchema(fields, reg)

  test("parse: map + oneof fields land with the right shape and schema") {
    assert(fields.map(f => (f.name, f.number, f.isMap, f.oneofGroup)) ==
      Seq(("id", 1, false, None), ("tags", 2, true, None),
        ("a", 3, false, Some("pick")), ("b", 4, false, Some("pick"))))
    assert(schema("tags").dataType ==
      MapType(StringType, LongType, valueContainsNull = false))
    assert(schema("a").dataType == IntegerType)
    assert(schema("b").dataType == StringType)
  }

  test("golden bytes: one map entry = length-delimited key/value message") {
    val r = row(schema, 1L, Map("ab" -> 7L), null, null)
    val got = ChProtobufFormat.encodeRow(r, schema, fields, reg)
      .map(x => f"${x & 0xff}%02x").mkString(" ")
    // field 1 varint 1; field 2 entry { 0a 02 'a' 'b', 10 07 }
    assert(got == "08 01 12 06 0a 02 61 62 10 07")
  }

  test("map roundtrip: multi-entry, empty, and null-on-write maps") {
    val r = row(schema, 5L, Map("x" -> 1L, "y" -> -2L, "" -> 0L), null, null)
    val back = ChProtobufFormat.decodeRow(
      ChProtobufFormat.encodeRow(r, schema, fields, reg), fields, reg)
    assert(back.getAs[Map[String, Long]](1) ==
      Map("x" -> 1L, "y" -> -2L, "" -> 0L))
    // empty map and NULL map both read back as the empty map (proto3:
    // an absent map field IS the empty map)
    for (m <- Seq(Map.empty[String, Long], null)) {
      val b2 = ChProtobufFormat.decodeRow(
        ChProtobufFormat.encodeRow(row(schema, 5L, m, null, null),
          schema, fields, reg), fields, reg)
      assert(b2.getAs[Map[String, Long]](1) == Map.empty[String, Long])
    }
  }

  test("map decode: duplicate keys last-wins; absent key/value default") {
    // two entries for key "k": 1 then 9 — the spec says last wins
    val dup = Array[Byte](
      0x12, 0x05, 0x0a, 0x01, 'k'.toByte, 0x10, 0x01,
      0x12, 0x05, 0x0a, 0x01, 'k'.toByte, 0x10, 0x09)
    assert(ChProtobufFormat.decodeRow(dup, fields, reg)
      .getAs[Map[String, Long]](1) == Map("k" -> 9L))
    // entry with only a value: key defaults to ""; entry with only a
    // key: value defaults to 0
    val halves = Array[Byte](
      0x12, 0x02, 0x10, 0x03, // value-only entry → "" -> 3
      0x12, 0x03, 0x0a, 0x01, 'q'.toByte) // key-only entry → "q" -> 0
    assert(ChProtobufFormat.decodeRow(halves, fields, reg)
      .getAs[Map[String, Long]](1) == Map("" -> 3L, "q" -> 0L))
  }

  test("oneof: explicit presence — unset members stay NULL, set-default " +
      "still round-trips, two set members are loud") {
    val justA = ChProtobufFormat.decodeRow(
      ChProtobufFormat.encodeRow(row(schema, 1L, null, 0, null),
        schema, fields, reg), fields, reg)
    assert(justA.getInt(2) == 0) // set to the default value — present
    assert(justA.isNullAt(3))
    val justB = ChProtobufFormat.decodeRow(
      ChProtobufFormat.encodeRow(row(schema, 1L, null, null, ""),
        schema, fields, reg), fields, reg)
    assert(justB.isNullAt(2))
    assert(justB.getString(3) == "")
    val neither = ChProtobufFormat.decodeRow(
      ChProtobufFormat.encodeRow(row(schema, 1L, null, null, null),
        schema, fields, reg), fields, reg)
    assert(neither.isNullAt(2) && neither.isNullAt(3))
    val e = intercept[IllegalArgumentException] {
      ChProtobufFormat.encodeRow(row(schema, 1L, null, 1, "x"),
        schema, fields, reg)
    }
    assert(e.getMessage.contains("oneof 'pick'"))
  }

  test("message- and enum-valued maps roundtrip; int keys; last-wins " +
      "through the Spark write/read path") {
    val p2 = """
      syntax = "proto3";
      enum Color { RED = 0; GREEN = 1; }
      message Sub { string s = 1; double d = 2; }
      message M {
        int64 id = 1;
        map<int32, Color> colors = 2;
        map<string, Sub> subs = 3;
      }"""
    val reg2 = ChProtobufFormat.parseRegistry(p2)
    val f2 = ChProtobufFormat.parseProto(p2, "M")
    val s2 = ChProtobufFormat.sparkSchema(f2, reg2)
    assert(s2("colors").dataType ==
      MapType(IntegerType, StringType, valueContainsNull = false))
    val subSchema = s2("subs").dataType.asInstanceOf[MapType]
      .valueType.asInstanceOf[StructType]
    val r = row(s2, 9L, Map(1 -> "GREEN", 2 -> "RED", 3 -> "7"),
      Map("k" -> row(subSchema, "v", 1.5)))
    val back = ChProtobufFormat.decodeRow(
      ChProtobufFormat.encodeRow(r, s2, f2, reg2), f2, reg2)
    // enum 7 has no name → open-enum digits
    assert(back.getAs[Map[Int, String]](1) ==
      Map(1 -> "GREEN", 2 -> "RED", 3 -> "7"))
    val sub = back.getAs[Map[String, Row]](2)("k")
    assert(sub.getString(0) == "v" && sub.getDouble(1) == 1.5)
  }

  test("spark roundtrip through write/read, including the FORMAT lane " +
      "schema") {
    val spark = SparkTestBase.spark
    val rows = Seq(
      Row(1L, Map("a" -> 10L), null, "left"),
      Row(2L, Map.empty[String, Long], 5, null),
      Row(3L, Map("x" -> 1L, "y" -> 2L), null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(
        StructField("id", LongType),
        StructField("tags", MapType(StringType, LongType)),
        StructField("a", IntegerType),
        StructField("b", StringType))))
    val path = "/tmp/graft_pb_maponeof_spec"
    ChProtobufFormat.writeProtobuf(df, path, proto, "T")
    val back = ChProtobufFormat.readProtobuf(spark, path, proto, "T")
      .orderBy("id").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(back(0).getAs[Map[String, Long]](1) == Map("a" -> 10L))
    assert(back(0).isNullAt(2) && back(0).getString(3) == "left")
    assert(back(1).getAs[Map[String, Long]](1).isEmpty)
    assert(back(1).getInt(2) == 5 && back(1).isNullAt(3))
    assert(back(2).getAs[Map[String, Long]](1) ==
      Map("x" -> 1L, "y" -> 2L))
    assert(back(2).isNullAt(2) && back(2).isNullAt(3))
  }

  test("parse rejects stay loud: float keys, repeated in oneof, map in " +
      "oneof, nested defs, recursion through a map value") {
    def bad(schema: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        ChProtobufFormat.parseRegistry(schema)
      }
      assert(e.getMessage.contains(needle), e.getMessage)
    }
    bad("message A { map<double, int64> m = 1; }", "map key type")
    bad("message A { oneof p { repeated int32 a = 1; } }",
      "not allowed inside oneof")
    bad("message A { oneof p { map<string, int64> m = 1; } }",
      "not allowed inside oneof")
    bad("message A { message B { int32 x = 1; } int32 y = 2; }",
      "nested message definitions")
    bad("message A { map<string, A> m = 1; }", "recursive")
    bad("message A { reserved 5; int32 y = 2; }", "reserved")
  }
}
