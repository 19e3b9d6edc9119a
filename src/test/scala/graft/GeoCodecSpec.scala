package graft

import graft.functions.{CodecFunctions, GeoFunctions}
import org.apache.spark.sql.functions._

class GeoCodecSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._

  test("geohashEncode matches public test vectors; decode returns the cell") {
    // public vectors: geohash.org examples
    val df = Seq(
      (1, 10.40744, 57.64911, "u4pruy"),
      (2, -5.6, 42.6, "ezs42e"),
      (3, 0.0, 0.0, "s00000")
    ).toDF("id", "lon", "lat", "expected")
    val out = df.select(col("id"), col("expected"),
      GeoFunctions.geohashEncode(col("lon"), col("lat"), 6).as("gh"))
    assert(out.filter(col("gh") =!= col("expected")).count() == 0)
    // decode(encode(p)) cell centre within one cell of p
    val dec = out.select(col("id"),
      GeoFunctions.geohashDecode(col("gh"), 6).as("c"))
      .select(col("id"), col("c.lon"), col("c.lat"))
      .as[(Int, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap.apply(1)
    assert(math.abs(dec._1 - 10.40744) < 0.011 && math.abs(dec._2 - 57.64911) < 0.006)
  }

  test("pointInPolygon crossing test") {
    val square = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    val df = Seq((1, 2.0, 2.0, true), (2, 5.0, 2.0, false), (3, -1.0, 1.0, false),
      (4, 3.9, 3.9, true)).toDF("id", "x", "y", "expected")
    val out = df.select(col("expected"),
      GeoFunctions.pointInPolygon(col("x"), col("y"), square).as("got"))
    assert(out.filter(col("got") =!= col("expected")).count() == 0)
  }

  test("ipv6NumToString canonicalizes per RFC 5952") {
    val vecs = Seq(
      ("20010db8000000000000ff0000428329", "2001:db8::ff00:42:8329"),
      ("00000000000000000000000000000001", "::1"),
      ("00000000000000000000000000000000", "::"),
      ("fe800000000000000000000000000001", "fe80::1"),
      ("20010db8000100020003000400050006", "2001:db8:1:2:3:4:5:6"),
      ("20010db8000000010001000100010001", "2001:db8:0:1:1:1:1:1"), // 1-run not compressed
      ("20010000000000010000000000010001", "2001::1:0:0:1:1")       // leftmost of two runs
    ).toDF("hx", "expected")
    val out = vecs.select(col("expected"),
      CodecFunctions.ipv6NumToString(unhex(upper(col("hx")))).as("got"))
    val bad = out.filter(col("got") =!= col("expected"))
      .as[(String, String)].collect()
    assert(bad.isEmpty, bad.mkString(", "))
  }

  test("ipv6StringToNum inverts ipv6NumToString; uuid codecs round-trip") {
    val strs = Seq("2001:db8::ff00:42:8329", "::1", "fe80::1",
      "2001:db8:1:2:3:4:5:6", "2001:db8:0:1:1:1:1:1").toDF("s")
    val rt = strs.select(col("s"),
      CodecFunctions.ipv6NumToString(CodecFunctions.ipv6StringToNum(col("s"))).as("rt"))
    assert(rt.filter(col("s") =!= col("rt")).count() == 0)

    val u = Seq("550e8400-e29b-41d4-a716-446655440000").toDF("u")
    val urt = u.select(col("u"),
      CodecFunctions.uuidNumToString(CodecFunctions.uuidStringToNum(col("u"))).as("rt"))
    assert(urt.filter(col("u") =!= col("rt")).count() == 0)
  }
}
