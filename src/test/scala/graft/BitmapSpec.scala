package graft

import graft.functions.BitmapFunctions._
import org.apache.spark.sql.functions._

class BitmapSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._

  test("bitmap state round-trips: build, toArray, contains, scalar build") {
    val st = Seq(3L, 1L, 2L, 2L).toDF("v")
      .agg(bitmapBuildAgg(col("v")).as("bm"))
    val arr = st.select(bitmapToArray(col("bm"))).as[Seq[Long]].collect().head
    assert(arr == Seq(1L, 2L, 3L)) // sorted ascending, deduped
    assert(st.select(bitmapContains(col("bm"), lit(2L))).as[Boolean].collect().head)
    assert(!st.select(bitmapContains(col("bm"), lit(9L))).as[Boolean].collect().head)

    val other = Seq(Seq(2L, 3L, 4L)).toDF("xs")
      .select(bitmapBuild(col("xs")).as("b2"))
    val algebra = st.crossJoin(other).select(
      bitmapAndCardinality(col("bm"), col("b2")).as("and_c"),
      bitmapCardinality(bitmapOr(col("bm"), col("b2"))).as("or_c"),
      bitmapCardinality(bitmapXor(col("bm"), col("b2"))).as("xor_c"),
      bitmapCardinality(bitmapAndnot(col("bm"), col("b2"))).as("andnot_c"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(algebra == ((2L, 4L, 2L, 1L)))
  }

  test("bitmap combine aggregates fold states with the set op") {
    val states = Seq(Seq(1L, 2L, 3L), Seq(2L, 3L, 4L), Seq(3L, 4L, 5L))
      .toDF("xs").select(bitmapBuild(col("xs")).as("st"))
    val r = states.agg(
      bitmapCardinality(bitmapOrAgg(col("st"))).as("u"),
      bitmapCardinality(bitmapAndAgg(col("st"))).as("i"))
      .as[(Long, Long)].collect().head
    assert(r == ((5L, 1L))) // union {1..5}, intersection {3}
  }
}
