package graft

import graft.sql.ChFunctionRegistry
import org.apache.spark.sql.Row

/** Array-tail registry: reference lambda-first HOF order, structural
  * transforms, set predicates, norms/distances — value-pinned on literals
  * (ANSI mode is on: these also prove no out-of-bounds/division errors on
  * the edge shapes). */
class ChRegistryArraysSpec extends SparkFunSuite {

  private def one(sql: String): Row = {
    ChFunctionRegistry.install(spark)
    spark.sql(sql).head()
  }

  test("lambda-first HOFs: arrayMap / arrayFilter / arrayExists / arrayAll / arrayCount") {
    val r = one("""
      SELECT arrayMap(x -> x * 2, array(1, 2, 3)) AS m,
             arrayMap((x, y) -> x + y, array(1, 2), array(10, 20)) AS m2,
             arrayFilter(x -> x > 1, array(1, 2, 3)) AS f,
             arrayExists(x -> x > 2, array(1, 2, 3)) AS ex,
             arrayExists(array(0, 0)) AS ex0,
             arrayAll(x -> x > 0, array(1, 2)) AS al,
             arrayCount(x -> x % 2 = 0, array(1, 2, 3, 4)) AS c,
             arrayCount(array(0, 1, 2, 0)) AS c0""")
    assert(r.getSeq[Int](0) == Seq(2, 4, 6))
    assert(r.getSeq[Int](1) == Seq(11, 22))
    assert(r.getSeq[Int](2) == Seq(2, 3))
    assert(r.getBoolean(3) && !r.getBoolean(4) && r.getBoolean(5))
    assert(r.getInt(6) == 2 && r.getInt(7) == 2)
  }

  test("arraySum/Avg/Product/Fold keep reference semantics incl. empty arrays") {
    val r = one("""
      SELECT arraySum(array(1, 2, 3)) AS s,
             arraySum(x -> x * x, array(1, 2, 3)) AS sq,
             arraySum(array(1.5D, 2.5D)) AS sd,
             arraySum(slice(array(1), 1, 0)) AS se,
             arrayAvg(array(2, 4)) AS av,
             arrayAvg(slice(array(1), 1, 0)) AS ave,
             arrayProduct(array(2, 3, 4)) AS p,
             arrayFold((acc, x) -> acc + x, array(1, 2, 3), 100) AS fl""")
    assert(r.getInt(0) == 6 && r.getInt(1) == 14)
    assert(r.getDouble(2) == 4.0 && r.getInt(3) == 0)
    assert(r.getDouble(4) == 3.0 && r.getDouble(5) == 0.0)
    assert(r.getDouble(6) == 24.0)
    assert(r.getInt(7) == 106)
  }

  test("first/last/index forms") {
    val r = one("""
      SELECT arrayFirst(x -> x > 1, array(1, 2, 3)) AS f,
             arrayLast(x -> x > 1, array(1, 2, 3)) AS l,
             arrayFirstOrNull(x -> x > 9, array(1, 2)) AS fn,
             arrayFirstIndex(x -> x > 1, array(1, 2, 3)) AS fi,
             arrayLastIndex(x -> x > 1, array(1, 2, 3)) AS li,
             arrayLastIndex(x -> x > 9, array(1, 2, 3)) AS li0""")
    assert(r.getInt(0) == 2 && r.getInt(1) == 3 && r.isNullAt(2))
    assert(r.getLong(3) == 2L && r.getLong(4) == 3L && r.getLong(5) == 0L)
  }

  test("arrayFirst/arrayLast return the element-type default on no match; OrNull stays NULL") {
    val r = one("""
      SELECT arrayFirst(x -> x > 9, array(1, 2)) AS fi,
             arrayLast(x -> x > 9, array(1, 2)) AS li,
             arrayFirst(x -> x = 'q', array('a', 'b')) AS fs,
             arrayFirstOrNull(x -> x > 9, array(1, 2)) AS fn,
             arrayLastOrNull(x -> x > 9, array(1, 2)) AS ln""")
    assert(r.getInt(0) == 0 && r.getInt(1) == 0)
    assert(r.getString(2) == "")
    assert(r.isNullAt(3) && r.isNullAt(4))
  }

  test("structural: cumSum, difference, compact, enumerate, rotate, shift, shingles") {
    val r = one("""
      SELECT arrayCumSum(array(1, 2, 3)) AS cs,
             arrayCumSumNonNegative(array(1, -5, 3)) AS csn,
             arrayDifference(array(1, 4, 9)) AS d,
             arrayCompact(array(1, 1, 2, 2, 1)) AS cp,
             arrayEnumerate(array(9, 9, 9)) AS en,
             arrayEnumerateUniq(array(10, 20, 10, 10)) AS eu,
             arrayEnumerateDense(array(20, 10, 20, 30)) AS ed,
             arrayRotateLeft(array(1, 2, 3, 4), 1) AS rl,
             arrayRotateRight(array(1, 2, 3, 4), 1) AS rr,
             arrayShiftLeft(array(1, 2, 3), 1, 0) AS sl,
             arrayShiftRight(array(1, 2, 3), 1, 0) AS sr,
             arrayShingles(array(1, 2, 3, 4), 3) AS sh,
             arrayWithConstant(3, 7) AS wc""")
    assert(r.getSeq[Int](0) == Seq(1, 3, 6))
    assert(r.getSeq[Int](1) == Seq(1, 0, 3))
    assert(r.getSeq[Int](2) == Seq(0, 3, 5))
    assert(r.getSeq[Int](3) == Seq(1, 2, 1))
    assert(r.getSeq[Int](4) == Seq(1, 2, 3))
    assert(r.getSeq[Int](5) == Seq(1, 1, 2, 3))
    assert(r.getSeq[Int](6) == Seq(1, 2, 1, 3))
    assert(r.getSeq[Int](7) == Seq(2, 3, 4, 1))
    assert(r.getSeq[Int](8) == Seq(4, 1, 2, 3))
    assert(r.getSeq[Int](9) == Seq(2, 3, 0))
    assert(r.getSeq[Int](10) == Seq(0, 1, 2))
    assert(r.getSeq[Seq[Int]](11) == Seq(Seq(1, 2, 3), Seq(2, 3, 4)))
    assert(r.getSeq[Int](12) == Seq(7, 7, 7))
  }

  test("fill and split families") {
    val r = one("""
      SELECT arrayFill(x -> x != 0, array(1, 0, 0, 5, 0)) AS ff,
             arrayReverseFill(x -> x != 0, array(0, 0, 3, 0, 7)) AS rf,
             arraySplit(x -> x % 10 = 1, array(1, 2, 3, 11, 12, 21)) AS sp,
             arrayReverseSplit(x -> x % 10 = 1, array(1, 2, 3, 11, 12)) AS rs""")
    assert(r.getSeq[Int](0) == Seq(1, 1, 1, 5, 5))
    assert(r.getSeq[Int](1) == Seq(3, 3, 3, 7, 7))
    assert(r.getSeq[Seq[Int]](2) == Seq(Seq(1, 2, 3), Seq(11, 12), Seq(21)))
    // reverse split: groups end AFTER flagged elements
    assert(r.getSeq[Seq[Int]](3) == Seq(Seq(1), Seq(2, 3, 11), Seq(12)))
  }

  test("set predicates and algebra") {
    val r = one("""
      SELECT hasAll(array(1, 2, 3), array(2, 3)) AS ha,
             hasAll(array(1, 2), array(3)) AS ha0,
             hasAny(array(1, 2), array(2, 9)) AS hy,
             hasSubstr(array(1, 2, 3, 4), array(2, 3)) AS hs,
             hasSubstr(array(1, 2, 3, 4), array(2, 4)) AS hs0,
             countEqual(array(1, 2, 1, 1), 1) AS ce,
             arrayUnion(array(1, 2), array(2, 3)) AS un,
             arraySymmetricDifference(array(1, 2, 3), array(2, 3, 4)) AS sd,
             round(arrayJaccardIndex(array(1, 2), array(2, 3)), 6) AS ji""")
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2))
    assert(r.getBoolean(3) && !r.getBoolean(4))
    assert(r.getInt(5) == 3)
    assert(r.getSeq[Int](6).sorted == Seq(1, 2, 3))
    assert(r.getSeq[Int](7).sorted == Seq(1, 4))
    assert(math.abs(r.getDouble(8) - 1.0 / 3.0) < 1e-6)
  }

  test("norms and distances") {
    val r = one("""
      SELECT l1norm(array(1.0D, -2.0D)) AS n1,
             l2norm(array(3.0D, 4.0D)) AS n2,
             l2squarednorm(array(3.0D, 4.0D)) AS n2s,
             linfnorm(array(1.0D, -5.0D)) AS ni,
             round(lpnorm(array(3.0D, 4.0D), 2.0), 9) AS np,
             l1distance(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS d1,
             l2distance(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS d2,
             linfdistance(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS di,
             dotProduct(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
             round(cosineDistance(array(1.0D, 0.0D), array(0.0D, 1.0D)), 9) AS cd,
             normalizeL2(array(3.0D, 4.0D)) AS nl""")
    assert(r.getDouble(0) == 3.0 && r.getDouble(1) == 5.0 && r.getDouble(2) == 25.0)
    assert(r.getDouble(3) == 5.0 && r.getDouble(4) == 5.0)
    assert(r.getDouble(5) == 7.0 && r.getDouble(6) == 5.0 && r.getDouble(7) == 4.0)
    assert(r.getDouble(8) == 11.0 && r.getDouble(9) == 1.0)
    assert(r.getSeq[Double](10) == Seq(0.6, 0.8))
  }

  test("arrayMin/arrayMax accept the lambda-first form") {
    val r = one("""
      SELECT arrayMin(x -> x * -1, array(1, 2, 3)) AS mn,
             arrayMax(x -> x % 3, array(4, 5, 6)) AS mx""")
    assert(r.getInt(0) == -3 && r.getInt(1) == 2)
  }

  test("int-typed arrays from real data survive the generic trees") {
    Tables.register(spark, sf)
    ChFunctionRegistry.install(spark)
    val r = spark.sql("""
      SELECT arraySum(ks) AS s, arrayCumSum(ks) AS cs, arrayCompact(ks) AS cp
      FROM (SELECT slice(collect_list(o_orderkey), 1, 5) AS ks FROM orders)""").head()
    assert(r.getLong(0) > 0 && r.getSeq[Long](1).nonEmpty && r.getSeq[Long](2).nonEmpty)
  }
}
