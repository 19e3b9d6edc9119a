package graft

import java.math.BigInteger

import graft.sql.ChFunctionRegistry

/** Wide-integer lane invariants DuckDB cannot oracle (HUGEINT stops at
  * 2^127-1): true 128-bit wraparound, the UInt128/UInt256 lanes, and
  * genuine 256-bit magnitudes — all pinned against BigInteger reference
  * arithmetic computed HERE, not restated literals.
  *
  * The oracle-able regime (|x| < 2^127) is covered by the driver gate
  * (q_fn_wide_int128/256/_rows vs DuckDB HUGEINT). */
class WideIntSpec extends SparkFunSuite {

  private def one(sql: String): String = {
    ChFunctionRegistry.install(spark)
    val v = spark.sql(s"SELECT $sql AS v").head.get(0)
    if (v == null) null else v.toString
  }

  private val two127 = BigInteger.ONE.shiftLeft(127)
  private val two128 = BigInteger.ONE.shiftLeft(128)
  private val two255 = BigInteger.ONE.shiftLeft(255)
  private val two256 = BigInteger.ONE.shiftLeft(256)

  test("toInt128 wraps at 2^127 like C++ static_cast (two's complement)") {
    // 2^127 wraps to -2^127; 2^127+41 wraps to -2^127+41
    assert(one(s"toInt128('${two127}')") == two127.negate.toString)
    assert(one(s"toInt128('${two127.add(BigInteger.valueOf(41))}')") ==
      two127.negate.add(BigInteger.valueOf(41)).toString)
    // Int128 max is preserved exactly
    val max = two127.subtract(BigInteger.ONE)
    assert(one(s"toInt128('$max')") == max.toString)
    // plus-then-wrap: (2^127-1) + 1 wraps to -2^127
    assert(one(s"toInt128(plus('$max', '1'))") == two127.negate.toString)
  }

  test("toUInt128 wraps negatives into [0, 2^128)") {
    assert(one("toUInt128('-1')") == two128.subtract(BigInteger.ONE).toString)
    assert(one(s"toUInt128('${two128.add(BigInteger.valueOf(7))}')") == "7")
  }

  test("Int256/UInt256 carry genuine >2^128 magnitudes exactly") {
    // (2^127)^2 = 2^254: representable in Int256, derived by the engine
    val sq = one(s"multiply('${two127}', '${two127}')")
    assert(sq == two127.multiply(two127).toString)
    assert(one(s"toInt256('$sq')") == sq) // in-range: identity
    // 2^255 wraps to -2^255 in the signed 256 lane
    assert(one(s"toInt256('${two255}')") == two255.negate.toString)
    // UInt256: -1 wraps to 2^256-1
    assert(one("toUInt256('-1')") == two256.subtract(BigInteger.ONE).toString)
  }

  test("OrNull twins range-check instead of wrapping") {
    assert(one(s"toInt128OrNull('${two127}')") == null)
    assert(one(s"toInt128OrNull('${two127.subtract(BigInteger.ONE)}')") ==
      two127.subtract(BigInteger.ONE).toString)
    assert(one("toUInt128OrNull('-1')") == null)
    assert(one(s"toInt256OrNull('${two255}')") == null)
    assert(one("toInt128OrNull('garbage')") == null)
    assert(one("toUInt256OrZero('garbage')") == "0")
  }

  test("named arithmetic dispatches: numeric stays numeric, strings go wide") {
    // numeric children → native Catalyst tree (INT result, not string)
    val num = spark.sql("SELECT plus(1, 2) AS v").schema.head.dataType
    assert(num == org.apache.spark.sql.types.IntegerType)
    // string children → exact wide kernel (STRING result)
    val wide = spark.sql("SELECT plus('1', '2') AS v").schema.head.dataType
    assert(wide == org.apache.spark.sql.types.StringType)
    // precision beyond double: 2^64+1 times 3, exact
    val n = two128.sqrt // 2^64
    val v = n.add(BigInteger.ONE).multiply(BigInteger.valueOf(3))
    assert(one(s"multiply('${n.add(BigInteger.ONE)}', '3')") == v.toString)
  }

  test("named comparisons are numeric at any width, lexicographic for non-numbers") {
    assert(one(s"less('9', '12')") == "true")   // numeric, not lexicographic
    assert(one(s"less('${two255}', '${two256}')") == "true")
    assert(one("less('apple', 'banana')") == "true") // collation fallback
    assert(one(s"equals('${two255}', '${two255.toString}')") == "true")
    // intDiv truncates toward zero at width; modulo keeps dividend sign
    assert(one("intDiv('-7', '2')") == "-3")
    assert(one("modulo('-7', '2')") == "-1")
  }

  test("wide aggregation: exact sums past 2^200, numeric extremes, null/empty semantics") {
    ChFunctionRegistry.install(spark)
    val sp = spark
    import sp.implicits._
    // three addends of ~2^254 — any double or DECIMAL(38) path would
    // corrupt them; the exact sum is 3 * 2^254
    val big = two255.shiftRight(1) // 2^254
    Seq(big.toString, big.toString, big.toString, null)
      .toDF("v").createOrReplaceTempView("wide_agg_t")
    val r = spark.sql("""
      SELECT sumWide(v) AS s, minWide(v) AS mn, maxWide(v) AS mx,
             avgWide(v) AS av FROM wide_agg_t""").head
    assert(r.getString(0) == big.multiply(BigInteger.valueOf(3)).toString)
    assert(r.getString(1) == big.toString && r.getString(2) == big.toString)
    assert(math.abs(r.getDouble(3) - big.doubleValue()) / big.doubleValue() < 1e-12)
    // numeric (not lexicographic) extreme order, group-by path, empty sum
    Seq(("a", "9"), ("a", "12"), ("a", "-100"), ("b", null))
      .toDF("g", "v").createOrReplaceTempView("wide_agg_g")
    val rows = spark.sql("""
      SELECT g, sumWide(v) AS s, minWide(v) AS mn, maxWide(v) AS mx
      FROM wide_agg_g GROUP BY g ORDER BY g""").collect()
    assert(rows(0).getString(1) == "-79")
    assert(rows(0).getString(2) == "-100" && rows(0).getString(3) == "12")
    assert(rows(1).getString(1) == "0") // all-null group sums to 0
    assert(rows(1).isNullAt(2) && rows(1).isNullAt(3)) // min/max NULL
  }
}
