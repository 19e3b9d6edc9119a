package graft

import graft.sql.ChFunctionRegistry

import scala.util.Random

/** Property-style tests: the registry's structural array trees vs direct
  * Scala models over seeded random small int arrays (the per-row shapes
  * these functions serve). Deterministic (fixed seed), 40 cases per
  * property, one Spark evaluation per case batch via a UNION of literals. */
class ChRegistryPropertySpec extends SparkFunSuite {

  private val rnd = new Random(42)

  private def cases(n: Int, minLen: Int = 0): Seq[List[Int]] =
    Seq.fill(n)(List.fill(minLen + rnd.nextInt(7 - minLen))(rnd.nextInt(15) - 5))

  private def evalArr(call: String): Seq[Int] = {
    ChFunctionRegistry.install(spark)
    spark.sql(s"SELECT $call AS r").head().getSeq[Int](0)
  }

  private def lit(xs: Seq[Int]): String =
    if (xs.isEmpty) "slice(array(0), 1, 0)" else s"array(${xs.mkString(", ")})"

  test("arrayRotateLeft matches the Scala rotation model") {
    for (xs <- cases(40, minLen = 1)) {
      val n = rnd.nextInt(21) - 10
      val m = ((n % xs.length) + xs.length) % xs.length
      assert(evalArr(s"arrayRotateLeft(${lit(xs)}, $n)") ==
        xs.drop(m) ++ xs.take(m), s"xs=$xs n=$n")
    }
  }

  test("arrayShiftLeft with explicit pad matches drop-and-pad") {
    for (xs <- cases(40, minLen = 1)) {
      val n = rnd.nextInt(9)
      val m = math.min(n, xs.length)
      assert(evalArr(s"arrayShiftLeft(${lit(xs)}, $n, 0)") ==
        xs.drop(m) ++ Seq.fill(m)(0), s"xs=$xs n=$n")
    }
  }

  test("arrayCumSum matches scanLeft") {
    for (xs <- cases(40))
      assert(evalArr(s"arrayCumSum(${lit(xs)})") ==
        xs.scanLeft(0)(_ + _).tail, s"xs=$xs")
  }

  test("arrayCompact matches dedup-consecutive") {
    for (xs <- cases(40)) {
      val model = xs.foldLeft(List.empty[Int])((acc, x) =>
        if (acc.nonEmpty && acc.head == x) acc else x :: acc).reverse
      assert(evalArr(s"arrayCompact(${lit(xs)})") == model, s"xs=$xs")
    }
  }

  test("arrayDifference matches adjacent deltas") {
    for (xs <- cases(40, minLen = 1)) {
      val model = 0 +: xs.sliding(2).collect { case Seq(a, b) => b - a }.toSeq
      assert(evalArr(s"arrayDifference(${lit(xs)})") == model, s"xs=$xs")
    }
  }

  test("arraySum and arrayAvg match the fold") {
    ChFunctionRegistry.install(spark)
    for (xs <- cases(40)) {
      val r = spark.sql(
        s"SELECT CAST(arraySum(${lit(xs)}) AS INT) AS s, arrayAvg(${lit(xs)}) AS a").head()
      assert(r.getInt(0) == xs.sum, s"xs=$xs")
      if (xs.nonEmpty)
        assert(math.abs(r.getDouble(1) - xs.sum.toDouble / xs.length) < 1e-9, s"xs=$xs")
    }
  }

  test("hasSubstr matches containsSlice") {
    for (xs <- cases(30); ys <- Seq(xs.take(2), List(99), Nil)) {
      val got = {
        ChFunctionRegistry.install(spark)
        spark.sql(s"SELECT hasSubstr(${lit(xs)}, ${lit(ys)}) AS r").head().getBoolean(0)
      }
      assert(got == xs.containsSlice(ys), s"xs=$xs ys=$ys")
    }
  }

  test("arrayAUCPR matches the right-Riemann Scala model on random labelings") {
    // model (arrayAUC.cpp:118-124,445): walk score-DESC pairs, each
    // positive adds precision-at-that-point; area / total positives;
    // ZERO positives → undefined (reference NaN, our NULL carrier) —
    // all-positives is well-defined (1.0). Distinct scores by
    // construction (index-derived).
    def model(scores: Seq[Double], labels: Seq[Int]): Option[Double] = {
      val desc = scores.zip(labels).sortBy(-_._1).map(_._2)
      var tp = 0.0; var fp = 0.0; var area = 0.0
      desc.foreach { l =>
        if (l > 0) { tp += 1; area += tp / (tp + fp) } else fp += 1
      }
      if (tp == 0) None else Some(area / tp)
    }
    ChFunctionRegistry.install(spark)
    for (i <- 1 to 30) {
      val n = 2 + rnd.nextInt(8)
      val scores = Seq.fill(n)(rnd.nextInt(1000)).zipWithIndex
        .map { case (s, j) => s + j * 0.001 } // distinct by construction
      val labels = Seq.fill(n)(rnd.nextInt(2))
      val call = s"arrayAUCPR(array(${scores.mkString(", ")}), " +
        s"array(${labels.mkString(", ")}))"
      val got = Option(spark.sql(s"SELECT $call AS r").head().get(0))
        .map(_.asInstanceOf[Double])
      val want = model(scores, labels)
      (got, want) match {
        case (None, None) =>
        case (Some(g), Some(w)) =>
          assert(math.abs(g - w) < 1e-9, s"case $i: got $g want $w")
        case other => fail(s"case $i: null mismatch $other")
      }
    }
  }
}
