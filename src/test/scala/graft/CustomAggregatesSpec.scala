package graft

import graft.functions.aggregates.CustomAggregates
import scala.util.Random

class CustomAggregatesSpec extends SparkFunSuite {

  // Merge-law tests mirror the reference's IAggregateFunction::merge
  // contract (src/AggregateFunctions/IAggregateFunction.h:55): splitting the
  // input across partial states and merging must equal single-state
  // accumulation, else shuffle order changes results.

  private val rnd = new Random(42)

  test("TopKExact: split-merge equals sequential, ties break (count desc, value asc)") {
    val agg = new CustomAggregates.TopKExact(3)
    for (_ <- 1 to 200) {
      val xs = List.fill(rnd.nextInt(40))(("a" + rnd.nextInt(5)))
      val whole = xs.foldLeft(agg.zero)(agg.reduce)
      val (l, r) = xs.splitAt(rnd.nextInt(xs.length + 1))
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(whole) == agg.finish(merged))
    }
    val b = List("x", "y", "y", "z", "z").foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b) == Seq("y", "z", "x"))
  }

  test("UniqUpTo caps at n+1 and is merge-stable") {
    val agg = new CustomAggregates.UniqUpTo(3)
    val small = List("a", "b").foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(small) == 2L)
    val big = (1 to 50).map(_.toString).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(big) == 4L) // n+1 = "more than 3"
    for (_ <- 1 to 200) {
      val xs = List.fill(rnd.nextInt(40))((rnd.nextInt(30) + 1).toString)
      val whole = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      val (l, r) = xs.splitAt(xs.length / 2)
      val merged = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      assert(whole == merged)
    }
  }

  test("SumMap sums per key exactly (fixed-point), sorted output") {
    val agg = new CustomAggregates.SumMapAgg
    val b = List(("b", 1.5), ("a", 0.1), ("b", 2.25), ("a", 0.2))
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b) == Seq(("a", 0.3), ("b", 3.75)))
  }

  test("WindowFunnel greedy-from-earliest levels") {
    def funnel(events: List[(Long, Int)], window: Long = 100L): Int = {
      val agg = new CustomAggregates.WindowFunnel(window, 3)
      agg.finish(events.foldLeft(agg.zero)(agg.reduce))
    }
    assert(funnel(Nil) == 0)
    assert(funnel(List((10L, 0))) == 1)
    assert(funnel(List((10L, 0), (20L, 1), (30L, 2))) == 3)
    // step2 before step1 doesn't count
    assert(funnel(List((20L, 1), (30L, 0))) == 1)
    // outside window
    assert(funnel(List((10L, 0), (200L, 1))) == 1)
    // greedy from earliest step-1: t1=10 (not 50), click at 60 counts
    assert(funnel(List((10L, 0), (50L, 0), (60L, 1))) == 2)
    // merge across partial states
    val agg = new CustomAggregates.WindowFunnel(100L, 3)
    val l = List((10L, 0)).foldLeft(agg.zero)(agg.reduce)
    val r = List((20L, 1), (30L, 2)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(l, r)) == 3)
  }
}
