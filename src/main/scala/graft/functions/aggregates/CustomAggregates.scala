package graft.functions.aggregates

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregates re-expressing the reference's aggregate-function
  * families that Spark lacks as built-ins. Each follows the
  * add/merge/finalize contract of the reference's `IAggregateFunction`
  * (reference: src/AggregateFunctions/IAggregateFunction.h:55) — which is
  * exactly Spark's `Aggregator[IN, BUF, OUT]`: `reduce` = add, `merge` =
  * merge (must be associative+commutative for shuffle-order independence),
  * `finish` = insertResultInto.
  *
  * Scale note: Spark runs these as partial aggregates before the shuffle and
  * merges per-key afterwards, so buffer size — not input size — bounds
  * executor memory, same as the reference's two-level hash aggregation.
  */
object CustomAggregates {

  private def kryo[T]: Encoder[T] =
    Encoders.kryo(scala.reflect.ClassTag.Any).asInstanceOf[Encoder[T]]

  /** topK(k): exact most-frequent-k values with deterministic tie-break
    * (count desc, then value asc). Reference: SpaceSaving-based
    * AggregateFunctionTopK (src/AggregateFunctions/AggregateFunctionTopK.cpp:20).
    * Uncapped (cap=0) this keeps the full frequency map → exact results
    * (oracle-able); memory is O(distinct values) per group, fine for the
    * categorical columns it targets. With a cap, overflow follows the TRUE
    * SpaceSaving rule: the min-count entry is evicted and the newcomer is
    * credited with minCount + 1 (its count error is bounded by minCount) —
    * NOT plain truncation, which has no frequency guarantee. */
  final class TopKExact(k: Int, spaceSavingCap: Int = 0)
      extends Aggregator[String, Map[String, Long], Seq[String]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      if (a == null) b
      else b.get(a) match {
        case Some(c) => b.updated(a, c + 1L)
        case None if spaceSavingCap > 0 && b.size >= spaceSavingCap =>
          // SpaceSaving eviction: replace the min-count entry (ties broken
          // by value for determinism), newcomer absorbs its count.
          val (minV, minC) = b.minBy { case (v, c) => (c, v) }
          (b - minV).updated(a, minC + 1L)
        case None => b.updated(a, 1L)
      }
    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      // exact merge of the two summaries, then SpaceSaving-style shrink:
      // keep the top `cap` by (count desc, value asc). Counts of survivors
      // are preserved (standard parallel-SpaceSaving merge).
      val m = y.foldLeft(x) { case (acc, (v, c)) => acc.updated(v, acc.getOrElse(v, 0L) + c) }
      if (spaceSavingCap > 0 && m.size > spaceSavingCap)
        m.toSeq.sortBy { case (v, c) => (-c, v) }.take(spaceSavingCap).toMap
      else m
    }
    override def finish(m: Map[String, Long]): Seq[String] =
      m.toSeq.sortBy { case (v, c) => (-c, v) }.take(k).map(_._1)
    override def bufferEncoder: Encoder[Map[String, Long]] = kryo
    override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
  }

  /** uniqUpTo(n): exact distinct count capped at n+1 — "more than n" is
    * reported as n+1 and the state never holds more than n+1 values.
    * Reference: AggregateFunctionUniqUpTo (src/AggregateFunctions/AggregateFunctionUniq.h
    * uniqUpTo registration). SQL-equivalent: LEAST(COUNT(DISTINCT x), n+1). */
  final class UniqUpTo(n: Int) extends Aggregator[String, Set[String], Long] {
    override def zero: Set[String] = Set.empty
    override def reduce(b: Set[String], a: String): Set[String] =
      if (a == null || b.size > n) b else b + a
    override def merge(x: Set[String], y: Set[String]): Set[String] = {
      val u = x ++ y
      if (u.size > n + 1) u.toSeq.sorted.take(n + 1).toSet else u
    }
    override def finish(b: Set[String]): Long = math.min(b.size.toLong, n + 1L)
    override def bufferEncoder: Encoder[Set[String]] = kryo
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** sumMap: per-key sums over (key, value) pairs, emitted as key-sorted
    * entries. Reference: AggregateFunctionSumMap
    * (src/AggregateFunctions/AggregateFunctionSumMap.cpp). Values are
    * accumulated as fixed-point (1e-4) longs so the result is exact and
    * independent of Spark's merge order — the same reason the relational
    * battery sums through DECIMAL. */
  final class SumMapAgg
      extends Aggregator[(String, Double), Map[String, Long], Seq[(String, Double)]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], a: (String, Double)): Map[String, Long] =
      if (a._1 == null) b // filtered/absent keys contribute nothing
      else {
        val cents = math.round(a._2 * 10000.0)
        b.updated(a._1, b.getOrElse(a._1, 0L) + cents)
      }
    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] =
      y.foldLeft(x) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    override def finish(b: Map[String, Long]): Seq[(String, Double)] =
      b.toSeq.sortBy(_._1).map { case (k, v) => (k, v / 10000.0) }
    override def bufferEncoder: Encoder[Map[String, Long]] = kryo
    override def outputEncoder: Encoder[Seq[(String, Double)]] = ExpressionEncoder()
  }

  /** windowFunnel(windowMicros, steps): max funnel depth reached scanning
    * greedily from the earliest step-1 event: t1 = min ts(step1); t(i) =
    * min ts(step i) with t(i) > t(i-1) and t(i) <= t1 + window.
    * Reference semantics family: AggregateFunctionWindowFunnel
    * (src/AggregateFunctions/AggregateFunctionWindowFunnel.cpp); the
    * greedy-from-earliest rule here is this engine's deterministic spec,
    * SQL-expressible for the oracle. Input rows are (tsMicros, stepIndex or
    * -1); the buffer keeps only per-step candidate timestamp lists, sorted
    * lazily at finish. */
  final class WindowFunnel(windowMicros: Long, nSteps: Int)
      extends Aggregator[(Long, Int), Array[List[Long]], Int] {
    override def zero: Array[List[Long]] = Array.fill(nSteps)(Nil)
    override def reduce(b: Array[List[Long]], a: (Long, Int)): Array[List[Long]] = {
      if (a._2 >= 0 && a._2 < nSteps) b(a._2) ::= a._1
      b
    }
    override def merge(x: Array[List[Long]], y: Array[List[Long]]): Array[List[Long]] = {
      var i = 0
      while (i < nSteps) { x(i) :::= y(i); i += 1 }
      x
    }
    override def finish(b: Array[List[Long]]): Int = {
      if (b(0).isEmpty) return 0
      val t1 = b(0).min
      val deadline = t1 + windowMicros
      var prev = t1
      var level = 1
      var i = 1
      while (i < nSteps) {
        val nexts = b(i).filter(t => t > prev && t <= deadline)
        if (nexts.isEmpty) return level
        prev = nexts.min
        level += 1
        i += 1
      }
      level
    }
    override def bufferEncoder: Encoder[Array[List[Long]]] = kryo
    override def outputEncoder: Encoder[Int] = Encoders.scalaInt
  }

  /** topKWeighted(k): most-frequent-k with per-row weights — the
    * reference's AggregateFunctionTopK weighted lane (approx_top_sum
    * alias): each row credits its key with `weight` instead of 1. */
  final class TopKWeighted(k: Int)
      extends Aggregator[(String, Long), Map[String, Long], Seq[String]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long],
        a: (String, Long)): Map[String, Long] =
      if (a._1 == null) b
      else b.updated(a._1, b.getOrElse(a._1, 0L) + a._2)
    override def merge(x: Map[String, Long],
        y: Map[String, Long]): Map[String, Long] =
      y.foldLeft(x) { case (m, (k2, v)) =>
        m.updated(k2, m.getOrElse(k2, 0L) + v) }
    override def finish(m: Map[String, Long]): Seq[String] =
      m.toSeq.sortBy { case (v, c) => (-c, v) }.take(k).map(_._1)
    override def bufferEncoder: Encoder[Map[String, Long]] = kryo
    override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
  }

  /** minMap / maxMap (AggregateFunctionSumMap.cpp Min/Max variants):
    * per-key min or max over (key, value) pairs, key-sorted output.
    * Shares SumMapAgg's fixed-point carrier for order independence. */
  final class MinMaxMapAgg(isMin: Boolean)
      extends Aggregator[(String, Double), Map[String, Long], Seq[(String, Double)]] {
    private def pick(a: Long, b: Long): Long =
      if (isMin) math.min(a, b) else math.max(a, b)
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long],
        a: (String, Double)): Map[String, Long] =
      if (a._1 == null) b
      else {
        val cents = math.round(a._2 * 10000.0)
        b.updated(a._1,
          b.get(a._1).map(pick(_, cents)).getOrElse(cents))
      }
    override def merge(x: Map[String, Long],
        y: Map[String, Long]): Map[String, Long] =
      y.foldLeft(x) { case (m, (k, v)) =>
        m.updated(k, m.get(k).map(pick(_, v)).getOrElse(v)) }
    override def finish(b: Map[String, Long]): Seq[(String, Double)] =
      b.toSeq.sortBy(_._1).map { case (k, v) => (k, v / 10000.0) }
    override def bufferEncoder: Encoder[Map[String, Long]] = kryo
    override def outputEncoder: Encoder[Seq[(String, Double)]] =
      ExpressionEncoder()
  }

  // ---- Column-API entry points (usable in DataFrame aggs) ----

  private val pairEnc: Encoder[(String, Double)] = ExpressionEncoder()
  private val wpairEnc: Encoder[(String, Long)] = ExpressionEncoder()
  private val funnelEnc: Encoder[(Long, Int)] = ExpressionEncoder()

  def topK(k: Int)(col: Column): Column =
    udaf(new TopKExact(k), Encoders.STRING).apply(col)

  /** SpaceSaving-capped approximate variant for unbounded key domains. */
  def topKApprox(k: Int, cap: Int = 8192)(col: Column): Column =
    udaf(new TopKExact(k, cap), Encoders.STRING).apply(col)

  def uniqUpTo(n: Int)(col: Column): Column =
    udaf(new UniqUpTo(n), Encoders.STRING).apply(col)

  def sumMap(key: Column, value: Column): Column =
    udaf(new SumMapAgg, pairEnc).apply(key, value)

  def windowFunnel(windowMicros: Long, nSteps: Int)(tsMicros: Column, step: Column): Column =
    udaf(new WindowFunnel(windowMicros, nSteps), funnelEnc).apply(tsMicros, step)

  def topKWeighted(k: Int)(col: Column, weight: Column): Column =
    udaf(new TopKWeighted(k), wpairEnc).apply(col, weight)

  def minMap(key: Column, value: Column): Column =
    udaf(new MinMaxMapAgg(isMin = true), pairEnc).apply(key, value)

  def maxMap(key: Column, value: Column): Column =
    udaf(new MinMaxMapAgg(isMin = false), pairEnc).apply(key, value)
}
