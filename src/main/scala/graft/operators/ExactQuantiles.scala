package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact interpolated per-group percentiles by ITERATIVE HISTOGRAM
  * SELECTION — the scale-safe rendering of Spark's `PERCENTILE` /
  * DuckDB's `QUANTILE_CONT` (reference analog: quantileExact*,
  * src/AggregateFunctions/AggregateFunctionQuantile.cpp, which
  * materializes per-group value multisets; this operator replaces the
  * materialization with selection).
  *
  * Why not the built-in aggregate: Spark's `Percentile` is a
  * TypedImperativeAggregate holding a value→count OpenHashMap PER GROUP —
  * at 100 TB a high-cardinality double column (prices, scores) puts
  * billions of distinct keys in one group's merge buffer: an OOM shape.
  * Selection never aggregates more than `buckets` counters per cell and
  * collects only the buckets that CONTAIN a needed order statistic.
  *
  * Algorithm (all groups advance together — one Spark job per refinement
  * level, never one per group):
  *   1. one aggregate → (n, min, max) per group; the needed GLOBAL
  *      0-based ranks per percentile p are floor/ceil of pos = p·(n−1)
  *      (the positions `Percentile.getPercentile` interpolates between).
  *   2. per live cell (group × value subrange; level 1 = the group's full
  *      [min, max]): histogram into `buckets` equal-width cells, each
  *      carrying its count AND its exact (min, max). Membership of a
  *      recursed cell is the PARENT'S bucket-index expression pinned to
  *      the chosen bucket — never a reconstructed float range, so
  *      boundary values can never migrate between the histogram that
  *      located a rank and the pass that fetches it.
  *   3. cumulative counts locate each rank's bucket. Round-18: a located
  *      bucket whose min == max is a MASS POINT and resolves its ranks
  *      immediately — zero rows fetched (on a bounded-domain column like
  *      integer quantities EVERY rank resolves this way and the fetch
  *      job collects nothing). Remaining buckets holding ≤ `cap` rows
  *      collect their values (one job for all of them); heavier buckets
  *      refine recursively from their EXACT (min, max) — the former
  *      per-level "refresh bounds" job is gone — O(log_buckets(n/cap))
  *      levels. A range collapsed to ≤ 3 adjacent doubles splits by
  *      exact value instead of width (underflow-proof), each child a
  *      mass point.
  *   4. result = v_lo + (v_hi − v_lo)·(pos − floor(pos)) in Double — the
  *      exact arithmetic the built-in performs (pinned bit-identical in
  *      ExactQuantilesSpec).
  */
object ExactQuantiles {

  private case class Cell(group: Any, pred: Column, lo: Double, hi: Double,
    rankBase: Long, ranks: Seq[Long])

  /** Per-group interpolated percentiles of `valueCol` (nulls skipped —
    * Percentile semantics) for each p in `ps`. Returns
    * Map(groupValue → values aligned with ps); empty groups absent.
    * Group cardinality must be a sane GROUP BY key count (enforced). */
  def groupPercentiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[Double],
      buckets: Int = 1024,
      cap: Long = 1 << 18,
      maxGroups: Int = 10000): Map[Any, Seq[Double]] = {
    require(ps.forall(p => p >= 0.0 && p <= 1.0), s"percentages $ps")
    val base = df.select(col(groupCol).as("g"),
        col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)

    val stats = base.groupBy("g")
      .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .collect()
    require(stats.length <= maxGroups,
      s"groupPercentiles: ${stats.length} groups exceeds $maxGroups — " +
        "this operator expects a low-cardinality GROUP BY key")

    val posOf = stats.map { r =>
      r.get(0) -> ps.map(p => p * (r.getLong(1) - 1))
    }.toMap
    val resolved = scala.collection.mutable.Map.empty[(Any, Long), Double]

    var pending: Seq[Cell] = stats.map { r =>
      val g = r.get(0)
      val ranks = posOf(g)
        .flatMap(pos => Seq(pos.toLong, math.ceil(pos).toLong))
        .distinct.sorted
      Cell(g, col("g") === lit(g), r.getDouble(2), r.getDouble(3), 0L, ranks)
    }.toSeq

    var level = 0
    while (pending.nonEmpty) {
      level += 1
      require(level <= 64, "groupPercentiles: refinement depth exceeded")

      val cellSeq = pending.zipWithIndex
      def bucketIdx(c: Cell): Column =
        if (c.lo == c.hi) lit(0)
        // a range collapsed to ≤3 adjacent doubles (mass points around a
        // heavy value) cannot be equal-width split — its width underflows
        // — but its members are exactly {lo, mid, hi}: bucket by value;
        // each child is a mass point and resolves from min==max below
        else if (java.lang.Math.nextUp(java.lang.Math.nextUp(c.lo)) >= c.hi)
          when(col("v") === lit(c.lo), lit(0))
            .when(col("v") === lit(c.hi), lit(2))
            .otherwise(lit(1)).cast("int")
        else {
          val width = (c.hi - c.lo) / buckets
          least(floor((col("v") - lit(c.lo)) / lit(width)), lit(buckets - 1))
            .cast("int")
        }
      val cellId = cellSeq.foldLeft(lit(-1)) { case (acc, (c, i)) =>
        when(c.pred, lit(i)).otherwise(acc)
      }
      val bIdx = cellSeq.foldLeft(lit(-1)) { case (acc, (c, i)) =>
        when(c.pred, bucketIdx(c)).otherwise(acc)
      }
      // ONE histogram job for every live cell; per-bucket (min, max)
      // resolves mass points without fetching and gives recursed children
      // their exact bounds
      val hist = base.select(cellId.as("cell"), bIdx.as("b"), col("v"))
        .filter(col("cell") >= 0)
        .groupBy("cell", "b")
        .agg(count(lit(1)).as("c"), min("v").as("blo"), max("v").as("bhi"))
        .collect()
        .groupBy(_.getInt(0))

      // locate each rank's bucket; resolve mass points immediately
      case class Want(cellIdx: Int, bucket: Int, bucketBase: Long,
        localRanks: Seq[Long])
      val wants = scala.collection.mutable.ArrayBuffer.empty[Want]
      val recursed = scala.collection.mutable.ArrayBuffer.empty[Cell]
      cellSeq.foreach { case (c, i) =>
        val hs = hist.getOrElse(i, Array.empty)
        var cum = c.rankBase
        var left = c.ranks
        hs.sortBy(_.getInt(1)).foreach { r =>
          val (b, cnt, blo, bhi) =
            (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
          val end = cum + cnt
          val (inB, rest) = left.span(_ < end)
          if (inB.nonEmpty) {
            if (blo == bhi) inB.foreach(rk => resolved((c.group, rk)) = blo)
            else if (cnt <= cap) wants += Want(i, b, cum, inB)
            else recursed += Cell(c.group, c.pred && bucketIdx(c) === lit(b),
              blo, bhi, cum, inB)
          }
          left = rest
          cum = end
        }
        require(left.isEmpty,
          s"groupPercentiles: rank past histogram mass for ${c.group}")
      }

      if (wants.nonEmpty) {
        // collect ONLY the needed buckets' values, one job
        val keep = cellSeq.foldLeft(lit(false)) { case (acc, (c, i)) =>
          val bs = wants.filter(_.cellIdx == i).map(_.bucket).toSeq
          if (bs.isEmpty) acc
          else acc || (c.pred && bucketIdx(c).isin(bs: _*))
        }
        val got = base.select(cellId.as("cell"), bIdx.as("b"), col("v"))
          .filter(keep)
          .collect()
          .groupBy(r => (r.getInt(0), r.getInt(1)))
        wants.foreach { w =>
          val vs = got.getOrElse((w.cellIdx, w.bucket), Array.empty)
            .map(_.getDouble(2)).sorted
          w.localRanks.foreach { r =>
            val idx = (r - w.bucketBase).toInt
            require(idx >= 0 && idx < vs.length,
              s"groupPercentiles: rank $r outside bucket of ${vs.length}")
            resolved((cellSeq(w.cellIdx)._1.group, r)) = vs(idx)
          }
        }
      }
      pending = recursed.toSeq
    }

    posOf.map { case (g, poss) =>
      g -> poss.map { pos =>
        val lower = math.floor(pos).toLong
        val higher = math.ceil(pos).toLong
        val lo = resolved((g, lower))
        val hi = resolved((g, higher))
        // Percentile.getPercentile's exact arithmetic: early-outs, then
        // the SYMMETRIC weighted form (not lo + (hi−lo)·frac — that
        // differs by an ulp and the pin is bit-identity)
        if (higher == lower || hi == lo) lo
        else (higher - pos) * lo + (pos - lower) * hi
      }
    }
  }
}
