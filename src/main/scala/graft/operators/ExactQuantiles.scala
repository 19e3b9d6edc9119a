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
  *   1. one aggregate → n per group; the needed GLOBAL 0-based ranks per
  *      percentile p are floor/ceil of pos = p·(n−1) (the positions
  *      `Percentile.getPercentile` interpolates between).
  *   2. per live cell (group × value subrange; level 1 = the group's full
  *      [min, max]): histogram into `buckets` equal-width cells.
  *      Membership of a recursed cell is the PARENT'S bucket-index
  *      expression pinned to the chosen bucket — never a reconstructed
  *      float range, so boundary values can never migrate between the
  *      histogram that located a rank and the pass that fetches it.
  *   3. cumulative counts locate each rank's bucket. Buckets holding ≤
  *      `cap` rows collect their values (needed-ranks × n/buckets rows);
  *      heavier buckets (mass points / adversarial distributions) refine
  *      recursively, O(log_buckets(n/cap)) levels; a range collapsed to
  *      ≤ a few distinct doubles resolves via a value-exact histogram
  *      (≤ 3 rows) instead.
  *   4. result = v_lo + (v_hi − v_lo)·(pos − floor(pos)) in Double — the
  *      exact arithmetic the built-in performs (pinned bit-identical in
  *      ExactQuantilesSpec).
  */
object ExactQuantiles {

  private case class Cell(group: Any, pred: Column, lo: Double, hi: Double,
    rankBase: Long, ranks: Seq[Long], needsBounds: Boolean = false)

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

      // refresh recursed cells' bounds to their ACTUAL value range (one
      // job for all of them): a mass-point bucket then collapses to
      // lo == hi at this level instead of shrinking its arithmetic range
      // one bucket-width per level
      if (pending.exists(_.needsBounds)) {
        val (need, keep) = pending.partition(_.needsBounds)
        val idOf = need.zipWithIndex
        val cid = idOf.foldLeft(lit(-1)) { case (acc, (c, i)) =>
          when(c.pred, lit(i)).otherwise(acc)
        }
        val bs = base.select(cid.as("cell"), col("v"))
          .filter(col("cell") >= 0)
          .groupBy("cell").agg(min("v").as("lo"), max("v").as("hi"))
          .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
          .toMap
        pending = keep ++ idOf.map { case (c, i) =>
          val (lo, hi) = bs(i)
          c.copy(lo = lo, hi = hi, needsBounds = false)
        }
      }

      // a range collapsed to a couple of distinct doubles (mass point):
      // the value-exact histogram is ≤ 3 rows however many rows share it
      val (tiny, live) = pending.partition { c =>
        c.lo == c.hi || nextUp(nextUp(c.lo)) >= c.hi
      }
      tiny.foreach { c =>
        val vh = base.filter(c.pred).groupBy("v").agg(count(lit(1)).as("c"))
          .collect().map(r => r.getDouble(0) -> r.getLong(1)).sortBy(_._1)
        var cum = c.rankBase
        var left = c.ranks
        vh.foreach { case (v, cnt) =>
          val end = cum + cnt
          val (inV, rest) = left.span(_ < end)
          inV.foreach(r => resolved((c.group, r)) = v)
          left = rest
          cum = end
        }
        require(left.isEmpty,
          s"groupPercentiles: rank past value mass for group ${c.group}")
      }

      if (live.isEmpty) { pending = Nil }
      else {
        val cellSeq = live.zipWithIndex
        def bucketIdx(c: Cell): Column = {
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
        // ONE histogram job for every live cell
        val hist = base.select(cellId.as("cell"), bIdx.as("b"))
          .filter(col("cell") >= 0)
          .groupBy("cell", "b").agg(count(lit(1)).as("c"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (cid, rows) =>
            cid -> rows.map(r => r.getInt(1) -> r.getLong(2)).sortBy(_._1).toSeq
          }

        // locate each rank's bucket
        case class Want(cellIdx: Int, bucket: Int, bucketBase: Long,
          count: Long, localRanks: Seq[Long])
        val wants = scala.collection.mutable.ArrayBuffer.empty[Want]
        cellSeq.foreach { case (c, i) =>
          val hs = hist.getOrElse(i, Seq.empty[(Int, Long)])
          var cum = c.rankBase
          var left = c.ranks
          hs.foreach { case (b, cnt) =>
            val end = cum + cnt
            val (inB, rest) = left.span(_ < end)
            if (inB.nonEmpty) wants += Want(i, b, cum, cnt, inB)
            left = rest
            cum = end
          }
          require(left.isEmpty,
            s"groupPercentiles: rank past histogram mass for ${c.group}")
        }

        val (small, big) = wants.partition(_.count <= cap)
        if (small.nonEmpty) {
          // collect ONLY the needed buckets' values, one job
          val keep = cellSeq.foldLeft(lit(false)) { case (acc, (c, i)) =>
            val bs = small.filter(_.cellIdx == i).map(_.bucket).toSeq
            if (bs.isEmpty) acc
            else acc || (c.pred && bucketIdx(c).isin(bs: _*))
          }
          val got = base.select(cellId.as("cell"), bIdx.as("b"), col("v"))
            .filter(keep)
            .collect()
            .groupBy(r => (r.getInt(0), r.getInt(1)))
          small.foreach { w =>
            val vs = got.getOrElse((w.cellIdx, w.bucket), Array.empty)
              .map(_.getDouble(2)).sorted
            w.localRanks.foreach { r =>
              val idx = (r - w.bucketBase).toInt
              require(idx >= 0 && idx < vs.length,
                s"groupPercentiles: rank $r outside bucket of ${vs.length}")
              resolved((live(w.cellIdx).group, r)) = vs(idx)
            }
          }
        }
        // heavy buckets refine: membership = parent bucket-index equality
        // (the shared expression); actual bounds refresh next level
        pending = big.map { w =>
          val c = live(w.cellIdx)
          Cell(c.group, c.pred && bucketIdx(c) === lit(w.bucket),
            c.lo, c.hi, w.bucketBase, w.localRanks, needsBounds = true)
        }.toSeq
      }
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

  private def nextUp(d: Double): Double = java.lang.Math.nextUp(d)
}
