package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.ExprColumn
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair encoding — the REAL merge-learning tokenizer (Sennrich,
  * Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
  * Subword Units" — the published algorithm; no reference-engine code
  * involved: ClickHouse has no BPE, this is part of the training-data
  * pipeline mandate).
  *
  * Scale shape (the part that matters at 100 TB):
  *  - the CORPUS pass is one distributed word-frequency aggregation
  *    (pretokenize → explode → groupBy(word).count) — the only shuffle;
  *  - merge learning runs over the WORD-FREQUENCY TABLE, not the
  *    corpus: the distinct-word table is capped at `maxWords` rows
  *    (frequency top-K — covers the probability mass), so driver state
  *    is bounded no matter the corpus size. This is exactly how the
  *    standard implementations train (word counts in, merges out).
  *  - encoding is a per-row kernel with the learned merge ranks
  *    broadcast as a plan literal and the parsed rank table memoized
  *    per merge-list (same memoization pattern as the dictionary
  *    hierarchy walks).
  *
  * Symbol convention: characters, with `</w>` appended to each word's
  * last symbol (the paper's end-of-word marker) so merges never cross
  * word boundaries and decoding restores word identity exactly.
  */
object BpeTokenizer {

  /** Pretokens: letter runs, digit runs, single other-glyphs —
    * whitespace never reaches the symbol stream. */
  private val pretokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def pretokens(text: Column): Column =
    filter(regexp_extract_all(text, lit(pretokenRe), lit(0)),
      t => length(t) > 0)

  private val endMark = "</w>"

  /** Learn `nMerges` merges from the corpus. One distributed
    * word-count; the merge loop runs on the collected top-`maxWords`
    * (word, freq) rows. Deterministic: ties break on the pair's
    * lexicographic order. Returns merges in rank order as "left right"
    * strings (the standard merges.txt layout). */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 100000): Seq[String] = {
    val wordFreq = docs
      .select(explode(pretokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    // symbol sequences: chars, last one carrying the end marker
    val words: Array[Array[String]] = wordFreq.map { case (w, _) =>
      val cs = w.map(_.toString).toArray
      cs(cs.length - 1) = cs(cs.length - 1) + endMark
      cs
    }
    val freqs = wordFreq.map(_._2)

    val merges = scala.collection.mutable.ArrayBuffer[String]()
    var it = 0
    while (it < nMerges) {
      // pair counts over the current symbol sequences, freq-weighted
      val counts = new java.util.HashMap[(String, String), Long]()
      var wi = 0
      while (wi < words.length) {
        val s = words(wi)
        var i = 0
        while (i + 1 < s.length) {
          counts.merge((s(i), s(i + 1)), freqs(wi), _ + _)
          i += 1
        }
        wi += 1
      }
      if (counts.isEmpty) it = nMerges
      else {
        import scala.jdk.CollectionConverters._
        val (best, bestCount) = counts.asScala.maxBy { case (p, c) =>
          (c, p._1, p._2) // deterministic: count, then lexicographic
        }
        if (bestCount < 2) it = nMerges // nothing left worth merging
        else {
          merges += s"${best._1} ${best._2}"
          val joined = best._1 + best._2
          wi = 0
          while (wi < words.length) {
            val s = words(wi)
            if (s.length > 1) {
              val out = scala.collection.mutable.ArrayBuffer[String]()
              var i = 0
              while (i < s.length) {
                if (i + 1 < s.length && s(i) == best._1 &&
                    s(i + 1) == best._2) {
                  out += joined; i += 2
                } else { out += s(i); i += 1 }
              }
              words(wi) = out.toArray
            }
            wi += 1
          }
          it += 1
        }
      }
    }
    merges.toSeq
  }

  // ---- encoding kernel -------------------------------------------------

  /** Parsed rank tables, memoized per merge-list content. The key is
    * (length, two independent 64-bit content hashes) — a 2^-128-class
    * collision domain over the full BYTE content (the old key was one
    * 32-bit rolling hash of element hashCodes: two different merge
    * tables colliding on it would silently share ranks) — and the cache
    * is bounded (a process cycling many merge tables must not grow
    * driver memory without bound). */
  private val rankCacheMax = 64
  private val rankCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Long, Long), Map[(String, String), Int]]()

  private def ranksOf(merges: ArrayData): Map[(String, String), Int] = {
    val n = merges.numElements()
    var h1 = 1125899906842597L
    var h2 = 0xcbf29ce484222325L // FNV-1a 64 over all bytes, order-mixed
    var i = 0
    while (i < n) {
      val s = merges.getUTF8String(i)
      var j = 0
      val m = s.numBytes()
      while (j < m) { h2 = (h2 ^ (s.getByte(j) & 0xff)) * 0x100000001b3L; j += 1 }
      h2 = (h2 ^ 0x2e) * 0x100000001b3L // element separator byte
      h1 = h1 * 31 + s.hashCode
      i += 1
    }
    if (rankCache.size > rankCacheMax) rankCache.clear()
    rankCache.computeIfAbsent((n, h1, h2), _ =>
      (0 until n).map { i =>
        val Array(a, b) = merges.getUTF8String(i).toString.split(" ", 2)
        (a, b) -> i
      }.toMap)
  }

  /** Standard greedy encode of one word: repeatedly merge the
    * lowest-rank adjacent pair present. */
  private def encodeWord(w: String,
      ranks: Map[(String, String), Int]): Seq[String] = {
    var s = w.map(_.toString).toVector
    s = s.updated(s.length - 1, s.last + endMark)
    var done = false
    while (!done && s.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i + 1 < s.length) {
        ranks.get((s(i), s(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) done = true
      else s = (s.take(bestAt) :+ (s(bestAt) + s(bestAt + 1))) ++
        s.drop(bestAt + 2)
    }
    s
  }

  private def pretokensOf(text: String): Iterator[String] =
    pretokenRe.r.findAllIn(text)

  /** encode(text, merges) → token array (end markers kept — they carry
    * word-boundary information for exact decode). */
  def encodeKernel(text: UTF8String, merges: ArrayData): ArrayData = {
    val ranks = ranksOf(merges)
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    pretokensOf(text.toString).foreach { w =>
      encodeWord(w, ranks).foreach(t => out += UTF8String.fromString(t))
    }
    new GenericArrayData(out.toArray)
  }

  def countKernel(text: UTF8String, merges: ArrayData): Int = {
    val ranks = ranksOf(merges)
    var n = 0
    pretokensOf(text.toString).foreach(w => n += encodeWord(w, ranks).size)
    n
  }

  /** decode: concatenate symbols, end markers become word separators —
    * the exact inverse over the pretoken stream. */
  def decodeKernel(tokens: ArrayData): UTF8String = {
    val sb = new StringBuilder
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      val t = tokens.getUTF8String(i).toString
      if (t.endsWith(endMark)) {
        sb.append(t.dropRight(endMark.length))
        if (i + 1 < n) sb.append(' ')
      } else sb.append(t)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  // ---- Column API --------------------------------------------------

  private val kCls = classOf[BpeTokenizer.type]
  private def mergesLit(merges: Seq[String]): Column =
    ExprColumn.column(org.apache.spark.sql.catalyst.expressions.Literal
      .create(merges, ArrayType(StringType)))

  def encode(text: Column, merges: Seq[String]): Column =
    ExprColumn.column(
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        kCls, ArrayType(StringType), "encodeKernel",
        Seq(ExprColumn.expression(text),
          ExprColumn.expression(mergesLit(merges))),
        Seq(StringType, ArrayType(StringType))))

  def tokenCount(text: Column, merges: Seq[String]): Column =
    ExprColumn.column(
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        kCls, IntegerType, "countKernel",
        Seq(ExprColumn.expression(text),
          ExprColumn.expression(mergesLit(merges))),
        Seq(StringType, ArrayType(StringType))))

  def decode(tokens: Column): Column =
    ExprColumn.column(
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        kCls, StringType, "decodeKernel",
        Seq(ExprColumn.expression(tokens)),
        Seq(ArrayType(StringType))))
}
