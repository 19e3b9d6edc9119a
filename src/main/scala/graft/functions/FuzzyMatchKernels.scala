package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** multiFuzzyMatchAny / multiFuzzyMatchAnyIndex /
  * multiFuzzyMatchAllIndices — the reference's Hyperscan approximate
  * regex family (src/Functions/MultiMatchAnyImpl.h with
  * HS_FLAG_COMBINATION edit-distance compilation): a pattern matches if
  * SOME substring of the haystack matches it within the given edit
  * distance.
  *
  * Spark rendering — the LITERAL lane, exactly like the registry's
  * multiMatchAny precedent (which compiles literal pattern sets into
  * one automaton): metacharacter-free patterns get the EXACT
  * approximate-substring semantics via the Sellers dynamic program
  * (free start: D[0][j]=0; match iff min_j D[m][j] <= k — the standard
  * published algorithm for substring matching within edit distance),
  * with the non-decreasing-row-minimum early exit. Patterns carrying
  * regex metacharacters throw loudly at PLAN time: fuzzy REGEX needs
  * Vectorscan/Hyperscan, which has no JVM port in this container
  * (documented in FUNCTIONS.md). Distances and pattern arrays are
  * plan constants (the reference requires a constant array too). */
object FuzzyMatchKernels {

  /** Is there a substring of `hay` within edit distance `k` of `pat`? */
  private def substringWithin(hay: String, pat: String, k: Int): Boolean = {
    val m = pat.length
    if (m == 0) return true
    if (k >= m) return true // deleting the whole pattern always fits
    val n = hay.length
    var prev = new Array[Int](n + 1) // row 0: D[0][j] = 0 (free start)
    var curr = new Array[Int](n + 1)
    var i = 1
    while (i <= m) {
      curr(0) = i
      var best = i
      var j = 1
      while (j <= n) {
        val cost = if (pat.charAt(i - 1) == hay.charAt(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = curr(j - 1) + 1
        if (ins < v) v = ins
        curr(j) = v
        if (v < best) best = v
        j += 1
      }
      if (best > k) return false // row minima never decrease
      val t = prev; prev = curr; curr = t
      i += 1
    }
    var j = 0
    while (j <= n) { if (prev(j) <= k) return true; j += 1 }
    false
  }

  private def matches(hay: UTF8String, k: Int, pats: ArrayData,
      idx: Int): Boolean =
    substringWithin(hay.toString, pats.getUTF8String(idx).toString, k)

  def fuzzyAny(hay: UTF8String, k: Int, pats: ArrayData): Boolean = {
    var i = 0
    while (i < pats.numElements()) {
      if (matches(hay, k, pats, i)) return true
      i += 1
    }
    false
  }

  /** 1-based index of the first matching pattern, 0 when none. */
  def fuzzyAnyIndex(hay: UTF8String, k: Int, pats: ArrayData): Long = {
    var i = 0
    while (i < pats.numElements()) {
      if (matches(hay, k, pats, i)) return i + 1L
      i += 1
    }
    0L
  }

  /** All matching 1-based indices, ascending (the reference documents
    * "in any order" — ascending is the deterministic choice). */
  def fuzzyAllIndices(hay: UTF8String, k: Int, pats: ArrayData): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    while (i < pats.numElements()) {
      if (matches(hay, k, pats, i)) out += (i + 1L)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private val metaChars = "\\^$.|?*+()[]{}"

  /** Plan-time guard: the literal lane only. */
  def requireLiteralPatterns(pats: Seq[String]): Unit =
    pats.find(p => p.exists(metaChars.contains(_))).foreach(p =>
      throw new UnsupportedOperationException(
        s"multiFuzzyMatch*: pattern '$p' carries regex metacharacters — " +
          "fuzzy REGEX matching needs Vectorscan/Hyperscan (no JVM " +
          "port); the literal lane serves metacharacter-free patterns"))
}
