package graft.sql

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._

/** Round-5 registry tail sweep #2.
  *
  * Families:
  *   - Scalar Roaring bitmap algebra (src/Functions/FunctionsBitmap.h:
  *     bitmapBuild/bitmapToArray/bitmapCardinality/bitmapContains, the
  *     and/or/xor/andnot pair ops and their *Cardinality forms,
  *     bitmapMin/Max, bitmapHasAny/HasAll, bitmapSubsetInRange/
  *     bitmapSubsetLimit). States are the SAME Roaring64 binary payloads
  *     the groupBitmap aggregates (functions/BitmapFunctions.scala)
  *     produce, so scalar ops compose with aggregate states. The codec is
  *     opaque (UDF-backed), everything around it is a Catalyst tree.
  *     Deviation: bitmapMin/Max return NULL on an empty bitmap (reference
  *     returns UINT64_MAX/0 sentinels — a NULL is the honest Spark
  *     rendering and is pinned in the battery oracle).
  *   - base64URLEncode/base64URLDecode (src/Functions/base64UrlEncode.cpp):
  *     RFC 4648 §5 URL-safe alphabet, unpadded — rendered as translate
  *     over the standard codec plus pad arithmetic, pure codegen.
  *   - compareSubstrings (src/Functions/CompareSubstrings.cpp): sign of a
  *     fixed-length compare at 0-based offsets.
  *   - byteSlice (src/Functions/byteSlice.cpp): rendered as substring —
  *     byte == char on the ASCII corpus; documented deviation for UTF-8.
  *   - lastDay (alias of toLastDayOfMonth, registerAlias in
  *     toLastDayOfMonth registration), UTCTimestamp (UTCTimestamp.cpp —
  *     session TZ is pinned UTC engine-wide), addNanoseconds/
  *     subtractNanoseconds (addNanoseconds.cpp — truncated to the
  *     microsecond carrier, the documented engine-wide DateTime64(6) cap).
  */
object ChRegistryTail2 {

  private val nameSeq = new AtomicInteger(0)

  private def lv(): UnresolvedNamedLambdaVariable =
    UnresolvedNamedLambdaVariable(Seq("ch_t2_lv_" + nameSeq.incrementAndGet()))

  private def lam1(f: Expression => Expression): LambdaFunction = {
    val x = lv(); LambdaFunction(f(x), Seq(x))
  }

  private def asLong(e: Expression): Expression = Cast(e, LongType)

  // --- bitmap kernels via StaticInvoke (codegen-participating; a
  // Column-backed UDF cannot be embedded in a FunctionRegistry tree) ----
  private val bmCls = classOf[graft.functions.BitmapKernels.type]
  private val sdCls = classOf[graft.functions.StringDistanceKernels.type]
  private val jsonCls = classOf[graft.functions.JsonKernels.type]

  private def bmBuild(arr: Expression): Expression =
    StaticInvoke(bmCls, BinaryType, "build",
      Seq(Cast(arr, ArrayType(LongType))), Seq(ArrayType(LongType)))
  private def bmCard(bm: Expression): Expression =
    StaticInvoke(bmCls, LongType, "card", Seq(bm), Seq(BinaryType))
  private def bmToArr(bm: Expression): Expression =
    SortArray(StaticInvoke(bmCls, ArrayType(LongType, containsNull = false),
      "toArr", Seq(bm), Seq(BinaryType)), Literal(true))
  private def bmAnd(x: Expression, y: Expression): Expression =
    StaticInvoke(bmCls, BinaryType, "and", Seq(x, y),
      Seq(BinaryType, BinaryType))
  private def bmOr(x: Expression, y: Expression): Expression =
    StaticInvoke(bmCls, BinaryType, "or", Seq(x, y),
      Seq(BinaryType, BinaryType))
  private def bmXor(x: Expression, y: Expression): Expression =
    StaticInvoke(bmCls, BinaryType, "xor", Seq(x, y),
      Seq(BinaryType, BinaryType))
  private def bmAndnot(x: Expression, y: Expression): Expression =
    StaticInvoke(bmCls, BinaryType, "andNot", Seq(x, y),
      Seq(BinaryType, BinaryType))
  private def bmAndCard(x: Expression, y: Expression): Expression =
    StaticInvoke(bmCls, LongType, "andCard", Seq(x, y),
      Seq(BinaryType, BinaryType))
  private def bmContains(bm: Expression, v: Expression): Expression =
    StaticInvoke(bmCls, BooleanType, "contains", Seq(bm, asLong(v)),
      Seq(BinaryType, LongType))

  val builders: Map[String, Seq[Expression] => Expression] = Map(

    // --- scalar Roaring bitmap algebra (FunctionsBitmap.h) -------------
    "bitmapbuild" -> (args => bmBuild(args.head)),
    "bitmapcardinality" -> (args => bmCard(args.head)),
    "bitmaptoarray" -> (args => bmToArr(args.head)),
    "bitmapcontains" -> (args => bmContains(args(0), args(1))),
    "bitmapand" -> (args => bmAnd(args(0), args(1))),
    "bitmapor" -> (args => bmOr(args(0), args(1))),
    "bitmapxor" -> (args => bmXor(args(0), args(1))),
    "bitmapandnot" -> (args => bmAndnot(args(0), args(1))),
    "bitmapandcardinality" -> (args => bmAndCard(args(0), args(1))),
    "bitmaporcardinality" -> (args => bmCard(bmOr(args(0), args(1)))),
    "bitmapxorcardinality" -> (args => bmCard(bmXor(args(0), args(1)))),
    "bitmapandnotcardinality" -> (args => bmCard(bmAndnot(args(0), args(1)))),
    "bitmapmin" -> (args => ArrayMin(bmToArr(args.head))),
    "bitmapmax" -> (args => ArrayMax(bmToArr(args.head))),
    "bitmaphasany" -> (args =>
      GreaterThan(bmAndCard(args(0), args(1)), Literal(0L))),
    // hasAll(a, b): every element of b is in a <=> |a ∩ b| = |b|
    "bitmaphasall" -> (args =>
      EqualTo(bmAndCard(args(0), args(1)), bmCard(args(1)))),
    // subsetInRange(bm, lo, hi): members in [lo, hi) as a new bitmap
    "bitmapsubsetinrange" -> (args =>
      bmBuild(ArrayFilter(bmToArr(args.head), lam1(x =>
        And(GreaterThanOrEqual(x, asLong(args(1))),
          LessThan(x, asLong(args(2)))))))),
    // subsetLimit(bm, start, limit): first `limit` members >= start
    "bitmapsubsetlimit" -> (args =>
      bmBuild(Slice(ArrayFilter(bmToArr(args.head), lam1(x =>
        GreaterThanOrEqual(x, asLong(args(1))))),
        Literal(1), Cast(args(2), IntegerType)))),
    // subBitmap(bm, offset, limit): members by POSITION — skip `offset`
    // smallest members, take the next `limit` (subBitmap.cpp; the
    // positional sibling of the value-based subsetLimit)
    "subbitmap" -> (args =>
      bmBuild(Slice(bmToArr(args.head),
        Add(Cast(args(1), IntegerType), Literal(1)),
        Cast(args(2), IntegerType)))),

    // --- base64 URL-safe unpadded codec (base64UrlEncode.cpp) ----------
    "base64urlencode" -> (args =>
      RegExpReplace(
        StringTranslate(Base64(Cast(args.head, BinaryType)),
          Literal("+/"), Literal("-_")),
        Literal("=+$"), Literal(""), Literal(1))),
    "base64urldecode" -> (args => {
      val std = StringTranslate(args.head, Literal("-_"), Literal("+/"))
      val pad = StringRepeat(Literal("="),
        Pmod(Subtract(Literal(4), Pmod(Length(args.head), Literal(4))),
          Literal(4)))
      Cast(UnBase64(Concat(Seq(std, pad))), StringType)
    }),

    // --- compareSubstrings(s, t, off_s, off_t, n): sign, 0-based offsets
    "comparesubstrings" -> (args => {
      val a = Substring(args(0), Add(Cast(args(2), IntegerType), Literal(1)),
        Cast(args(4), IntegerType))
      val b = Substring(args(1), Add(Cast(args(3), IntegerType), Literal(1)),
        Cast(args(4), IntegerType))
      If(LessThan(a, b), Literal(-1), If(GreaterThan(a, b), Literal(1),
        Literal(0)))
    }),

    // --- byteSlice: substring rendering (byte == char on ASCII) --------
    "byteslice" -> (args => Substring(args(0),
      Cast(args(1), IntegerType), Cast(args(2), IntegerType))),

    // --- string distances (FunctionsStringDistance.cpp) ----------------
    // editDistance == Spark's codegen'd Levenshtein (+ the reference's
    // levenshteinDistance alias); UTF8 variant is the same (Spark is
    // already code-point based). The rest are static kernels — see
    // functions/StringDistanceKernels.scala for the faithful quirks
    // (OSA not unrestricted DL; jaro's empty-side length shortcut).
    "editdistance" -> (args => Levenshtein(args(0), args(1))),
    "editdistanceutf8" -> (args => Levenshtein(args(0), args(1))),
    "levenshteindistance" -> (args => Levenshtein(args(0), args(1))),
    "dameraulevenshteindistance" -> (args =>
      StaticInvoke(sdCls, IntegerType, "damerauLevenshtein",
        Seq(args(0), args(1)), Seq(StringType, StringType))),
    "jarosimilarity" -> (args =>
      StaticInvoke(sdCls, DoubleType, "jaro",
        Seq(args(0), args(1)), Seq(StringType, StringType))),
    "jarowinklersimilarity" -> (args =>
      StaticInvoke(sdCls, DoubleType, "jaroWinkler",
        Seq(args(0), args(1)), Seq(StringType, StringType))),
    "stringjaccardindex" -> (args =>
      StaticInvoke(sdCls, DoubleType, "jaccardBytes",
        Seq(args(0), args(1)), Seq(StringType, StringType))),
    "stringjaccardindexutf8" -> (args =>
      StaticInvoke(sdCls, DoubleType, "jaccardCodepoints",
        Seq(args(0), args(1)), Seq(StringType, StringType))),

    // --- wide-integer aggregation over the string carrier --------------
    // (AggregateFunctionSum.h Int128/Int256 lanes; closes the round-4
    // "wide aggregation unbuilt" cap — see WideAggregates for the exact
    // buffer design and the exact-sum-vs-wrap deviation note)
    "sumwide" -> (args => graft.functions.WideAggregates.WideSum(args.head)),
    "minwide" -> (args =>
      graft.functions.WideAggregates.WideExtreme(args.head, isMax = false)),
    "maxwide" -> (args =>
      graft.functions.WideAggregates.WideExtreme(args.head, isMax = true)),
    "avgwide" -> (args => graft.functions.WideAggregates.WideAvg(args.head)),

    // --- JSONMergePatch (jsonMergePatch.cpp, RFC 7386; variadic left
    // fold like the reference's pairwise apply) -------------------------
    "jsonmergepatch" -> (args => args.reduceLeft((acc, p) =>
      StaticInvoke(jsonCls, StringType, "mergePatch", Seq(acc, p),
        Seq(StringType, StringType)))),

    // --- date tail -----------------------------------------------------
    "lastday" -> (args => LastDay(args.head)),
    "utctimestamp" -> (_ => CurrentTimestamp()),
    "utc_timestamp" -> (_ => CurrentTimestamp()),
    // nanosecond arithmetic on the microsecond carrier: truncating
    // integer division, the engine-wide DateTime64(6) precision cap
    "addnanoseconds" -> (args =>
      TimestampAdd("MICROSECOND",
        IntegralDivide(asLong(args(1)), Literal(1000L)), args(0))),
    "subtractnanoseconds" -> (args =>
      TimestampAdd("MICROSECOND",
        UnaryMinus(IntegralDivide(asLong(args(1)), Literal(1000L))), args(0)))
  )
}
