package graft.sql

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._

/** Round-5 registry tail sweep: the ~45 reference names a user hits first
  * among the previously-unregistered tail (round-4 verdict #10).
  *
  * Families:
  *   - Conversion tail (src/Functions/FunctionsConversion.h): base
  *     toDate32/toDateTime32 casts and the toUUID trio (the OrNull/OrZero
  *     matrix itself is generated in ChRegistryExt.orNullZero).
  *   - Date tail: toStartOfISOYear (toStartOfISOYear.cpp via
  *     CustomWeekTransforms.h), toWeek/toYearWeek modes 0 and 3
  *     (toCustomWeek.cpp), toMillisecond, monthName, modified Julian day
  *     both directions (toModifiedJulianDay.cpp), fromDaysSinceYearZero,
  *     sub-second toStartOf* truncation, and the snowflake *ID codecs
  *     (dateTimeToSnowflakeID.cpp / snowflakeIDToDateTime.cpp — NOTE these
  *     default to epoch 0, unlike the legacy Twitter-epoch pair).
  *   - Misc: printf, hasSubsequence (hasSubsequence.cpp),
  *     startsWithUTF8/endsWithUTF8, parseReadableSize matrix
  *     (parseReadableSize.cpp — ceil semantics), intHash32/intHash64
  *     (FunctionsHashing.h:173-192 + Common/HashTable/Hash.h — exact
  *     salted finalizers, wrap-exact in Java long arithmetic),
  *     isIPAddressInRange / IPv4CIDRToRange (FunctionsCodingIP.cpp,
  *     v4 path), factorial (factorial.cpp, n<=20), proportionsZTest
  *     (ztest.cpp — pooled/unpooled, erf/erfInv via commons-math3).
  *
  * All entries are pure Catalyst trees (codegen-friendly, no UDFs);
  * OrNull forms use TRY-mode Cast, throw-on-bad-input reference forms are
  * rendered as their OrNull twin (documented engine-wide deviation: this
  * engine does not throw per-row).
  */
object ChRegistryTail {

  private val nameSeq = new AtomicInteger(0)

  private def lv(n: String) = UnresolvedNamedLambdaVariable(Seq(n))

  private def asInt(e: Expression): Expression = Cast(e, IntegerType)
  private def asLong(e: Expression): Expression = Cast(e, LongType)
  private def asDouble(e: Expression): Expression = Cast(e, DoubleType)

  private val uuidRe =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
  private val zeroUuid = "00000000-0000-0000-0000-000000000000"

  private def uuidOrNull(e: Expression): Expression =
    If(RLike(Cast(e, StringType), Literal(uuidRe)),
      Lower(Cast(e, StringType)), Literal.create(null, StringType))

  // ---- date helpers ---------------------------------------------------

  private def dateLit(s: String): Expression = Cast(Literal(s), DateType)

  /** Monday of the ISO week-1 of calendar year `y` (the week containing
    * Jan 4 — KeyCondition-style metadata arithmetic, no scan). */
  private def isoWeek1Monday(y: Expression): Expression = {
    val jan4 = MakeDate(y, Literal(1), Literal(4))
    DateSub(jan4, WeekDay(jan4))
  }

  /** Day-of-year of the first Sunday of the calendar year of date `d`
    * (mode-0 weeks: week 1 starts at the first Sunday; earlier days are
    * week 0 — MySQL WEEK() semantics the reference mirrors in
    * CustomWeekTransforms.h). */
  private def firstSundayDoy(d: Expression): Expression = {
    val jan1 = MakeDate(Year(d), Literal(1), Literal(1))
    val dow0 = Subtract(DayOfWeek(jan1), Literal(1)) // 0 = Sunday
    Add(Literal(1), Pmod(Subtract(Literal(7), dow0), Literal(7)))
  }

  /** Mode-0 week number of `d` within its own calendar year (0..53). */
  private def week0(d: Expression): Expression = {
    val fs = firstSundayDoy(d)
    If(LessThan(DayOfYear(d), fs), Literal(0),
      Add(Cast(IntegralDivide(Subtract(DayOfYear(d), fs), Literal(7)),
        IntegerType), Literal(1)))
  }

  /** Mode-1 week: Monday-first weeks counted from the ISO week-1 Monday of
    * d's calendar year; 0 for days before it (belonging to prev ISO year). */
  private def week1(d: Expression): Expression = {
    val monday = DateSub(d, WeekDay(d))
    val w = Add(Cast(IntegralDivide(
      DateDiff(monday, isoWeek1Monday(Year(d))), Literal(7)), IntegerType),
      Literal(1))
    If(LessThan(w, Literal(1)), Literal(0), w)
  }

  private def toWeek(d0: Expression, mode: Expression): Expression = {
    val d = Cast(d0, DateType)
    CaseWhen(Seq(
      (EqualTo(mode, Literal(0)), week0(d)),
      (EqualTo(mode, Literal(1)), week1(d)),
      (EqualTo(mode, Literal(3)), asInt(WeekOfYear(d)))),
      Literal.create(null, IntegerType))
  }

  /** Mode-0 yearweek: the week belongs to the year of its Sunday, so early
    * January days roll back to the previous year's week 52/53 (MySQL
    * YEARWEEK). A Sunday's own doy is always >= firstSundayDoy, so the
    * week component here is 1-based with no zero case. */
  private def yearWeek0(d: Expression): Expression = {
    val sunday = DateSub(d, Subtract(DayOfWeek(d), Literal(1)))
    val w = Add(Cast(IntegralDivide(
      Subtract(DayOfYear(sunday), firstSundayDoy(sunday)), Literal(7)),
      IntegerType), Literal(1))
    Add(Multiply(Year(sunday), Literal(100)), w)
  }

  private def yearWeek3(d: Expression): Expression = {
    // ISO year = year of the Thursday of d's week.
    val thu = DateAdd(d, Subtract(Literal(3), WeekDay(d)))
    Add(Multiply(Year(thu), Literal(100)), asInt(WeekOfYear(d)))
  }

  private def toYearWeek(d0: Expression, mode: Expression): Expression = {
    val d = Cast(d0, DateType)
    CaseWhen(Seq(
      (EqualTo(mode, Literal(0)), yearWeek0(d)),
      (EqualTo(mode, Literal(3)), yearWeek3(d))),
      Literal.create(null, IntegerType))
  }

  private val mjdEpoch = "1858-11-17"

  // ---- snowflake (dateTimeToSnowflakeID.cpp: epoch defaults to 0) -----

  private def snowflakeIdFromMs(ms: Expression, epoch: Expression): Expression =
    ShiftLeft(Subtract(ms, asLong(epoch)), Literal(22))

  private def msFromSnowflakeId(id: Expression, epoch: Expression): Expression =
    Add(ShiftRightUnsigned(asLong(id), Literal(22)), asLong(epoch))

  private def epochArg(args: Seq[Expression], i: Int): Expression =
    if (args.length > i) args(i) else Literal(0L)

  private val twitterEpochMs = 1288834974657L

  // ---- misc helpers ---------------------------------------------------

  private val hashCls = classOf[graft.functions.HashKernels.type]

  /** intHash64 (FunctionsHashing.h:184-192) via the wrap-exact static
    * kernel (graft.functions.HashKernels — ANSI mode rejects the
    * intentional overflow in Catalyst tree form). Result is a UInt64,
    * carried as DECIMAL(20,0) via two's-complement reinterpretation (the
    * engine-wide u64 convention). */
  private def intHash64(x0: Expression): Expression =
    u64Decimal(StaticInvoke(hashCls, LongType, "intHash64",
      Seq(asLong(x0)), Seq(LongType)))

  /** Signed-long bit pattern → unsigned DECIMAL(20,0). */
  private def u64Decimal(x: Expression): Expression = {
    val d = Cast(x, DecimalType(20, 0))
    If(LessThan(x, Literal(0L)),
      Add(d, Cast(Literal(BigDecimal(2).pow(64).underlying()), DecimalType(20, 0))), d)
  }

  /** intHash32 (Hash.h:499 with the FunctionsHashing.h:180 salt). */
  private def intHash32(x0: Expression): Expression =
    StaticInvoke(hashCls, LongType, "intHash32",
      Seq(asLong(x0)), Seq(LongType))

  private def ipv4ToNum(s: Expression): Expression = {
    val parts = StringSplit(s, Literal("\\."), Literal(-1))
    def oct(i: Int): Expression =
      Cast(ElementAt(parts, Literal(i)), LongType, None, EvalMode.TRY)
    Add(Multiply(oct(1), Literal(16777216L)),
      Add(Multiply(oct(2), Literal(65536L)),
        Add(Multiply(oct(3), Literal(256L)), oct(4))))
  }

  private def ipv4ToString(n: Expression): Expression = {
    val v = asLong(n)
    def oct(shift: Int): Expression =
      Cast(BitwiseAnd(ShiftRightUnsigned(v, Literal(shift)), Literal(255L)), StringType)
    ConcatWs(Seq(Literal("."), oct(24), oct(16), oct(8), oct(0)))
  }

  /** hasSubsequence (hasSubsequence.cpp): greedy one-pass scan — a fold
    * over the haystack characters advancing a needle cursor. Pure
    * higher-order-function tree, O(|haystack|). */
  private def hasSubsequence(h0: Expression, n0: Expression): Expression = {
    val h = Cast(h0, StringType)
    val n = Cast(n0, StringType)
    val acc = lv("ch_tail_a" + nameSeq.incrementAndGet())
    val c = lv("ch_tail_c" + nameSeq.incrementAndGet())
    val fin = lv("ch_tail_f" + nameSeq.incrementAndGet())
    val step = LambdaFunction(
      Add(acc, If(And(LessThan(acc, Length(n)),
        EqualTo(c, Substring(n, Add(acc, Literal(1)), Literal(1)))),
        Literal(1), Literal(0))),
      Seq(acc, c))
    val finish = LambdaFunction(
      Cast(GreaterThanOrEqual(fin, Length(n)), IntegerType), Seq(fin))
    ArrayAggregate(StringSplit(h, Literal(""), Literal(-1)), Literal(0),
      step, finish)
  }

  /** parseReadableSize (parseReadableSize.cpp): number + ISO/IEC 80000-13
    * binary or decimal unit → ceil'd byte count. Long carrier (documented
    * cap: values above 2^63 are out of range; the reference's UInt64 top
    * bit is not reachable with realistic sizes). Unparseable → NULL (the
    * OrNull twin; the throwing form is rendered identically). */
  private def parseReadableSize(s0: Expression): Expression = {
    val s = Cast(s0, StringType)
    val re = "^\\s*([0-9]+(?:\\.[0-9]+)?)\\s*([a-zA-Z]+)\\s*$"
    val numS = RegExpExtract(s, Literal(re), Literal(1))
    val unit = Lower(RegExpExtract(s, Literal(re), Literal(2)))
    def f(u: String, factor: Double): (Expression, Expression) =
      (EqualTo(unit, Literal(u)), Literal(factor))
    val factor = CaseWhen(Seq(
      f("b", 1d),
      f("kib", 1024d), f("mib", 1024d * 1024),
      f("gib", 1024d * 1024 * 1024), f("tib", 1024d * 1024 * 1024 * 1024),
      f("pib", math.pow(1024d, 5)), f("eib", math.pow(1024d, 6)),
      f("kb", 1e3), f("mb", 1e6), f("gb", 1e9), f("tb", 1e12),
      f("pb", 1e15), f("eb", 1e18)),
      Literal.create(null, DoubleType))
    If(EqualTo(numS, Literal("")), Literal.create(null, LongType),
      Ceil(Multiply(Cast(numS, DoubleType), factor)))
  }

  // ---- proportionsZTest (ztest.cpp:155-212) ---------------------------

  private val erfCls = classOf[org.apache.commons.math3.special.Erf]

  private def erfc(e: Expression): Expression =
    StaticInvoke(erfCls, DoubleType, "erfc", Seq(asDouble(e)), Seq(DoubleType))

  private def erfInv(e: Expression): Expression =
    StaticInvoke(erfCls, DoubleType, "erfInv", Seq(asDouble(e)), Seq(DoubleType))

  private def proportionsZTest(args: Seq[Expression]): Expression = {
    val sx = asDouble(args(0)); val sy = asDouble(args(1))
    val tx = asDouble(args(2)); val ty = asDouble(args(3))
    val conf = asDouble(args(4))
    val unpooled = EqualTo(Lower(Cast(args(5), StringType)), Literal("unpooled"))
    val px = Divide(sx, tx); val py = Divide(sy, ty)
    val diff = Subtract(px, py)
    def omp(p: Expression) = Subtract(Literal(1.0), p)
    val se = Sqrt(Add(Divide(Multiply(px, omp(px)), tx),
      Divide(Multiply(py, omp(py)), ty)))
    val pPooled = Divide(Add(sx, sy), Add(tx, ty))
    val sePooled = Sqrt(Multiply(Multiply(pPooled, omp(pPooled)),
      Add(Divide(Literal(1.0), tx), Divide(Literal(1.0), ty))))
    val z = If(unpooled, Divide(diff, se), Divide(diff, sePooled))
    // p = 2 * (1 - Phi(|z|)) = erfc(|z| / sqrt(2))
    val p = erfc(Divide(Abs(z), Literal(math.sqrt(2.0))))
    // quantile z for the CI: Phi^-1 at (1+conf)/2 = sqrt(2) * erfInv(conf)
    val zq = Multiply(Literal(math.sqrt(2.0)), erfInv(conf))
    val dist = Multiply(zq, se)
    val bad = Or(Or(EqualTo(sx, Literal(0.0)), EqualTo(sy, Literal(0.0))),
      Or(Or(GreaterThan(sx, tx), GreaterThan(sy, ty)),
        Or(LessThan(conf, Literal(0.0)), GreaterThan(conf, Literal(1.0)))))
    val nan = Literal(Double.NaN)
    CreateStruct(Seq(
      If(bad, nan, z), If(bad, nan, p),
      If(bad, nan, Subtract(diff, dist)), If(bad, nan, Add(diff, dist))))
  }

  // ---------------------------------------------------------------------

  val builders: Map[String, Seq[Expression] => Expression] = Map(
    // conversion tail: the OrNull/OrZero/OrDefault matrix already lives in
    // ChRegistryExt.orNullZero (generated) — only the base Date32/
    // DateTime32 casts and the UUID trio are new here.
    // Date32 widens the reference's range, not the Spark carrier.
    "todate32" -> (args => Cast(args.head, DateType)),
    "todatetime32" -> (args => Cast(args.head, TimestampType)),
    "touuid" -> (args => uuidOrNull(args.head)),
    "touuidornull" -> (args => uuidOrNull(args.head)),
    "touuidorzero" -> (args =>
      Coalesce(Seq(uuidOrNull(args.head), Literal(zeroUuid)))),

    // date tail
    "tostartofisoyear" -> { args =>
      val d = Cast(args.head, DateType)
      val thu = DateAdd(d, Subtract(Literal(3), WeekDay(d)))
      isoWeek1Monday(Year(thu))
    },
    "tomillisecond" -> (args =>
      asInt(Pmod(IntegralDivide(UnixMicros(Cast(args.head, TimestampType)),
        Literal(1000L)), Literal(1000L)))),
    "monthname" -> (args =>
      DateFormatClass(Cast(args.head, TimestampType), Literal("MMMM"))),
    "toweek" -> (args =>
      toWeek(args.head, if (args.length > 1) asInt(args(1)) else Literal(0))),
    "toyearweek" -> (args =>
      toYearWeek(args.head, if (args.length > 1) asInt(args(1)) else Literal(0))),
    // base to/fromModifiedJulianDay + fromDaysSinceYearZero already live
    // in ChRegistryUrlDate — only the OrNull/32 variants are new here
    "tomodifiedjuliandayornull" -> (args =>
      DateDiff(Cast(Cast(args.head, StringType), DateType, None, EvalMode.TRY),
        dateLit(mjdEpoch))),
    "frommodifiedjuliandayornull" -> (args =>
      DateAdd(dateLit(mjdEpoch), Cast(args.head, IntegerType, None, EvalMode.TRY))),
    "fromdayssinceyearzero32" -> (args =>
      DateAdd(dateLit("0001-01-01"), Subtract(asInt(args.head), Literal(366)))),
    "tostartofmillisecond" -> (args => {
      val us = UnixMicros(Cast(args.head, TimestampType))
      MicrosToTimestamp(Subtract(us, Pmod(us, Literal(1000L))))
    }),
    "tostartofmicrosecond" -> (args => Cast(args.head, TimestampType)),

    // snowflake ID codecs (epoch defaults to 0 — dateTimeToSnowflakeID.cpp)
    "datetimetosnowflakeid" -> (args =>
      snowflakeIdFromMs(Multiply(UnixSeconds(Cast(args.head, TimestampType)),
        Literal(1000L)), epochArg(args, 1))),
    "datetime64tosnowflakeid" -> (args =>
      snowflakeIdFromMs(UnixMillis(Cast(args.head, TimestampType)), epochArg(args, 1))),
    "snowflakeidtodatetime64" -> (args =>
      MillisToTimestamp(msFromSnowflakeId(args.head, epochArg(args, 1)))),
    // legacy pair (Twitter epoch — snowflake.cpp:43)
    "datetime64tosnowflake" -> (args =>
      snowflakeIdFromMs(UnixMillis(Cast(args.head, TimestampType)),
        Literal(twitterEpochMs))),
    "snowflaketodatetime64" -> (args =>
      MillisToTimestamp(msFromSnowflakeId(args.head, Literal(twitterEpochMs)))),

    // strings / misc
    "printf" -> (args => FormatString(args: _*)),
    "hassubsequence" -> (args => hasSubsequence(args(0), args(1))),
    "hassubsequencecaseinsensitive" -> (args =>
      hasSubsequence(Lower(Cast(args(0), StringType)),
        Lower(Cast(args(1), StringType)))),
    "startswithutf8" -> (args =>
      Cast(StartsWith(Cast(args(0), StringType), Cast(args(1), StringType)),
        IntegerType)),
    "endswithutf8" -> (args =>
      Cast(EndsWith(Cast(args(0), StringType), Cast(args(1), StringType)),
        IntegerType)),
    "parsereadablesize" -> (args => parseReadableSize(args.head)),
    "parsereadablesizeornull" -> (args => parseReadableSize(args.head)),
    "parsereadablesizeorzero" -> (args =>
      Coalesce(Seq(parseReadableSize(args.head), Literal(0L)))),
    "inthash32" -> (args => intHash32(args.head)),
    "inthash64" -> (args => intHash64(args.head)),
    "isipaddressinrange" -> { args =>
      val addr = Cast(args(0), StringType)
      val cidr = Cast(args(1), StringType)
      val net = SubstringIndex(cidr, Literal("/"), Literal(1))
      val plen = Cast(SubstringIndex(cidr, Literal("/"), Literal(-1)),
        IntegerType, None, EvalMode.TRY)
      val shift = Subtract(Literal(32), plen)
      val v6 = Or(Contains(addr, Literal(":")), Contains(cidr, Literal(":")))
      If(v6, Literal.create(null, IntegerType),
        Cast(EqualTo(ShiftRightUnsigned(ipv4ToNum(addr), shift),
          ShiftRightUnsigned(ipv4ToNum(net), shift)), IntegerType))
    },
    "ipv4cidrtorange" -> { args =>
      val ip = asLong(args(0))
      val shift = Subtract(Literal(32), asInt(args(1)))
      val lower = ShiftLeft(ShiftRightUnsigned(ip, shift), shift)
      val upper = Add(lower,
        Subtract(ShiftLeft(Literal(1L), shift), Literal(1L)))
      CreateStruct(Seq(ipv4ToString(lower), ipv4ToString(upper)))
    },
    "factorial" -> { args =>
      val n = asInt(args.head)
      val acc = lv("ch_tail_fa" + nameSeq.incrementAndGet())
      val x = lv("ch_tail_fx" + nameSeq.incrementAndGet())
      val id = lv("ch_tail_fi" + nameSeq.incrementAndGet())
      val agg = ArrayAggregate(
        Sequence(Literal(1L), asLong(n), Some(Literal(1L))),
        Literal(1L), LambdaFunction(Multiply(acc, x), Seq(acc, x)),
        LambdaFunction(id, Seq(id)))
      CaseWhen(Seq(
        (Or(LessThan(n, Literal(0)), GreaterThan(n, Literal(20))),
          Literal.create(null, LongType)),
        (LessThan(n, Literal(2)), Literal(1L))), agg)
    },
    "proportionsztest" -> (args => proportionsZTest(args))
  )
}
