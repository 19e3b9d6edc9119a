package graft.sql

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** URL-part, date-manipulation, map/tuple, and geo names of the reference
  * registry (src/Functions/URL/, src/Functions/changeDate.cpp,
  * FunctionsMapMiscellaneous.cpp, greatCircleDistance.cpp) — Spark
  * rendering over ParseUrl / datetime arithmetic / map expressions.
  *
  * URL parts ride java.net.URI via Spark's ParseUrl (HOST/PATH/QUERY/REF/
  * PROTOCOL/FILE/AUTHORITY); the scheme-less forms the reference accepts
  * fall back to a regex extract. firstSignificantSubdomain uses the same
  * public-suffix heuristic the reference ships for its default list
  * (com/net/org/co/gov/edu/mil second-levels under a cc TLD). */
object ChRegistryUrlDate {

  private val nameSeq = new AtomicInteger(0)

  private def lv(): UnresolvedNamedLambdaVariable =
    UnresolvedNamedLambdaVariable(Seq("ch_ud_" + nameSeq.incrementAndGet()))

  private def lam1(f: Expression => Expression): LambdaFunction = {
    val x = lv(); LambdaFunction(f(x), Seq(x))
  }

  private def lam2(f: (Expression, Expression) => Expression): LambdaFunction = {
    val x = lv(); val y = lv(); LambdaFunction(f(x, y), Seq(x, y))
  }

  private def at(arr: Expression, i: Expression): Expression =
    ElementAt(arr, i, None, failOnError = false)

  private def asInt(e: Expression): Expression = Cast(e, IntegerType)
  private def asLong(e: Expression): Expression = Cast(e, LongType)
  private def asDouble(e: Expression): Expression = Cast(e, DoubleType)

  private def part(url: Expression, p: String): Expression =
    ParseUrl(Seq(url, Literal(p)), failOnError = false)

  /** HOST with a scheme-less fallback (the reference accepts bare
    * "example.com/path"). */
  private def host(url: Expression): Expression =
    Coalesce(Seq(part(url, "HOST"),
      RegExpExtract(url, Literal("^(?:[A-Za-z][A-Za-z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+)"), Literal(1))))

  private val sldSet: Seq[String] = Seq("com", "net", "org", "co", "gov", "edu", "mil")

  /** ["news","yandex","com","tr"] → index (1-based) of the first
    * significant label: n-2 when the 2nd-level is a public-suffix word
    * under a cc TLD, else n-1. */
  private def fssIndex(parts: Expression): Expression = {
    val n = Size(parts)
    val sld = at(parts, Subtract(n, Literal(1)))
    If(And(GreaterThanOrEqual(n, Literal(3)),
        In(sld, sldSet.map(Literal(_)))),
      Subtract(n, Literal(2)), Subtract(n, Literal(1)))
  }

  private def domainParts(url: Expression): Expression =
    StringSplit(host(url), Literal("\\."), Literal(-1))

  private def firstSignificantSubdomain(url: Expression): Expression = {
    val parts = domainParts(url)
    If(LessThanOrEqual(Size(parts), Literal(1)), host(url),
      at(parts, fssIndex(parts)))
  }

  private def cutToFirstSignificantSubdomain(url: Expression): Expression = {
    val parts = domainParts(url)
    val i = fssIndex(parts)
    If(LessThanOrEqual(Size(parts), Literal(1)), host(url),
      ArrayJoin(Slice(parts, i, Add(Subtract(Size(parts), i), Literal(1))),
        Literal("."), None))
  }

  /** Saturating day-of-month change (changeDate.cpp saturates). */
  private def changeDay(d: Expression, newDay: Expression): Expression = {
    val clamped = Greatest(Seq(Literal(1),
      Least(Seq(asInt(newDay), DayOfMonth(LastDay(d))))))
    TimestampAdd("DAY", asLong(Subtract(clamped, DayOfMonth(d))), d)
  }

  private def floorSeconds(ts: Expression, step: Long): Expression =
    SecondsToTimestamp(Multiply(
      IntegralDivide(asLong(ts), Literal(step)), Literal(step)))

  /** toStartOfInterval: day-time intervals floor the epoch; year-month
    * intervals floor months-since-epoch and return a Date (like the
    * reference's month/quarter/year granularities). */
  private def toStartOfInterval(ts: Expression, iv: Expression): Expression = iv match {
    case Literal(micros: Long, _: DayTimeIntervalType) =>
      floorSeconds(ts, math.max(1L, micros / 1000000L))
    case Literal(months: Int, _: YearMonthIntervalType) =>
      val m = Add(Multiply(Subtract(Year(ts), Literal(1970)), Literal(12)),
        Subtract(Month(ts), Literal(1)))
      AddMonths(Cast(Literal("1970-01-01"), DateType),
        Multiply(IntegralDivide(m, Literal(months.toLong)),
          Literal(months.toLong)))
    case _ => throw new IllegalArgumentException(
      "toStartOfInterval expects a literal INTERVAL")
  }

  /** Haversine on the reference's sphere radius
    * (greatCircleDistance.cpp; lon-first argument order), meters. */
  private def greatCircleMeters(lon1: Expression, lat1: Expression,
      lon2: Expression, lat2: Expression): Expression = {
    val r = Literal(6372797.560856d)
    val p1 = Multiply(asDouble(lat1), Literal(math.Pi / 180.0))
    val p2 = Multiply(asDouble(lat2), Literal(math.Pi / 180.0))
    val dp = Divide(Subtract(p2, p1), Literal(2.0d))
    val dl = Multiply(Divide(Subtract(asDouble(lon2), asDouble(lon1)), Literal(2.0d)),
      Literal(math.Pi / 180.0))
    val a = Add(Multiply(Sin(dp), Sin(dp)),
      Multiply(Multiply(Cos(p1), Cos(p2)), Multiply(Sin(dl), Sin(dl))))
    Multiply(Multiply(Literal(2.0d), r), Asin(Sqrt(a)))
  }

  private def gjoNegate(lambda: Expression): Expression = lambda match {
    case lf: LambdaFunction => LambdaFunction(Not(lf.function), lf.arguments)
    case other => other
  }

  private val twitterEpochMs = 1288834974657L

  val builders: Map[String, Seq[Expression] => Expression] = Map(
    // ---- URL parts (src/Functions/URL/) ----
    "protocol" -> (args => part(args.head, "PROTOCOL")),
    "domain" -> (args => host(args.head)),
    "domainwithoutwww" -> (args =>
      RegExpReplace(host(args.head), Literal("^www\\."), Literal(""))),
    "topleveldomain" -> (args =>
      RegExpExtract(host(args.head), Literal("\\.([^.]+)$"), Literal(1))),
    "firstsignificantsubdomain" -> (args => firstSignificantSubdomain(args.head)),
    "cuttofirstsignificantsubdomain" -> (args => cutToFirstSignificantSubdomain(args.head)),
    // RFC variants (round 8): the reference's *RFC twins differ only on
    // exotic hosts (IP-literals/trailing dots) — same extraction here
    "domainrfc" -> (args => host(args.head)),
    "domainwithoutwwwrfc" -> (args =>
      RegExpReplace(host(args.head), Literal("^www\\."), Literal(""))),
    "topleveldomainrfc" -> (args =>
      RegExpExtract(host(args.head), Literal("\\.([^.]+)$"), Literal(1))),
    "firstsignificantsubdomainrfc" -> (args => firstSignificantSubdomain(args.head)),
    "cuttofirstsignificantsubdomainrfc" -> (args => cutToFirstSignificantSubdomain(args.head)),
    "path" -> (args => part(args.head, "PATH")),
    "pathfull" -> (args => part(args.head, "FILE")),
    "querystring" -> (args => part(args.head, "QUERY")),
    "fragment" -> (args => part(args.head, "REF")),
    "querystringandfragment" -> (args => {
      val q = part(args.head, "QUERY"); val f = part(args.head, "REF")
      Concat(Seq(Coalesce(Seq(q, Literal(""))),
        If(IsNull(f), Literal(""), Concat(Seq(Literal("#"), f)))))
    }),
    "netloc" -> (args => part(args.head, "AUTHORITY")),
    "port" -> (args =>
      Coalesce(Seq(Cast(RegExpExtract(part(args.head, "AUTHORITY"),
        Literal(":(\\d+)$"), Literal(1)), IntegerType, None, EvalMode.TRY),
        Literal(0)))),
    "cutwww" -> (args =>
      RegExpReplace(args.head, Literal("(^|//)www\\."), Literal("$1"))),
    "cutquerystring" -> (args =>
      RegExpReplace(args.head, Literal("\\?[^#]*"), Literal(""))),
    "cutfragment" -> (args =>
      RegExpReplace(args.head, Literal("#.*$"), Literal(""))),
    "cutquerystringandfragment" -> (args =>
      RegExpReplace(args.head, Literal("[?#].*$"), Literal(""))),
    "extracturlparameter" -> (args =>
      Coalesce(Seq(ParseUrl(Seq(args(0), Literal("QUERY"), args(1)),
        failOnError = false), Literal("")))),
    "extracturlparameters" -> (args => {
      val q = part(args.head, "QUERY")
      If(IsNull(q), Literal.create(Array.empty[String], ArrayType(StringType)),
        StringSplit(q, Literal("&"), Literal(-1)))
    }),
    "extracturlparameternames" -> (args => {
      val q = part(args.head, "QUERY")
      If(IsNull(q), Literal.create(Array.empty[String], ArrayType(StringType)),
        ArrayTransform(StringSplit(q, Literal("&"), Literal(-1)),
          lam1(kv => RegExpExtract(kv, Literal("^([^=]*)"), Literal(1)))))
    }),
    // component form uses %20 (reference encodeURLComponent); the form
    // variant keeps application/x-www-form-urlencoded '+'
    "encodeurlcomponent" -> (args =>
      RegExpReplace(UrlEncode(args.head), Literal("\\+"), Literal("%20"))),
    "encodeurlformcomponent" -> (args => UrlEncode(args.head)),
    "decodeurlcomponent" -> (args => UrlDecode(args.head)),
    "decodeurlformcomponent" -> (args => UrlDecode(args.head)),

    // ---- date manipulation (changeDate.cpp, dateName.cpp, ...) ----
    // changeYear/changeMonth saturate via add_months semantics; changeDay
    // clamps explicitly; hour/minute/second shift by the delta.
    "changeyear" -> (args =>
      TimestampAdd("YEAR", asLong(Subtract(asInt(args(1)), Year(args(0)))), args(0))),
    "changemonth" -> (args =>
      TimestampAdd("MONTH", asLong(Subtract(asInt(args(1)), Month(args(0)))), args(0))),
    "changeday" -> (args => changeDay(args(0), args(1))),
    "changehour" -> (args =>
      TimestampAdd("HOUR", asLong(Subtract(asInt(args(1)), Hour(args(0)))), args(0))),
    "changeminute" -> (args =>
      TimestampAdd("MINUTE", asLong(Subtract(asInt(args(1)), Minute(args(0)))), args(0))),
    "changesecond" -> (args =>
      TimestampAdd("SECOND", asLong(Subtract(asInt(args(1)), Second(args(0)))), args(0))),
    // monthName NOT registered: Spark 4 ships a `monthname` builtin that
    // returns the 'Mar' abbreviation; shadowing is forbidden (ChRegistrySpec
    // pin). The reference's full name is available as dateName('month', d).
    "datename" -> (args => args(0) match {
      case Literal(s, StringType) => s.toString.toLowerCase match {
        case "year" => Cast(Year(args(1)), StringType)
        case "quarter" => Cast(Quarter(args(1)), StringType)
        case "month" => DateFormatClass(args(1), Literal("MMMM"))
        case "week" => Cast(WeekOfYear(args(1)), StringType)
        case "dayofyear" => Cast(DayOfYear(args(1)), StringType)
        case "day" => Cast(DayOfMonth(args(1)), StringType)
        case "weekday" => DateFormatClass(args(1), Literal("EEEE"))
        case "hour" => Cast(Hour(args(1)), StringType)
        case "minute" => Cast(Minute(args(1)), StringType)
        case "second" => Cast(Second(args(1)), StringType)
        case other => throw new IllegalArgumentException(s"dateName: unit '$other'")
      }
      case _ => throw new IllegalArgumentException("dateName expects a literal unit")
    }),
    "timediff" -> (args => Subtract(asLong(args(1)), asLong(args(0)))),
    "tomodifiedjulianday" -> (args =>
      DateDiff(Cast(args.head, DateType), Cast(Literal("1858-11-17"), DateType))),
    "frommodifiedjulianday" -> (args =>
      DateAdd(Cast(Literal("1858-11-17"), DateType), asInt(args.head))),
    // year 0 is a 366-day proleptic leap year (fromDaysSinceYearZero.cpp)
    "fromdayssinceyearzero" -> (args =>
      DateAdd(Cast(Literal("0001-01-01"), DateType),
        Subtract(asInt(args.head), Literal(366)))),
    "todayssinceyearzero" -> (args =>
      Add(DateDiff(Cast(args.head, DateType),
        Cast(Literal("0001-01-01"), DateType)), Literal(366))),
    // canonical reference spelling is PLURAL toStartOfFiveMinutes
    // (registerFunctions: FunctionToStartOfFiveMinutes) — the singular
    // stays as a lenient alias (round-5 sweep found it registered under
    // the misspelled name only)
    "tostartoffiveminute" -> (args => floorSeconds(args.head, 300L)),
    "tostartoffiveminutes" -> (args => floorSeconds(args.head, 300L)),
    "tostartoftenminutes" -> (args => floorSeconds(args.head, 600L)),
    "tostartoffifteenminutes" -> (args => floorSeconds(args.head, 900L)),
    "tostartofinterval" -> (args => toStartOfInterval(args(0), args(1))),
    "yyyymmddtodate" -> (args =>
      Cast(SecondsToTimestamp(UnixTimestamp(Cast(args.head, StringType),
        Literal("yyyyMMdd"))), DateType)),
    "yyyymmddtodate32" -> (args =>
      Cast(SecondsToTimestamp(UnixTimestamp(Cast(args.head, StringType),
        Literal("yyyyMMdd"))), DateType)),
    "yyyymmddhhmmsstodatetime" -> (args =>
      SecondsToTimestamp(UnixTimestamp(Cast(args.head, StringType),
        Literal("yyyyMMddHHmmss")))),
    // Twitter-epoch snowflake codecs (snowflake.cpp)
    "datetimetosnowflake" -> (args =>
      ShiftLeft(Subtract(Multiply(asLong(args.head), Literal(1000L)),
        Literal(twitterEpochMs)), Literal(22))),
    "snowflaketodatetime" -> (args =>
      SecondsToTimestamp(IntegralDivide(
        Add(ShiftRightUnsigned(asLong(args.head), Literal(22)),
          Literal(twitterEpochMs)), Literal(1000L)))),
    // NOTE the *ID codec defaults to epoch 0, not the Twitter epoch
    // (snowflakeIDToDateTime.cpp:77 `UInt64 epoch = 0`, optional arg 2) —
    // round-5 fix; the legacy snowflakeToDateTime above keeps Twitter.
    "snowflakeidtodatetime" -> (args =>
      SecondsToTimestamp(IntegralDivide(
        Add(ShiftRightUnsigned(asLong(args.head), Literal(22)),
          asLong(if (args.length > 1) args(1) else Literal(0L))),
        Literal(1000L)))),
    "uuidv7todatetime" -> (args =>
      SecondsToTimestamp(IntegralDivide(
        Cast(Conv(Substring(RegExpReplace(args.head, Literal("-"), Literal("")),
          Literal(1), Literal(12)), Literal(16), Literal(10)), LongType),
        Literal(1000L)))),
    "today" -> (_ => CurrentDate(None)),
    "yesterday" -> (_ => DateAdd(CurrentDate(None), Literal(-1))),
    // week boundaries (reference default mode 0: Sunday-start)
    "tostartofweek" -> (args =>
      DateSub(Cast(args.head, DateType),
        Subtract(DayOfWeek(args.head), Literal(1)))),
    "tolastdayofweek" -> (args =>
      DateAdd(DateSub(Cast(args.head, DateType),
        Subtract(DayOfWeek(args.head), Literal(1))), Literal(6))),
    // ISO year = calendar year of the Thursday in the same ISO week
    // (Spark's formatter rejects the week-year 'YYYY' pattern)
    "toisoyear" -> (args => {
      val isoDow = Add(Pmod(Add(DayOfWeek(args.head), Literal(5)), Literal(7)),
        Literal(1))
      Year(DateAdd(Cast(args.head, DateType), Subtract(Literal(4), isoDow)))
    }),
    "toyyyymmddhhmmss" -> (args =>
      Cast(DateFormatClass(args.head, Literal("yyyyMMddHHmmss")), LongType)),
    // toTime: keep the time of day, move the date to 1970-01-02
    "totime" -> (args =>
      SecondsToTimestamp(Add(Literal(86400L),
        Add(Multiply(Cast(Hour(args.head), LongType), Literal(3600L)),
          Add(Multiply(Cast(Minute(args.head), LongType), Literal(60L)),
            Cast(Second(args.head), LongType)))))),
    "timeslot" -> (args => floorSeconds(args.head, 1800L)),
    // toRelativeXNum family (DateTimeTransforms.h) — monotone bucket ids
    "torelativeyearnum" -> (args => Year(args.head)),
    "torelativequarternum" -> (args =>
      Add(Multiply(Year(args.head), Literal(4)),
        Subtract(Quarter(args.head), Literal(1)))),
    "torelativemonthnum" -> (args =>
      Add(Multiply(Year(args.head), Literal(12)), Month(args.head))),
    "torelativedaynum" -> (args =>
      DateDiff(Cast(args.head, DateType), Cast(Literal("1970-01-01"), DateType))),
    "torelativehournum" -> (args =>
      IntegralDivide(Cast(args.head, LongType), Literal(3600L))),
    "torelativeminutenum" -> (args =>
      IntegralDivide(Cast(args.head, LongType), Literal(60L))),
    "torelativesecondnum" -> (args => Cast(args.head, LongType)),
    // Monday-aligned weeks since epoch (1970-01-01 was a Thursday)
    "torelativeweeknum" -> (args =>
      IntegralDivide(Add(DateDiff(Cast(args.head, DateType),
        Cast(Literal("1970-01-01"), DateType)), Literal(3)), Literal(7L))),
    // add/subtract unit complement of the core registry
    "addmilliseconds" -> (args =>
      TimestampAdd("MILLISECOND", asLong(args(1)), args(0))),
    "addmicroseconds" -> (args =>
      TimestampAdd("MICROSECOND", asLong(args(1)), args(0))),
    "subtracthours" -> (args =>
      TimestampAdd("HOUR", UnaryMinus(asLong(args(1))), args(0))),
    "subtractminutes" -> (args =>
      TimestampAdd("MINUTE", UnaryMinus(asLong(args(1))), args(0))),
    "subtractseconds" -> (args =>
      TimestampAdd("SECOND", UnaryMinus(asLong(args(1))), args(0))),
    "subtractweeks" -> (args =>
      TimestampAdd("WEEK", UnaryMinus(asLong(args(1))), args(0))),
    "subtractquarters" -> (args =>
      TimestampAdd("QUARTER", UnaryMinus(asLong(args(1))), args(0))),
    "subtractmilliseconds" -> (args =>
      TimestampAdd("MILLISECOND", UnaryMinus(asLong(args(1))), args(0))),
    "subtractmicroseconds" -> (args =>
      TimestampAdd("MICROSECOND", UnaryMinus(asLong(args(1))), args(0))),
    "tostartofsecond" -> (args => TruncTimestamp(Literal("second"), args.head)),
    // interval constructors (toIntervalX → day-time / year-month literals)
    "tointervalday" -> (args =>
      MakeDTInterval(asInt(args.head), Literal(0), Literal(0),
        Cast(Literal(0), DecimalType(18, 6)))),
    "tointervalhour" -> (args =>
      MakeDTInterval(Literal(0), asInt(args.head), Literal(0),
        Cast(Literal(0), DecimalType(18, 6)))),
    "tointervalminute" -> (args =>
      MakeDTInterval(Literal(0), Literal(0), asInt(args.head),
        Cast(Literal(0), DecimalType(18, 6)))),
    "tointervalsecond" -> (args =>
      MakeDTInterval(Literal(0), Literal(0), Literal(0),
        Cast(args.head, DecimalType(18, 6)))),
    "tointervalweek" -> (args =>
      MakeDTInterval(Multiply(asInt(args.head), Literal(7)), Literal(0),
        Literal(0), Cast(Literal(0), DecimalType(18, 6)))),
    "tointervalmonth" -> (args => MakeYMInterval(Literal(0), asInt(args.head))),
    "tointervalquarter" -> (args =>
      MakeYMInterval(Literal(0), Multiply(asInt(args.head), Literal(3)))),
    "tointervalyear" -> (args => MakeYMInterval(asInt(args.head), Literal(0))),

    // timeSlots(start, duration[, size]): slot starts covering the span
    "timeslots" -> (args => {
      val size = if (args.length > 2) asLong(args(2)) else Literal(1800L)
      val start = Multiply(IntegralDivide(asLong(args(0)), size), size)
      val i = lv()
      ArrayTransform(
        Sequence(start, Add(asLong(args(0)), asLong(args(1))), Some(size)),
        LambdaFunction(SecondsToTimestamp(i), Seq(i)))
    }),
    // age('unit', start, end) — truncated whole-unit difference
    "age" -> (args => args(0) match {
      case Literal(u, StringType) =>
        TimestampDiff(u.toString.toUpperCase, args(1), args(2))
      case _ => throw new IllegalArgumentException("age expects a literal unit")
    }),

    // ---- map / tuple tail (FunctionsMapMiscellaneous.cpp, tuple.cpp) ----
    "mapapply" -> (args =>
      ChRegistryArrays.hofWrap(
        MapFromEntries(ZipWith(MapKeys(args(1)), MapValues(args(1)), args(0))))),
    "mapfilter" -> (args => MapFilter(args(1), args(0))),
    "mapexists" -> (args =>
      ChRegistryArrays.hofWrap(
        GreaterThan(Size(MapFilter(args(1), args(0))), Literal(0)))),
    "mapall" -> (args =>
      ChRegistryArrays.hofWrap(
        LessThanOrEqual(Size(MapFilter(args(1), gjoNegate(args(0)))), Literal(0)))),
    "mapconcat" -> (args => MapConcat(args)),
    "mapupdate" -> (args =>
      MapConcat(Seq(
        MapFilter(args(0),
          lam2((k, _) => Not(ArrayContains(MapKeys(args(1)), k)))),
        args(1)))),
    "mapcontainskeylike" -> (args =>
      ArrayExists(MapKeys(args(0)), lam1(k => Like(k, args(1), '\\')))),
    "mapextractkeylike" -> (args =>
      MapFilter(args(0), lam2((k, _) => Like(k, args(1), '\\')))),
    "mapfromarrays" -> (args => MapFromArrays(args(0), args(1))),
    "tuple" -> (args => CreateStruct(args)),
    "tupleelement" -> (args => args(1) match {
      case Literal(i: Int, IntegerType) =>
        UnresolvedExtractValue(args(0), Literal("col" + i))
      case name => UnresolvedExtractValue(args(0), name)
    }),

    // ---- geo (greatCircleDistance.cpp — lon-first argument order) ----
    "greatcircledistance" -> (args =>
      greatCircleMeters(args(0), args(1), args(2), args(3))),
    "geodistance" -> (args =>
      greatCircleMeters(args(0), args(1), args(2), args(3))),
    "greatcircleangle" -> (args =>
      Multiply(Divide(greatCircleMeters(args(0), args(1), args(2), args(3)),
        Literal(6372797.560856d)), Literal(180.0 / math.Pi)))
  )
}
