package graft.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._

/** Round-10 registry sweep #8 (final diff pass of the reference
  * registration list):
  *  - dateDiff / date_diff with the reference's BOUNDARY semantics
  *    (dateDiff.cpp: difference of unit boundaries, so
  *    dateDiff('year', '2023-12-31', '2024-01-01') = 1) — polymorphic:
  *    the 2-arg spelling keeps Spark's datediff behavior;
  *  - roundBankers (half-even — Spark's bround), roundDown (largest
  *    boundary-array element ≤ x), pmodOrNull lanes,
  *    isNotDistinctFrom, isNullable;
  *  - session introspection: database/current_database,
  *    currentSchemas, connection_id, currentProfiles /
  *    enabledProfiles / defaultProfiles (the settings-profile names
  *    covering the session user), generateSerialID (per-name
  *    monotonic counter — the single-node mapping of the Keeper
  *    counter), partitionID (the values' partition-id string);
  *  - byteSize (reference sizing contract: fixed types = sizeof,
  *    String = length + 9);
  *  - convertCharset (Java charset codecs), randomStringUTF8,
  *    hasSubsequence UTF8/case-insensitive spellings,
  *    extractAllGroups (the vertical alias), reinterpretAsUUID
  *    (the documented byte-layout example is pinned).
  */
object ChRegistryTail8 {

  private val kCls = classOf[graft.functions.SweepKernels8.type]
  private def kernel(ret: DataType, method: String, args: Seq[Expression],
      types: Seq[DataType]): Expression =
    StaticInvoke(kCls, ret, method, args, types)

  private def unitLit(e: Expression): String = e match {
    case Literal(s, StringType) if s != null => s.toString.toLowerCase
    case _ => throw new IllegalArgumentException(
      "dateDiff: the unit must be a string literal")
  }

  /** Boundary-count difference per the reference (dateDiff.cpp uses
    * toRelative<Unit>Num(b) − toRelative<Unit>Num(a)). */
  private def boundaryDiff(unit: String, a0: Expression, b0: Expression)
      : Expression = {
    def ts(e: Expression) = Cast(e, TimestampType)
    def dt(e: Expression) = Cast(e, DateType)
    def epochDiv(div: Long) = Subtract(
      IntegralDivide(UnixSeconds(ts(b0)), Literal(div)),
      IntegralDivide(UnixSeconds(ts(a0)), Literal(div)))
    unit match {
      case "second" | "seconds" | "ss" | "s" =>
        Subtract(UnixSeconds(ts(b0)), UnixSeconds(ts(a0)))
      case "minute" | "minutes" | "mi" | "n" => epochDiv(60L)
      case "hour" | "hours" | "hh" | "h" => epochDiv(3600L)
      case "day" | "days" | "dd" | "d" =>
        Cast(DateDiff(dt(b0), dt(a0)), LongType)
      case "week" | "weeks" | "wk" | "ww" =>
        Cast(IntegralDivide(
          DateDiff(TruncDate(dt(b0), Literal("week")),
            TruncDate(dt(a0), Literal("week"))), Literal(7)), LongType)
      case "month" | "months" | "mm" | "m" =>
        Cast(Subtract(
          Add(Multiply(Year(dt(b0)), Literal(12)), Month(dt(b0))),
          Add(Multiply(Year(dt(a0)), Literal(12)), Month(dt(a0)))), LongType)
      case "quarter" | "quarters" | "qq" | "q" =>
        Cast(Subtract(
          Add(Multiply(Year(dt(b0)), Literal(4)), Quarter(dt(b0))),
          Add(Multiply(Year(dt(a0)), Literal(4)), Quarter(dt(a0)))), LongType)
      case "year" | "years" | "yyyy" | "yy" =>
        Cast(Subtract(Year(dt(b0)), Year(dt(a0))), LongType)
      case other => throw new IllegalArgumentException(
        s"dateDiff: unsupported unit '$other'")
    }
  }

  /** The reference's quoted-unit form reaches this builder as
    * chDateDiff — Spark's parser owns the `datediff` NAME (it demands
    * an unquoted unit keyword and rejects the string form at parse
    * time), so the dialect rewrite renames CH-spelled calls before
    * parsing. Spark's own 2-arg/unquoted forms pass through untouched. */
  private def dateDiffBuilder(args: Seq[Expression]): Expression =
    if (args.size >= 3) boundaryDiff(unitLit(args.head), args(1), args(2))
    else DateDiff(args(0), args(1)) // Spark's 2-arg days form

  private def profileArray(kind: String): Expression = {
    val names = org.apache.spark.sql.SparkSession.getActiveSession
      .map(s => AccessControl.profilesFor(s, kind)).getOrElse(Seq.empty)
    CreateArray(names.map(n => Literal(n): Expression))
  }

  val builders: Map[String, Seq[Expression] => Expression] = Map(
    "chdatediff" -> (dateDiffBuilder _),
    "roundbankers" -> (args =>
      BRound(args.head, args.lift(1).getOrElse(Literal(0)))),
    "rounddown" -> (args => kernel(DoubleType, "roundDown",
      Seq(Cast(args(0), DoubleType), Cast(args(1), ArrayType(DoubleType))),
      Seq(DoubleType, ArrayType(DoubleType)))),
    "isnotdistinctfrom" -> (args => EqualNullSafe(args(0), args(1))),
    "pmodornull" -> (args => pmodOrNull(args)),
    "positivemoduloornull" -> (args => pmodOrNull(args)),
    "positive_modulo_or_null" -> (args => pmodOrNull(args)),
    "isnullable" -> (args => Literal(args.head.nullable)),
    // current_database resolves through the value-identical Spark
    // builtin (deliberately unshadowed); `database` is the CH alias
    "database" -> (_ => Literal("default")),
    "currentschemas" -> (_ => CreateArray(Seq(Literal("default")))),
    "current_schemas" -> (_ => CreateArray(Seq(Literal("default")))),
    "connectionid" -> (_ => Literal(0L)),
    "connection_id" -> (_ => Literal(0L)),
    "currentprofiles" -> (_ => profileArray("current")),
    "enabledprofiles" -> (_ => profileArray("enabled")),
    "defaultprofiles" -> (_ => profileArray("default")),
    "generateserialid" -> (args => kernel(LongType, "generateSerialId",
      Seq(Cast(args.head, StringType)), Seq(StringType))),
    "partitionid" -> (args =>
      ConcatWs(Literal("-") +: args.map(Cast(_, StringType)))),
    "bytesize" -> (args =>
      org.apache.spark.sql.graft.ByteSizeOf(args.head)),
    "convertcharset" -> (args => kernel(StringType, "convertCharset",
      Seq(Cast(args(0), BinaryType), Cast(args(1), StringType),
        Cast(args(2), StringType)),
      Seq(BinaryType, StringType, StringType))),
    "randomstringutf8" -> (args => kernel(StringType, "randomStringUtf8",
      Seq(Cast(args.head, IntegerType)), Seq(IntegerType))),
    "hassubsequenceutf8" -> (args => delegate("hassubsequence", args)),
    "hassubsequencecaseinsensitiveutf8" -> (args =>
      delegate("hassubsequencecaseinsensitive", args)),
    "extractallgroups" -> (args =>
      delegate("extractallgroupsvertical", args)),
    "reinterpretasuuid" -> (args => kernel(StringType, "reinterpretAsUuid",
      Seq(Cast(args.head, BinaryType)), Seq(BinaryType))),
    // getSubcolumn(x, 'name') (getSubcolumn.cpp): named member access
    // resolved by the analyzer — struct fields, map keys, array elements
    "getsubcolumn" -> (args => args(1) match {
      case Literal(s, StringType) if s != null =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(
          args.head, Literal(s.toString))
      case _ => throw new IllegalArgumentException(
        "getSubcolumn: the subcolumn name must be a string literal")
    }),
    // validateNestedArraySizes (validateNestedArraySizes.cpp): every
    // argument array has the same length
    "validatenestedarraysizes" -> (args =>
      args.map(a => Size(a): Expression).sliding(2).map {
        case Seq(a, b) => EqualTo(a, b): Expression
        case _ => Literal(true): Expression
      }.reduceOption[Expression](And).getOrElse(Literal(true))),
    // pointInEllipses(x, y, x0, y0, a0, b0, …) (pointInEllipses.cpp):
    // inside ANY of the ellipses
    "pointinellipses" -> (args => {
      val x = Cast(args(0), DoubleType)
      val y = Cast(args(1), DoubleType)
      args.drop(2).grouped(4).map { g =>
        val Seq(x0, y0, a, b) = g.map(Cast(_, DoubleType)).toSeq
        val dx = Divide(Subtract(x, x0), a)
        val dy = Divide(Subtract(y, y0), b)
        LessThanOrEqual(Add(Multiply(dx, dx), Multiply(dy, dy)),
          Literal(1.0)): Expression
      }.reduce(Or)
    }),
    "fromunixtimestampinjodasyntax" -> (args =>
      DateFormatClass(SecondsToTimestamp(Cast(args.head, LongType)),
        args(1))))

  private def pmodOrNull(args: Seq[Expression]): Expression = {
    val b = args(1)
    If(Or(IsNull(b), EqualTo(Cast(b, DoubleType), Literal(0.0))),
      Literal.create(null, DoubleType),
      Cast(Pmod(Cast(args(0), DoubleType), Cast(b, DoubleType)), DoubleType))
  }

  private def delegate(name: String,
      args: Seq[Expression]): Expression =
    ChFunctionRegistry.builders.getOrElse(name,
      throw new IllegalArgumentException(s"no base builder $name"))(args)
}
