package graft.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._
import org.apache.spark.sql.graft.ExprColumn

/** Round-11 registry sweep #9 — the FINAL diff of the reference's
  * registration surface (extracted from `registerFunction` /
  * `registerAlias` / class-name constants across src/Functions and
  * src/AggregateFunctions, audited with graft.tools.NameAudit against
  * the installed registry). ~150 names close here; the remaining
  * residue is documented BY CATEGORY in FUNCTIONS.md §"Sweep #9
  * residue" with the reason each category stays out (external data
  * files, debug introspection, parser-internal spellings, block-order
  * semantics, …).
  *
  * Composite aggregate trees wrap each AggregateFunction in its
  * AggregateExpression explicitly (the analyzer only auto-wraps a
  * top-level one).
  */
object ChRegistryTail9 {

  private val kCls = classOf[graft.functions.SweepKernels9.type]
  private def kernel(ret: DataType, method: String, args: Seq[Expression],
      types: Seq[DataType]): Expression =
    StaticInvoke(kCls, ret, method, args, types)

  private def foldInt(e: Expression): Int = e.eval() match {
    case n: Number => n.intValue
    case other => throw new IllegalArgumentException(
      s"expected an integer literal, got $other")
  }
  private def foldDouble(e: Expression): Double = e.eval() match {
    case n: Number => n.doubleValue
    case other => throw new IllegalArgumentException(
      s"expected a numeric literal, got $other")
  }
  private def foldStr(e: Expression): String = e.eval() match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.toString
    case other => throw new IllegalArgumentException(
      s"expected a string literal, got $other")
  }

  private def agg(f: AggregateFunction): Expression =
    f.toAggregateExpression()
  private def asDouble(e: Expression): Expression = Cast(e, DoubleType)
  private def asLong(e: Expression): Expression = Cast(e, LongType)

  /** (value, pair-second) rows collected per group for the
    * array-kernel aggregates. */
  private def collectedPairs(a: Expression, b: Expression): Expression =
    agg(CollectList(CreateStruct(Seq(asDouble(a), asDouble(b)))))
  private val pairArrayType =
    ArrayType(StructType(Seq(StructField("a", DoubleType),
      StructField("b", DoubleType))))

  // ---- dictGet typed lanes: Dictionaries already serves the numeric/
  // string/date/uuid family — only the IPv4/IPv6 lanes were missing
  // (FunctionsExternalDictionaries.h; IP attributes ride the string
  // rendering, the engine's IP carrier) --------------------------------

  private def dictLanes: Map[String, Seq[Expression] => Expression] =
    Seq("ipv4", "ipv6").flatMap { suffix =>
      Seq(
        s"dictget$suffix" -> ((args: Seq[Expression]) =>
          Cast(Dictionaries.builders("dictget")(args), StringType)),
        s"dictget${suffix}ordefault" -> ((args: Seq[Expression]) =>
          Cast(Dictionaries.builders("dictgetordefault")(args), StringType)))
    }.toMap

  // ---- median* = the matching quantile engine at level 0.5
  // (AggregateFunctionQuantile.cpp registers a median alias per
  // engine) --------------------------------------------------------------

  private def medianLanes: Map[String, Seq[Expression] => Expression] = {
    def q(engine: String)(args: Seq[Expression]): Expression =
      ChFunctionRegistry.builders(engine)(args :+ Literal(0.5))
    // weighted engines put the level LAST after (x, weight)
    Map(
      "medianbfloat16" -> (args =>
        new ApproximatePercentile(args.head, Literal(0.5))),
      "medianbfloat16weighted" -> (args =>
        new Percentile(args(0), Literal(0.5), args(1))),
      "mediandd" -> (args => q("quantiledd")(args)),
      "mediandeterministic" -> (args =>
        new ApproximatePercentile(args.head, Literal(0.5))),
      "medianexacthigh" -> (args =>
        ChFunctionRegistry.builders("quantileexacthigh")(
          args :+ Literal(0.5))),
      "medianexactlow" -> (args =>
        ChFunctionRegistry.builders("quantileexactlow")(
          args :+ Literal(0.5))),
      "medianexactweighted" -> (args =>
        new Percentile(args(0), Literal(0.5), args(1))),
      "medianexactweightedinterpolated" -> (args =>
        new Percentile(args(0), Literal(0.5), args(1))),
      "mediangk" -> (args =>
        new ApproximatePercentile(args.head, Literal(0.5))),
      "medianinterpolatedweighted" -> (args =>
        new Percentile(args(0), Literal(0.5), args(1))),
      "mediantdigest" -> (args => q("quantiletdigest")(args)),
      "mediantdigestweighted" -> (args =>
        new Percentile(args(0), Literal(0.5), args(1))),
      "mediantiming" -> (args => q("quantiletiming")(args)),
      "mediantimingweighted" -> (args =>
        new Percentile(args(0), Literal(0.5), args(1))))
  }

  // ---- the sweep ----------------------------------------------------

  val builders: Map[String, Seq[Expression] => Expression] =
    dictLanes ++ medianLanes ++ Map[String, Seq[Expression] => Expression](

    // struct reshaping (tupleToNameValuePairs.cpp, flattenTuple.cpp)
    "tupletonamevaluepairs" -> (args =>
      graft.functions.TupleReshape.TupleToNameValuePairs(args.head)),
    "flattentuple" -> (args =>
      graft.functions.TupleReshape.FlattenTuple(args.head)),

    // errorCodeToName (errorCodeToName.cpp over the ErrorCodes.cpp
    // table transcribed as data) — empty string for unknown codes
    "errorcodetoname" -> (args => kernel(StringType, "name",
      Seq(asLong(args.head)), Seq(LongType))),

    // ---- alias closures over existing machinery ----
    "regexp_matches" -> (args => RLike(args(0), args(1))),
    "casewithoutexpr" -> (args => ChFunctionRegistry.builders("multiif")(args)),
    "casewithoutexpression" -> (args =>
      ChFunctionRegistry.builders("multiif")(args)),
    "concatwithseparatorassumeinjective" -> (args =>
      ChFunctionRegistry.builders("concatwithseparator")(args)),
    "corrstable" -> (args => Corr(asDouble(args(0)), asDouble(args(1)))),
    "covarpopstable" -> (args =>
      CovPopulation(asDouble(args(0)), asDouble(args(1)))),
    "covarsampstable" -> (args =>
      CovSample(asDouble(args(0)), asDouble(args(1)))),
    "trybase64urldecode" -> (args =>
      TryEval(ChFunctionRegistry.builders("base64urldecode")(args))),
    "extractkeyvaluepairswithescaping" -> (args =>
      ChFunctionRegistry.builders("extractkeyvaluepairs")(args)),
    "str_to_date" -> (args =>
      ChFunctionRegistry.builders("parsedatetimeornull")(args)),
    // timestampDiff / timestamp_diff are reference aliases of dateDiff —
    // Spark's parser OWNS those names (unquoted-unit grammar), so the
    // quoted-unit CH spelling renames to chDateDiff in the pre-parse
    // rewrite, exactly like dateDiff (ClickHouseSql.rewrite)
    // date_bin / time_bucket are reference aliases of toStartOfInterval
    "date_bin" -> (args =>
      ChFunctionRegistry.builders("tostartofinterval")(args)),
    "time_bucket" -> (args =>
      ChFunctionRegistry.builders("tostartofinterval")(args)),
    "yyyymmddhhmmsstodatetime64" -> (args =>
      // DateTime64 rides the micros timestamp carrier — same instant,
      // the precision argument is accepted and absorbed (documented)
      ChFunctionRegistry.builders("yyyymmddhhmmsstodatetime")(
        Seq(args.head))),

    // RespectNulls spellings (AggregateFunctionAny.cpp respect_nulls
    // registrations): First/Last with ignoreNulls = false
    "anyrespectnulls" -> (args => First(args.head, ignoreNulls = false)),
    "any_respect_nulls" -> (args => First(args.head, ignoreNulls = false)),
    "anyvaluerespectnulls" -> (args => First(args.head, ignoreNulls = false)),
    "any_value_respect_nulls" -> (args =>
      First(args.head, ignoreNulls = false)),
    "firstvaluerespectnulls" -> (args =>
      First(args.head, ignoreNulls = false)),
    "first_value_respect_nulls" -> (args =>
      First(args.head, ignoreNulls = false)),
    "anylastrespectnulls" -> (args => Last(args.head, ignoreNulls = false)),
    "anylast_respect_nulls" -> (args => Last(args.head, ignoreNulls = false)),
    "lastvaluerespectnulls" -> (args => Last(args.head, ignoreNulls = false)),
    "last_value_respect_nulls" -> (args =>
      Last(args.head, ignoreNulls = false)),

    // groupBit* (AggregateFunctionBitwise.cpp) — Spark's bit aggregates
    "groupbitand" -> (args => BitAndAgg(args.head)),
    "groupbitor" -> (args => BitOrAgg(args.head)),
    "groupbitxor" -> (args => BitXorAgg(args.head)),

    // groupConcat[(sep)] (AggregateFunctionGroupConcat.cpp): join the
    // collected values; input order is unspecified in both engines
    "groupconcat" -> (args =>
      ArrayJoin(agg(CollectList(Cast(args.head, StringType))),
        if (args.length > 1) args(1) else Literal(""), None)),
    "group_concat" -> (args =>
      ArrayJoin(agg(CollectList(Cast(args.head, StringType))),
        if (args.length > 1) args(1) else Literal(""), None)),

    // groupArraySorted(n)(x) (AggregateFunctionGroupArraySorted.cpp):
    // the n smallest values, ascending
    "grouparraysorted" -> (args =>
      Slice(new SortArray(agg(CollectList(args.head))), Literal(1),
        if (args.length > 1) args(1) else Literal(10))),

    // skew/kurt (AggregateFunctionStatisticsSimple.cpp): Spark's
    // skewness IS the population skewness g1 = m3/m2^1.5 and kurtosis
    // the population EXCESS kurtosis; CH's Pop forms are the raw
    // moments ratio and the Samp forms divide by sample moments —
    // algebra over (g1, g2, n), no new aggregation state
    "skewpop" -> (args => agg(Skewness(asDouble(args.head)))),
    "skewsamp" -> (args => {
      val n = asDouble(agg(Count(args.head)))
      Multiply(agg(Skewness(asDouble(args.head))),
        Pow(Divide(Subtract(n, Literal(1.0)), n), Literal(1.5)))
    }),
    "kurtpop" -> (args =>
      Add(agg(Kurtosis(asDouble(args.head))), Literal(3.0))),
    "kurtsamp" -> (args => {
      val n = asDouble(agg(Count(args.head)))
      val ratio = Divide(Subtract(n, Literal(1.0)), n)
      Multiply(Add(agg(Kurtosis(asDouble(args.head))), Literal(3.0)),
        Multiply(ratio, ratio))
    }),

    // sumCount (AggregateFunctionSumCount.cpp): (sum, count) tuple
    "sumcount" -> (args => CreateNamedStruct(Seq(
      Literal("sum"), agg(Sum(args.head)),
      Literal("count"), agg(Count(args.head))))),

    // boundingRatio (AggregateFunctionBoundingRatio.h): slope between
    // the leftmost and rightmost points = Δy(extreme xs)/Δx
    "boundingratio" -> (args => {
      val x = asDouble(args(0)); val y = asDouble(args(1))
      Divide(
        Subtract(agg(MaxBy(y, x)), agg(MinBy(y, x))),
        Subtract(agg(Max(x)), agg(Min(x))))
    }),

    // simpleLinearRegression (AggregateFunctionSimpleLinearRegression
    // .cpp): least-squares (k, b) via Spark's regr_* aggregates
    "simplelinearregression" -> (args => {
      val x = asDouble(args(0)); val y = asDouble(args(1))
      CreateNamedStruct(Seq(
        Literal("k"), agg(RegrSlope(y, x)),
        Literal("b"), agg(RegrIntercept(y, x))))
    }),

    // retention (AggregateFunctionRetention.cpp): r[0] = max(cond1),
    // r[i] = max(cond1 AND cond_i) — an array of aggregate lanes
    "retention" -> (args => CreateArray(
      Cast(agg(Max(Cast(args.head, BooleanType))), IntegerType) +:
        args.tail.map(c => Cast(agg(Max(And(Cast(args.head, BooleanType),
          Cast(c, BooleanType)))), IntegerType)))),

    // uniqUpTo(n)(x) (AggregateFunctionUniqUpTo.h): "more than n"
    // reports n+1 — LEAST(uniqExact, n+1)
    "uniqupto" -> (args => Least(Seq(
      Count(Seq(args.head)).toAggregateExpression(isDistinct = true),
      asLong(Add(args(1), Literal(1)))))),

    // topK / topKWeighted + the approx_top_* aliases
    // (AggregateFunctionTopK.cpp; exact map under the hood — the
    // SpaceSaving-capped lane is CustomAggregates.topKApprox)
    "topk" -> (args => ExprColumn.resolvedExpression(
      graft.functions.aggregates.CustomAggregates.topK(
        if (args.length > 1) foldInt(args(1)) else 10)(
        ExprColumn.column(Cast(args.head, StringType))))),
    "approx_top_count" -> (args => ExprColumn.resolvedExpression(
      graft.functions.aggregates.CustomAggregates.topK(
        if (args.length > 1) foldInt(args(1)) else 10)(
        ExprColumn.column(Cast(args.head, StringType))))),
    "topkweighted" -> (args => ExprColumn.resolvedExpression(
      graft.functions.aggregates.CustomAggregates.topKWeighted(
        if (args.length > 2) foldInt(args(2)) else 10)(
        ExprColumn.column(Cast(args(0), StringType)),
        ExprColumn.column(asLong(args(1)))))),
    "approx_top_sum" -> (args => ExprColumn.resolvedExpression(
      graft.functions.aggregates.CustomAggregates.topKWeighted(
        if (args.length > 2) foldInt(args(2)) else 10)(
        ExprColumn.column(Cast(args(0), StringType)),
        ExprColumn.column(asLong(args(1)))))),

    // sumMap / minMap / maxMap SQL spellings + the MappedArrays
    // aliases (AggregateFunctionSumMap.cpp; typed aggregators —
    // string-rendered keys, fixed-point sums: documented carrier)
    "summap" -> (args => mapAgg("sum", args)),
    "summappedarrays" -> (args => mapAgg("sum", args)),
    "summapwithoverflow" -> (args => mapAgg("sum", args)),
    "minmap" -> (args => mapAgg("min", args)),
    "minmappedarrays" -> (args => mapAgg("min", args)),
    "maxmap" -> (args => mapAgg("max", args)),
    "maxmappedarrays" -> (args => mapAgg("max", args)),

    // windowFunnel(window)(ts, cond1..condN)
    // (AggregateFunctionWindowFunnel.cpp): greedy-from-earliest chain
    // depth within the window — the registered SQL spelling of the
    // existing typed aggregator
    "windowfunnel" -> (args => {
      val conds = args.tail.dropRight(1)
      val window = foldDouble(args.last).toLong * 1000000L
      val step = conds.zipWithIndex.foldRight(Literal(-1): Expression) {
        case ((c, i), els) =>
          If(Cast(c, BooleanType), Literal(i), els)
      }
      ExprColumn.resolvedExpression(
        graft.functions.aggregates.CustomAggregates.windowFunnel(
          window, conds.length)(
          ExprColumn.column(UnixMicros(Cast(args.head, TimestampType))),
          ExprColumn.column(step)))
    }),

    // sequenceMatch / sequenceCount (AggregateFunctionSequenceMatch.h)
    // — the (?N)/.* pattern subset over a per-group event buffer
    "sequencematch" -> (args => {
      val conds = args.tail.dropRight(1)
      kernel(BooleanType, "sequenceMatch",
        Seq(args.last, seqEvents(args.head, conds)),
        Seq(StringType, seqPairType))
    }),
    "sequencecount" -> (args => {
      val conds = args.tail.dropRight(1)
      kernel(LongType, "sequenceCount",
        Seq(args.last, seqEvents(args.head, conds)),
        Seq(StringType, seqPairType))
    }),

    // exponentialMovingAverage(halfLife)(v, t)
    "exponentialmovingaverage" -> (args =>
      kernel(DoubleType, "exponentialMovingAverage",
        Seq(collectedPairs(args(0), args(1)), args(2)),
        Seq(pairArrayType, DoubleType))),

    // rank correlation + the two t tests (p-values from the published
    // incomplete-beta formulas — see SweepKernels9)
    "rankcorr" -> (args =>
      kernel(DoubleType, "rankCorr",
        Seq(collectedPairs(args(0), args(1))), Seq(pairArrayType))),
    "studentttest" -> (args =>
      kernel(ttestType, "studentTTest",
        Seq(agg(CollectList(CreateStruct(Seq(asDouble(args(0)),
          asLong(args(1))))))),
        Seq(ArrayType(StructType(Seq(StructField("v", DoubleType),
          StructField("s", LongType))))))),
    "welchttest" -> (args =>
      kernel(ttestType, "welchTTest",
        Seq(agg(CollectList(CreateStruct(Seq(asDouble(args(0)),
          asLong(args(1))))))),
        Seq(ArrayType(StructType(Seq(StructField("v", DoubleType),
          StructField("s", LongType))))))),

    // lttb(n)(x, y) — Steinarsson's published downsampler
    "lttb" -> (args =>
      kernel(ArrayType(StructType(Seq(StructField("x", DoubleType),
        StructField("y", DoubleType)))), "lttb",
        Seq(collectedPairs(args(0), args(1)), Cast(args(2), IntegerType)),
        Seq(pairArrayType, IntegerType))),
    "largesttrianglethreebuckets" -> (args =>
      kernel(ArrayType(StructType(Seq(StructField("x", DoubleType),
        StructField("y", DoubleType)))), "lttb",
        Seq(collectedPairs(args(0), args(1)), Cast(args(2), IntegerType)),
        Seq(pairArrayType, IntegerType))),

    // sparkbar(width)(x, y)
    "sparkbar" -> (args =>
      kernel(StringType, "sparkbar",
        Seq(collectedPairs(args(0), args(1)), Cast(args(2), IntegerType)),
        Seq(pairArrayType, IntegerType))),

    // arrayPRAUC: the reference's primary spelling of the registered
    // arrayAUCPR lane (Tail3 — NULL when no positive labels, the
    // property-pinned contract)
    "arrayprauc" -> (args =>
      ChRegistryTail3.builders("arrayaucpr")(args)),

    // groupArrayIntersect — kernel over the collected arrays
    "grouparrayintersect" -> (args =>
      kernel(ArrayType(LongType), "groupArrayIntersect",
        Seq(agg(CollectList(Cast(args.head, ArrayType(LongType))))),
        Seq(ArrayType(ArrayType(LongType))))),

    // ---- small kernels ----
    "toweekyear" -> (args => kernel(IntegerType, "toWeekYear",
      Seq(Cast(args.head, DateType)), Seq(DateType))),
    "toweekofweekyear" -> (args => kernel(IntegerType, "toWeekOfWeekYear",
      Seq(Cast(args.head, DateType)), Seq(DateType))),
    "timezoneoffset" -> (args => tzOffset(args)),
    "tobfloat16" -> (args => kernel(FloatType, "toBFloat16",
      Seq(asDouble(args.head)), Seq(DoubleType))),
    "tobfloat16ornull" -> (args => TryEval(kernel(FloatType, "toBFloat16",
      Seq(asDouble(args.head)), Seq(DoubleType)))),
    "tobfloat16orzero" -> (args => Coalesce(Seq(
      TryEval(kernel(FloatType, "toBFloat16",
        Seq(asDouble(args.head)), Seq(DoubleType))),
      Literal(0.0f)))),
    "ipv6cidrtorange" -> (args => kernel(
      StructType(Seq(StructField("lo", StringType),
        StructField("hi", StringType))),
      "ipv6CidrToRange",
      Seq(Cast(args(0), StringType), Cast(args(1), IntegerType)),
      Seq(StringType, IntegerType))),
    "cutipv6" -> (args => kernel(StringType, "cutIPv6",
      Seq(Cast(args(0), StringType), Cast(args(1), IntegerType),
        Cast(args(2), IntegerType)),
      Seq(StringType, IntegerType, IntegerType))),
    "filesystemavailable" -> (_ => kernel(LongType, "filesystemAvailable",
      Nil, Nil)),
    "filesystemcapacity" -> (_ => kernel(LongType, "filesystemCapacity",
      Nil, Nil)),
    "filesystemunreserved" -> (_ => kernel(LongType, "filesystemUnreserved",
      Nil, Nil)),

    // OrDefault conversion tails = COALESCE(OrNull, default)
    "todecimal32ordefault" -> (args => orDefault("todecimal32ornull", args)),
    "todecimal64ordefault" -> (args => orDefault("todecimal64ornull", args)),
    "todecimal128ordefault" -> (args =>
      orDefault("todecimal128ornull", args)),
    "todecimal256ordefault" -> (args =>
      orDefault("todecimal256ornull", args)),
    "touuidordefault" -> (args => orDefault("touuidornull", args)),
    "toipv4ordefault" -> (args => orDefault("toipv4ornull", args))
  )

  private val ttestType = StructType(Seq(
    StructField("t_statistic", DoubleType),
    StructField("p_value", DoubleType)))

  private def tzOffset(args: Seq[Expression]): Expression = {
    val tz = if (args.length > 1) Cast(args(1), StringType)
      else Literal("UTC")
    kernel(IntegerType, "timeZoneOffset",
      Seq(UnixMicros(Cast(args.head, TimestampType)), tz),
      Seq(LongType, StringType))
  }

  private def orDefault(orNullName: String,
      args: Seq[Expression]): Expression = {
    val base = ChFunctionRegistry.builders(orNullName)(Seq(args.head) ++
      args.drop(2))
    if (args.length > 1) Coalesce(Seq(base, Cast(args(1), base.dataType)))
    else base
  }

  /** Quantile-style params arrive appended after the main args (the
    * parametric rewrite). sumMapFiltered(keys)(k, v) → (k, v, keys):
    * filter the key lane before aggregation. */
  private def mapAgg(op: String, args: Seq[Expression]): Expression = {
    val key0 = Cast(args(0), StringType)
    val key =
      if (args.length > 2) // sumMapFiltered keys literal
        If(ArrayContains(Cast(args(2), ArrayType(StringType)), key0),
          key0, Literal.create(null, StringType))
      else key0
    val value = asDouble(args(1))
    val c = op match {
      case "sum" => graft.functions.aggregates.CustomAggregates.sumMap(
        ExprColumn.column(key), ExprColumn.column(value))
      case "min" => graft.functions.aggregates.CustomAggregates.minMap(
        ExprColumn.column(key), ExprColumn.column(value))
      case _ => graft.functions.aggregates.CustomAggregates.maxMap(
        ExprColumn.column(key), ExprColumn.column(value))
    }
    ExprColumn.resolvedExpression(c)
  }

  /** The value's UTF-8 byte image: strings/binaries byte-identical;
    * other types hash their string rendering (documented — the
    * stand-ins hashed a Spark-typed image, so the single-arg string
    * lane is the one with a reference contract to honor). */
  private def bytesOf(e: Expression): Expression =
    Cast(Cast(e, StringType), BinaryType)

  private def realHash(args: Seq[Expression], ret: DataType,
      method: String): Expression =
    if (args.length == 1)
      kernel(ret, method, Seq(bytesOf(args.head)), Seq(BinaryType))
    else if (ret == BinaryType)
      StaticInvoke(classOf[graft.functions.HashKernels.type], BinaryType,
        "hash128", Seq(XxHash64(args, 42L), XxHash64(args, 7L)),
        Seq(LongType, LongType))
    else XxHash64(args, 42L)

  /** Per-row (tsMicros, condition bitmask) struct for the sequence
    * kernels, collected per group. */
  private val seqPairType = ArrayType(StructType(Seq(
    StructField("ts", LongType), StructField("mask", LongType))))
  private def seqEvents(ts: Expression,
      conds: Seq[Expression]): Expression = {
    val mask = conds.zipWithIndex.map { case (c, i) =>
      If(Cast(c, BooleanType), Literal(1L << i), Literal(0L))
    }.reduceLeft[Expression]((a, b) => BitwiseOr(a, b))
    agg(CollectList(CreateStruct(Seq(
      UnixMicros(Cast(ts, TimestampType)), mask))))
  }

  /** sumMapFiltered spellings route through mapAgg's filtered lane. */
  val filteredBuilders: Map[String, Seq[Expression] => Expression] = Map(
    "summapfiltered" -> (args => mapAgg("sum", args)),
    "summapfilteredwithoverflow" -> (args => mapAgg("sum", args)))

  // ---- wave 2: interval sweeps, remaining statistical tests, bitmap
  // aggregates, and the last alias closures ----------------------------

  private def bitmapColumn(name: String, c: Expression)
      : Expression = {
    val col = ExprColumn.column(c)
    val out = name match {
      case "build" => graft.functions.BitmapFunctions.bitmapBuildAgg(col)
      case "and" => graft.functions.BitmapFunctions.bitmapAndAgg(col)
      case "or" => graft.functions.BitmapFunctions.bitmapOrAgg(col)
      case _ => graft.functions.BitmapFunctions.bitmapXorAgg(col)
    }
    ExprColumn.resolvedExpression(out)
  }

  private def intervalsOf(args: Seq[Expression]): Expression =
    collectedPairs(args(0), args(1))

  private def tsPair(args: Seq[Expression]): Expression =
    agg(CollectList(CreateStruct(Seq(asDouble(args(0)), asLong(args(1))))))
  private val tsPairType = ArrayType(StructType(Seq(
    StructField("v", DoubleType), StructField("s", LongType))))

  val builders2: Map[String, Seq[Expression] => Expression] = Map(
    // entropy (AggregateFunctionEntropy.h): Shannon bits over the
    // value distribution — per-group frequency kernel
    "entropy" -> (args =>
      kernel(DoubleType, "entropy",
        Seq(agg(CollectList(Cast(args.head, StringType)))),
        Seq(ArrayType(StringType)))),

    // histogram(bins)(x): equal-width (lower, upper, height) triples
    // (adaptive-merge bin EDGES differ — documented in the kernel)
    "histogram" -> (args =>
      kernel(ArrayType(StructType(Seq(StructField("lower", DoubleType),
        StructField("upper", DoubleType),
        StructField("height", DoubleType)))), "histogram",
        Seq(agg(CollectList(asDouble(args.head))),
          Cast(args.lift(1).getOrElse(Literal(10)), IntegerType)),
        Seq(ArrayType(DoubleType), IntegerType))),

    // groupBitmap family (AggregateFunctionGroupBitmap.cpp) over the
    // session's Roaring carrier: cardinality of the built / combined
    // bitmap state
    "groupbitmap" -> (args =>
      ChFunctionRegistry.builders("bitmapcardinality")(
        Seq(bitmapColumn("build", asLong(args.head))))),
    "groupbitmapand" -> (args =>
      ChFunctionRegistry.builders("bitmapcardinality")(
        Seq(bitmapColumn("and", args.head)))),
    "groupbitmapor" -> (args =>
      ChFunctionRegistry.builders("bitmapcardinality")(
        Seq(bitmapColumn("or", args.head)))),
    "groupbitmapxor" -> (args =>
      ChFunctionRegistry.builders("bitmapcardinality")(
        Seq(bitmapColumn("xor", args.head)))),

    // interval sweeps (AggregateFunctionMaxIntersections.cpp,
    // AggregateFunctionIntervalLengthSum.h)
    "maxintersections" -> (args =>
      kernel(LongType, "maxIntersections", Seq(intervalsOf(args)),
        Seq(pairArrayType))),
    "maxintersectionsposition" -> (args =>
      kernel(DoubleType, "maxIntersectionsPosition", Seq(intervalsOf(args)),
        Seq(pairArrayType))),
    "intervallengthsum" -> (args =>
      kernel(DoubleType, "intervalLengthSum", Seq(intervalsOf(args)),
        Seq(pairArrayType))),

    // remaining statistical tests (p-values from the published
    // erfc / incomplete-beta / Kolmogorov-series formulas)
    "meanztest" -> (args =>
      kernel(ttestType, "meanZTest",
        Seq(tsPair(Seq(args(0), args(1))), asDouble(args(2)),
          asDouble(args(3))),
        Seq(tsPairType, DoubleType, DoubleType))),
    "mannwhitneyutest" -> (args =>
      kernel(StructType(Seq(StructField("u_statistic", DoubleType),
        StructField("p_value", DoubleType))), "mannWhitneyUTest",
        Seq(tsPair(args.take(2))), Seq(tsPairType))),
    "kolmogorovsmirnovtest" -> (args =>
      kernel(StructType(Seq(StructField("d_statistic", DoubleType),
        StructField("p_value", DoubleType))), "kolmogorovSmirnovTest",
        Seq(tsPair(args.take(2))), Seq(tsPairType))),
    "analysisofvariance" -> (args =>
      kernel(StructType(Seq(StructField("f_statistic", DoubleType),
        StructField("p_value", DoubleType))), "anova",
        Seq(tsPair(args.take(2))), Seq(tsPairType))),
    "anova" -> (args =>
      kernel(StructType(Seq(StructField("f_statistic", DoubleType),
        StructField("p_value", DoubleType))), "anova",
        Seq(tsPair(args.take(2))), Seq(tsPairType))),

    // sequenceNextNode(direction, base)(ts, event, base_cond, conds…):
    // the event value of the node after the matched chain
    "sequencenextnode" -> (args => {
      // post-parametric order: (ts, event, base_cond, cond…, dir, base)
      val dir = args(args.length - 2)
      val base = args.last
      val conds = args.drop(3).dropRight(2)
      val mask =
        if (conds.isEmpty) Literal(0L)
        else conds.zipWithIndex.map { case (c, i) =>
          If(Cast(c, BooleanType), Literal(1L << i), Literal(0L))
        }.reduceLeft[Expression]((a, b) => BitwiseOr(a, b))
      val rows = agg(CollectList(CreateStruct(Seq(
        UnixMicros(Cast(args(0), TimestampType)),
        Cast(args(1), StringType),
        Cast(Cast(args(2), BooleanType), LongType),
        mask))))
      kernel(StringType, "sequenceNextNode",
        Seq(Cast(dir, StringType), Cast(base, StringType), rows,
          Literal(conds.length)),
        Seq(StringType, StringType,
          ArrayType(StructType(Seq(StructField("ts", LongType),
            StructField("ev", StringType), StructField("cb", LongType),
            StructField("m", LongType)))), IntegerType))
    }),

    // deltaSumTimestamp(value, ts): positive deltas in TIMESTAMP order —
    // the ordering column makes it deterministic, unlike deltaSum
    "deltasumtimestamp" -> (args =>
      kernel(DoubleType, "deltaSumTimestamp",
        Seq(agg(CollectList(CreateStruct(Seq(asDouble(args(0)),
          asDouble(Cast(Cast(args(1), TimestampType), DoubleType))))))),
        Seq(pairArrayType))),

    // sequenceMatchEvents: timestamps of the first match
    "sequencematchevents" -> (args => {
      val conds = args.tail.dropRight(1)
      kernel(ArrayType(LongType), "sequenceMatchEvents",
        Seq(args.last, seqEvents(args.head, conds)),
        Seq(StringType, seqPairType))
    }),

    // groupArrayInsertAt(x, pos) — string value carrier (documented)
    "grouparrayinsertat" -> (args =>
      kernel(ArrayType(StringType), "groupArrayInsertAt",
        Seq(agg(CollectList(CreateStruct(Seq(asLong(args(1)),
          Cast(args(0), StringType)))))),
        Seq(ArrayType(StructType(Seq(StructField("pos", LongType),
          StructField("v", StringType))))))),

    // URLHash[(level)] (FunctionsHashing.h:1520-1588): hash of the
    // level-cut URL with ONE trailing /?# dropped; rides the session's
    // cityHash64 carrier
    "urlhash" -> (args =>
      XxHash64(Seq(kernel(StringType, "urlHashCut",
        Seq(Cast(args.head, StringType),
          asLong(args.lift(1).getOrElse(Literal(0)))),
        Seq(StringType, LongType))), 42L)),

    // isDecimalOverflow(d[, precision])
    "isdecimaloverflow" -> (args => {
      val d = args.head
      val (p0, s0) = d.dataType match {
        case t: DecimalType => (t.precision, t.scale)
        case _ => (38, 6)
      }
      val prec = args.lift(1).getOrElse(Literal(p0))
      kernel(BooleanType, "isDecimalOverflow",
        Seq(Cast(d, DecimalType(38, s0)), Cast(prec, IntegerType)),
        Seq(DecimalType(38, s0), IntegerType))
    }),

    // toDateTimeComponents (DateTimeTransforms.h components lane)
    "todatetimecomponents" -> (args => {
      val ts = Cast(args.head, TimestampType)
      CreateNamedStruct(Seq(
        Literal("year"), Year(ts), Literal("month"), Month(ts),
        Literal("day"), DayOfMonth(ts), Literal("hour"), Hour(ts),
        Literal("minute"), Minute(ts), Literal("second"), Second(ts)))
    }),

    // wide-int OrDefault tails over the existing OrNull lanes
    "toint128ordefault" -> (args => orDefault("toint128ornull", args)),
    "toint256ordefault" -> (args => orDefault("toint256ornull", args)),
    "touint128ordefault" -> (args => orDefault("touint128ornull", args)),
    "touint256ordefault" -> (args => orDefault("touint256ornull", args)),

    // REAL hash lanes (sweep-#7-style upgrade of the round-2 stand-ins;
    // published Appleby MurmurHash2/3, the JDK 31-recurrence, textbook
    // reflected CRC-64 with the reference's ECMA-182 polynomial):
    // single-arg string/binary inputs hash their UTF-8 bytes exactly
    // like the reference; multi-arg combine lanes keep the engine-wide
    // stand-in (documented, same policy as sipHash128's combine)
    "murmurhash2_32" -> (args => realHash(args, LongType, "murmurHash2_32")),
    "murmurhash2_64" -> (args => realHash(args, LongType, "murmurHash2_64")),
    "murmurhash3_32" -> (args => realHash(args, LongType, "murmurHash3_32")),
    "murmurhash3_64" -> (args => realHash(args, LongType, "murmurHash3_64")),
    "murmurhash3_128" -> (args =>
      realHash(args, BinaryType, "murmurHash3_128")),
    "javahash" -> (args =>
      if (args.length == 1)
        Cast(kernel(IntegerType, "javaHash", Seq(bytesOf(args.head)),
          Seq(BinaryType)), LongType)
      else XxHash64(args, 42L)),
    "hivehash" -> (args =>
      if (args.length == 1)
        Cast(kernel(IntegerType, "hiveHash", Seq(bytesOf(args.head)),
          Seq(BinaryType)), LongType)
      else Cast(XxHash64(args, 42L), IntegerType)),
    "crc64" -> (args => realHash(args, LongType, "crc64")),

    // last alias closures (reference registerAlias, each verified):
    // mapFromString → extractKeyValuePairs (extractKeyValuePairs.cpp:255),
    // yearweek → toYearWeek, truncate = numeric toward-zero rounding
    // (FunctionsRound.cpp:19 aliases truncate → trunc — Spark's trunc
    // is the DATE function, so the numeric tree is spelled out), and
    // the boolean xor
    "mapfromstring" -> (args =>
      ChFunctionRegistry.builders("extractkeyvaluepairs")(args)),
    // mapPartialSort/mapPartialReverseSort (sorts the first `limit`
    // entries, rest unspecified): the full sort SATISFIES the partial
    // guarantee — the limit argument is accepted and absorbed
    // (documented; the partial form is a CPU-saving detail with no
    // observable contract beyond the prefix)
    "mappartialsort" -> (args =>
      ChFunctionRegistry.builders("mapsort")(Seq(args.last))),
    "mappartialreversesort" -> (args =>
      ChFunctionRegistry.builders("mapreversesort")(Seq(args.last))),
    // toInterval(n, 'unit') (toInterval.cpp — the generic spelling of
    // the toInterval<Kind> family): dispatch on the unit literal to the
    // registered kind lanes
    "tointerval" -> (args => {
      val unit = foldStr(args(1)).toLowerCase.stripSuffix("s")
      val lane = s"tointerval$unit"
      require(ChFunctionRegistry.builders.contains(lane),
        s"toInterval: unsupported unit '$unit'")
      ChFunctionRegistry.builders(lane)(Seq(args.head))
    }),
    "yearweek" -> (args => ChFunctionRegistry.builders("toyearweek")(args)),
    "truncate" -> (args => {
      val x = asDouble(args.head)
      if (args.length == 1)
        Multiply(Cast(Signum(x), DoubleType),
          Cast(Floor(Abs(x, failOnError = false)), DoubleType))
      else {
        val scale = Pow(Literal(10.0), asDouble(args(1)))
        Divide(Multiply(Cast(Signum(x), DoubleType),
          Cast(Floor(Multiply(Abs(x, failOnError = false), scale)),
            DoubleType)), scale)
      }
    }),
    "xor" -> (args => args.map(a =>
      Cast(a, BooleanType): Expression).reduceLeft((a, b) =>
      Not(EqualTo(a, b)))),

    // tuple-of-intervals arithmetic (FunctionBinaryArithmetic.h lane):
    // schema-driven — the struct's interval field types resolve at
    // analysis time
    "addtupleofintervals" -> (args =>
      graft.functions.TupleReshape.ShiftTupleOfIntervals(
        args(0), args(1), 1)),
    "subtracttupleofintervals" -> (args =>
      graft.functions.TupleReshape.ShiftTupleOfIntervals(
        args(0), args(1), -1)),

    // categoricalInformationValue(cat1..catN, tag)
    // (AggregateFunctionCategoricalInformationValue.h): per-category
    // IV = (a/A − b/B)·ln(aB/(bA)) — pure aggregate arithmetic
    "categoricalinformationvalue" -> (args => {
      val tag = Cast(args.last, BooleanType)
      val cats = args.dropRight(1)
      def cnt(p: Expression) =
        asDouble(agg(Sum(Cast(Cast(p, BooleanType), IntegerType))))
      val bigA = cnt(tag)
      val bigB = cnt(Not(tag))
      // LEGACY division: an empty class gives ±Infinity like the
      // reference's float math (ANSI double division would throw)
      def div(x: Expression, y: Expression) =
        Divide(x, y, EvalMode.LEGACY)
      CreateArray(cats.map { c =>
        val a = cnt(And(Cast(c, BooleanType), tag))
        val b = cnt(And(Cast(c, BooleanType), Not(tag)))
        Multiply(
          Subtract(div(a, bigA), div(b, bigB)),
          Log(div(Multiply(a, bigB), Multiply(b, bigA))))
      })
    }),

    // ranked array enumeration: the flat (depth-1, single-array) form
    // IS arrayEnumerateUniq/Dense; deeper rank layouts reject loudly
    // (the depth axis reshapes nested-array occurrence scopes — a
    // cosmetic view with no new capability; documented)
    "arrayenumerateuniqranked" -> (args => {
      require(args.length == 1, "arrayEnumerateUniqRanked: only the " +
        "single-array depth-1 form is supported (documented subset)")
      ChRegistryArrays.builders("arrayenumerateuniq")(args)
    }),
    "arrayenumeratedenseranked" -> (args => {
      require(args.length == 1, "arrayEnumerateDenseRanked: only the " +
        "single-array depth-1 form is supported (documented subset)")
      ChRegistryArrays.builders("arrayenumeratedense")(args)
    }),

    // cutToFirstSignificantSubdomainWithWWW[RFC]: the base cut, with a
    // leading www. label preserved when the host carries one
    "cuttofirstsignificantsubdomainwithwww" -> (args => withWww(args)),
    "cuttofirstsignificantsubdomainwithwwwrfc" -> (args => withWww(args)),

    // bitmapTransform over the Roaring carrier
    "bitmaptransform" -> (args => kernel(BinaryType, "bitmapTransform",
      Seq(Cast(args(0), BinaryType), Cast(args(1), ArrayType(LongType)),
        Cast(args(2), ArrayType(LongType))),
      Seq(BinaryType, ArrayType(LongType), ArrayType(LongType)))),

    // JSON path introspection over the text/Variant carrier
    "jsonallpaths" -> (args => jsonPaths(args, "jsonAllPaths")),
    "jsondynamicpaths" -> (args => jsonPaths(args, "jsonAllPaths")),
    "jsonallpathswithtypes" -> (args =>
      kernel(MapType(StringType, StringType), "jsonAllPathsWithTypes",
        Seq(Cast(args.head, StringType)), Seq(StringType))),
    "jsondynamicpathswithtypes" -> (args =>
      kernel(MapType(StringType, StringType), "jsonAllPathsWithTypes",
        Seq(Cast(args.head, StringType)), Seq(StringType))),
    "jsonshareddatapaths" -> (_ =>
      Literal.create(Seq.empty[String], ArrayType(StringType))),
    "jsonshareddatapathswithtypes" -> (_ =>
      Literal.create(Map.empty[String, String],
        MapType(StringType, StringType))),

    // WKT geometry readers (readWkt.cpp over the published OGC
    // well-known-text grammar) + the pointInPolygon SQL lane on the
    // same carrier (point = struct(x, y), ring = array(point),
    // polygon = array(ring), multi* = one more level)
    "readwktpoint" -> (args => kernel(pointType, "readWktPoint",
      Seq(Cast(args.head, StringType)), Seq(StringType))),
    "readwktlinestring" -> (args => kernel(ringType, "readWktLineString",
      Seq(Cast(args.head, StringType)), Seq(StringType))),
    "readwktring" -> (args => kernel(ringType, "readWktRing",
      Seq(Cast(args.head, StringType)), Seq(StringType))),
    "readwktpolygon" -> (args => kernel(polyType, "readWktPolygon",
      Seq(Cast(args.head, StringType)), Seq(StringType))),
    "readwktmultilinestring" -> (args =>
      kernel(polyType, "readWktMultiLineString",
        Seq(Cast(args.head, StringType)), Seq(StringType))),
    "readwktmultipolygon" -> (args =>
      kernel(ArrayType(polyType), "readWktMultiPolygon",
        Seq(Cast(args.head, StringType)), Seq(StringType))),
    // pointInPolygon((x, y), ring-or-polygon): a bare ring promotes to
    // the single-ring polygon (pointInPolygon.cpp accepts both)
    "pointinpolygon" -> (args => {
      val pt = args.head
      val x = asDouble(GetStructField(pt, 0))
      val y = asDouble(GetStructField(pt, 1))
      val geom = Cast(args(1), polyType) match {
        case c if scala.util.Try(args(1).dataType).toOption
            .exists(_.isInstanceOf[ArrayType] &&
              !args(1).dataType.asInstanceOf[ArrayType]
                .elementType.isInstanceOf[ArrayType]) =>
          CreateArray(Seq(Cast(args(1), ringType)))
        case c => c
      }
      kernel(BooleanType, "pointInPolygonRings",
        Seq(x, y, geom), Seq(DoubleType, DoubleType, polyType))
    }),

    // getServerSetting / getMergeTreeSetting (serverConstants.cpp
    // class): resolve from the session's setting ledger at ANALYSIS
    // time, like the reference's query-time constant fold; unknown
    // names reject loudly (the reference throws UNKNOWN_SETTING)
    "getserversetting" -> (args => settingLit(args, "graft.ch.")),
    "getmergetreesetting" -> (args =>
      settingLit(args, "graft.ch.merge_tree."))
  )

  private val pointType = StructType(Seq(
    StructField("x", DoubleType), StructField("y", DoubleType)))
  private val ringType = ArrayType(pointType)
  private val polyType = ArrayType(ringType)

  private def settingLit(args: Seq[Expression],
      prefix: String): Expression = {
    val name = foldStr(args.head)
    val v = org.apache.spark.sql.SparkSession.getActiveSession
      .flatMap(s => s.conf.getOption(prefix + name)
        .orElse(s.conf.getOption(s"graft.ch.$name")))
      .getOrElse(throw new IllegalArgumentException(
        s"Unknown setting '$name' (set it with SET $name = …)"))
    // the ledger stores SET values verbatim — string literals keep
    // their quotes there, like SHOW SETTING strips them on render
    val rendered =
      if (v.length >= 2 && v.startsWith("'") && v.endsWith("'"))
        v.substring(1, v.length - 1)
      else v
    Literal(org.apache.spark.unsafe.types.UTF8String.fromString(rendered),
      StringType)
  }

  private def jsonPaths(args: Seq[Expression],
      method: String): Expression =
    kernel(ArrayType(StringType), method,
      Seq(Cast(args.head, StringType)), Seq(StringType))

  private def withWww(args: Seq[Expression]): Expression = {
    val cut = ChRegistryUrlDate
      .builders("cuttofirstsignificantsubdomain")(args)
    val hostLower = Lower(ChRegistryUrlDate.builders("domain")(args))
    If(StartsWith(hostLower, Literal("www.")),
      Concat(Seq(Literal("www."), cut)), cut)
  }

  // ---- minhash/simhash spelling matrix (FunctionsStringHash.cpp):
  // CaseInsensitive lanes lowercase, UTF8 spellings share the base
  // kernels (strings are Unicode), Arg lanes expose the shingle that
  // achieves each lane's min — same two-lane stand-in policy as Tail3
  // (name-compatible, never value-pinned) ------------------------------

  private val hkCls = classOf[graft.functions.HashKernels.type]
  private def minhashLanes: Map[String, Seq[Expression] => Expression] = {
    def argOr(args: Seq[Expression], i: Int, dflt: Int): Expression =
      if (args.length > i) Cast(args(i), IntegerType) else Literal(dflt)
    def mh(method: String, suffix: String)(args: Seq[Expression]) =
      StaticInvoke(hkCls, LongType, method + suffix,
        Seq(args.head, argOr(args, 1, 3)), Seq(StringType, IntegerType))
    def pair(method: String, ci: Boolean)(args: Seq[Expression]) =
      CreateStruct(Seq(
        mh(method, if (ci) "ACI" else "A")(args),
        mh(method, if (ci) "BCI" else "B")(args)))
    def argPair(method: String, ci: Boolean)(args: Seq[Expression]) =
      CreateStruct(Seq(
        StaticInvoke(hkCls, StringType, method,
          Seq(args.head, argOr(args, 1, 3), Literal(ci), Literal(false)),
          Seq(StringType, IntegerType, BooleanType, BooleanType)),
        StaticInvoke(hkCls, StringType, method,
          Seq(args.head, argOr(args, 1, 3), Literal(ci), Literal(true)),
          Seq(StringType, IntegerType, BooleanType, BooleanType))))
    Map(
      "ngramminhashcaseinsensitive" -> pair("ngramMinHash", ci = true) _,
      "ngramminhashutf8" -> pair("ngramMinHash", ci = false) _,
      "ngramminhashcaseinsensitiveutf8" -> pair("ngramMinHash", ci = true) _,
      "wordshingleminhashcaseinsensitive" ->
        pair("wordShingleMinHash", ci = true) _,
      "wordshingleminhashutf8" -> pair("wordShingleMinHash", ci = false) _,
      "wordshingleminhashcaseinsensitiveutf8" ->
        pair("wordShingleMinHash", ci = true) _,
      "ngramsimhashcaseinsensitiveutf8" -> ((args: Seq[Expression]) =>
        StaticInvoke(hkCls, LongType, "ngramSimHashCI",
          Seq(args.head, argOr(args, 1, 3)), Seq(StringType, IntegerType))),
      "wordshinglesimhashcaseinsensitiveutf8" -> ((args: Seq[Expression]) =>
        StaticInvoke(hkCls, LongType, "wordShingleSimHashCI",
          Seq(args.head, argOr(args, 1, 3)), Seq(StringType, IntegerType))),
      "ngramminhasharg" -> argPair("ngramMinHashArg", ci = false) _,
      "ngramminhashargcaseinsensitive" ->
        argPair("ngramMinHashArg", ci = true) _,
      "ngramminhashargutf8" -> argPair("ngramMinHashArg", ci = false) _,
      "ngramminhashargcaseinsensitiveutf8" ->
        argPair("ngramMinHashArg", ci = true) _,
      "wordshingleminhasharg" ->
        argPair("wordShingleMinHashArg", ci = false) _,
      "wordshingleminhashargcaseinsensitive" ->
        argPair("wordShingleMinHashArg", ci = true) _,
      "wordshingleminhashargutf8" ->
        argPair("wordShingleMinHashArg", ci = false) _,
      "wordshingleminhashargcaseinsensitiveutf8" ->
        argPair("wordShingleMinHashArg", ci = true) _)
  }

  val all: Map[String, Seq[Expression] => Expression] =
    builders ++ filteredBuilders ++ builders2 ++ minhashLanes
}
