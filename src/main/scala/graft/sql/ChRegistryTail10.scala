package graft.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._

/** Round-12 registry sweep #10 — the function closures of this round:
  *
  *  - the custom-TLD subdomain family over session-registered
  *    public-suffix lists (FirstSignificantSubdomainCustomImpl.h:24 —
  *    `TLDListsHolder::getTldList(tld_list_name)`) + portRFC;
  *  - the formatQuery printer family (formatQuery.cpp);
  *  - the embedded-geobase region family over session-registered
  *    hierarchy/name files (FunctionsEmbeddedDictionaries.h);
  *  - the Hyperscan fuzzy trio's exact literal lane
  *    (MultiMatchAnyImpl.h);
  *  - toIPv6* + reinterpretAs{Int,UInt}{128,256};
  *  - the callable IN-operator spellings (in.cpp) and the KQL array
  *    sorters (Kusto/KqlArraySort.cpp);
  *  - server-state names a single-session engine CAN answer, incl.
  *    estimateCompressionRatio over real LZ4/ZSTD;
  *  - the weighted/plural quantile-engine matrix, groupArrayArray/
  *    array_concat_agg, the Nothing family, and the Dynamic/JSON
  *    introspection aggregates the reproducible extraction surfaced.
  *
  * Session-registered data (TLD lists, geobases, macros) resolves its
  * constant NAME argument at plan time (the reference resolves it once
  * per block for the constant column); the CONTENT travels as a plan
  * literal — executor-local at any cluster size, like a broadcast dim,
  * never a driver-global lookup from a task. */
object ChRegistryTail10 {

  private val tldCls = classOf[graft.functions.TldKernels.type]
  private val fmtCls = classOf[graft.functions.QueryFormatKernels.type]

  /** The constant TLD-list-name argument → the list content literal. */
  private def tldBlob(nameArg: Expression): Expression = {
    val listName = nameArg match {
      case e if e.foldable => e.eval() match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case other => String.valueOf(other)
      }
      case _ => throw new IllegalArgumentException(
        "the TLD_list_name argument must be a constant string " +
          "(the reference requires a ColumnConst too)")
    }
    Literal(org.apache.spark.unsafe.types.UTF8String.fromString(
      graft.functions.TldLists.blob(listName)), StringType)
  }

  private val geoCls = classOf[graft.functions.GeoBaseKernels.type]
  private val ipv6Cls = classOf[graft.functions.Ipv6CastKernels.type]

  private def lam2(f: (Expression, Expression) => Expression)
      : LambdaFunction = {
    val x = lv(); val y = lv(); LambdaFunction(f(x, y), Seq(x, y))
  }

  /** kql_array_sort_asc/_desc (Kusto/KqlArraySort.cpp): sort the first
    * array (nulls last unless the trailing bool says first) and PERMUTE
    * the other arrays by the same order, returning a tuple; an array
    * whose length mismatches the first comes back NULL (the reference's
    * null-column rule). Pure HOF tree: zip-by-index → array_sort with
    * an explicit comparator → per-slot projection. */
  private def kqlArraySort(desc: Boolean)(args: Seq[Expression]): Expression = {
    val (arrs, nullsLast) = args.last match {
      case Literal(b: Boolean, BooleanType) => (args.init, b)
      case _ => (args, true)
    }
    require(arrs.nonEmpty, "kql_array_sort: needs at least one array")
    def cmp(lk: Expression, rk: Expression): Expression =
      CaseWhen(Seq(
        (And(IsNull(lk), IsNull(rk)), Literal(0)),
        (IsNull(lk), Literal(if (nullsLast) 1 else -1)),
        (IsNull(rk), Literal(if (nullsLast) -1 else 1)),
        (if (desc) GreaterThan(lk, rk) else LessThan(lk, rk), Literal(-1)),
        (if (desc) LessThan(lk, rk) else GreaterThan(lk, rk), Literal(1))),
        Literal(0))
    def named(fields: Seq[Expression]): Expression =
      CreateNamedStruct(fields.zipWithIndex.flatMap { case (e, i) =>
        Seq(Literal(s"col${i + 1}"), e)
      })
    if (arrs.size == 1)
      named(Seq(new ArraySort(arrs.head, lam2((l, r) => cmp(l, r)))))
    else {
      val zipped = ArrayTransform(arrs.head, lam2((e, i) =>
        named(e +: arrs.tail.map(a =>
          ElementAt(a, Add(i, Literal(1)), None, failOnError = false)))))
      val sorted = new ArraySort(zipped, lam2((l, r) => cmp(
        org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(
          l, Literal("col1")),
        org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(
          r, Literal("col1")))))
      val outs = arrs.zipWithIndex.map { case (a, i) =>
        val proj = ArrayTransform(sorted, lam1(s =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(
            s, Literal(s"col${i + 1}"))))
        if (i == 0) proj
        else If(EqualTo(Size(a), Size(arrs.head)), proj,
          Literal.create(null, NullType))
      }
      named(outs)
    }
  }

  /** exists(set, e -> e = x), null-coalesced — the skip-NULLs
    * membership probe (an exists-equality, not array_contains, so a
    * NULL-typed literal needle still type-checks). */
  private def setContains(x: Expression, set: Expression): Expression =
    Coalesce(Seq(ArrayExists(set, lam1(e => EqualTo(e, x))),
      Literal(false)))

  /** in(x, set): NULL needle → NULL; NULLs in the set are skipped. */
  private def chIn(args: Seq[Expression]): Expression =
    If(IsNull(args(0)), Literal(null, BooleanType),
      setContains(args(0), args(1)))

  private def chNotIn(args: Seq[Expression]): Expression =
    If(IsNull(args(0)), Literal(null, BooleanType), Not(chIn(args)))

  /** nullIn(x, set): NULL is a value — NULL matches a set NULL. */
  private def chNullIn(args: Seq[Expression]): Expression =
    If(IsNull(args(0)),
      Coalesce(Seq(ArrayExists(args(1), lam1(e => IsNull(e))),
        Literal(false))),
      setContains(args(0), args(1)))

  private def reinterpretWide(args: Seq[Expression], width: Int,
      signed: Boolean): Expression =
    StaticInvoke(ipv6Cls, StringType, "reinterpretWide",
      Seq(Cast(args.head, BinaryType), Literal(width), Literal(signed)),
      Seq(BinaryType, IntegerType, BooleanType))

  /** regionToX(id[, geobase]): the optional geobase name resolves at
    * plan time, the hierarchy ships as a plan literal (same lane as the
    * TLD lists). */
  private def regionWalk(kind: Int)(args: Seq[Expression]): Expression = {
    val geobase = if (args.size > 1) foldStr(args(1)) else ""
    StaticInvoke(geoCls, LongType, "regionWalk",
      Seq(Cast(args.head, LongType),
        strLit(graft.functions.GeoBases.hierarchyBlob(geobase)),
        Literal(kind)),
      Seq(LongType, StringType, IntegerType))
  }

  private def geoBlobArg(args: Seq[Expression], at: Int): Expression =
    strLit(graft.functions.GeoBases.hierarchyBlob(
      if (args.size > at) foldStr(args(at)) else ""))

  /** multiFuzzyMatch* literal lane (haystack, distance, [patterns]) —
    * distance and the pattern array are plan constants, mirroring the
    * reference's constant-array requirement; regex-bearing patterns
    * reject at plan time (FuzzyMatchKernels.requireLiteralPatterns). */
  private def fuzzy(method: String, ret: DataType)
      (args: Seq[Expression]): Expression = {
    val k = args(1) match {
      case e if e.foldable => e.eval() match {
        case n: Number => n.intValue
        case other => throw new IllegalArgumentException(
          s"multiFuzzyMatch*: distance must be a constant integer, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "multiFuzzyMatch*: distance must be a constant")
    }
    val pats = args(2) match {
      case e if e.foldable => e.eval() match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData =>
          (0 until a.numElements()).map(a.getUTF8String(_).toString)
        case other => throw new IllegalArgumentException(
          s"multiFuzzyMatch*: patterns must be a constant array, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "multiFuzzyMatch*: patterns must be a constant array")
    }
    graft.functions.FuzzyMatchKernels.requireLiteralPatterns(pats)
    StaticInvoke(classOf[graft.functions.FuzzyMatchKernels.type], ret,
      method, Seq(args.head, Literal(k), args(2)),
      Seq(StringType, IntegerType, ArrayType(StringType)))
  }

  private def fssCustom(args: Seq[Expression]): Expression =
    StaticInvoke(tldCls, StringType, "fssCustom",
      Seq(args.head, tldBlob(args(1))), Seq(StringType, StringType))

  private def cutCustom(withWww: Boolean)(args: Seq[Expression]): Expression =
    StaticInvoke(tldCls, StringType, "cutToFssCustom",
      Seq(args.head, tldBlob(args(1)), Literal(withWww)),
      Seq(StringType, StringType, BooleanType))

  private def fmt(method: String)(args: Seq[Expression]): Expression =
    StaticInvoke(fmtCls, StringType, method, Seq(args.head),
      Seq(StringType))

  private val nlpCls = classOf[graft.functions.NlpKernels.type]

  /** Constant dictionary-name argument → its registered content, as a
    * plan literal (the reference requires a constant name too; the
    * lemmatizer/extension loads once per query, here at plan time). */
  private def nlpBlob(nameArg: Expression,
      blobOf: String => String): Expression = {
    val name = nameArg match {
      case e if e.foldable => e.eval() match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case other => String.valueOf(other)
      }
      case _ => throw new IllegalArgumentException(
        "the dictionary name argument must be a constant string " +
          "(the reference requires a ColumnConst too)")
    }
    Literal(org.apache.spark.unsafe.types.UTF8String.fromString(
      blobOf(name)), StringType)
  }

  /** lemmatize('dict', word) — dictionary lookup, misses pass the word
    * through unchanged (lemmatize.cpp over Lemmatizers.h). */
  private def lemmatizeFn(args: Seq[Expression]): Expression =
    StaticInvoke(nlpCls, StringType, "lemmatizeDict",
      Seq(nlpBlob(args.head, graft.functions.NlpDictionaries.lemmaBlob),
        args(1)), Seq(StringType, StringType))

  /** synonyms('ext', token) → Array(String) — the synset containing the
    * token, empty array on miss (synonyms.cpp over
    * SynonymsExtensions.h). The kernel returns a U+0001-joined string
    * (NULL on miss) that splits into the array here. */
  private def synonymsFn(args: Seq[Expression]): Expression = {
    val inv = StaticInvoke(nlpCls, StringType, "synonymsDict",
      Seq(nlpBlob(args.head, graft.functions.NlpDictionaries.synBlob),
        args(1)), Seq(StringType, StringType))
    If(IsNull(args(1)),
      Literal.create(null, ArrayType(StringType)),
      If(IsNull(inv),
        Literal.create(Array.empty[String], ArrayType(StringType)),
        StringSplit(inv, Literal("\u0001"), Literal(-1))))
  }

  /** port(url[, default_port]) — the RFC twin shares the lenient host
    * lane (the graft URL surface documents RFC twins as same-extraction;
    * port.cpp:131). */
  private def portRfc(args: Seq[Expression]): Expression = {
    val dflt: Expression =
      if (args.size > 1) Cast(args(1), IntegerType) else Literal(0)
    Coalesce(Seq(Cast(RegExpExtract(
      ParseUrl(Seq(args.head, Literal("AUTHORITY")), failOnError = false),
      Literal(":(\\d+)$"), Literal(1)), IntegerType, None, EvalMode.TRY),
      dflt))
  }

  // ---- aggregate-name tail surfaced by the round-12 reproducible
  // extraction (scripts/extract_fn_names.py found registrations the
  // earlier hand-built list missed) --------------------------------

  private val nameSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  private def lv(): UnresolvedNamedLambdaVariable =
    UnresolvedNamedLambdaVariable(Seq("ch_t10_" + nameSeq.incrementAndGet()))
  private def lam1(f: Expression => Expression): LambdaFunction = {
    val x = lv(); LambdaFunction(f(x), Seq(x))
  }
  private def agg(f: AggregateFunction): Expression =
    f.toAggregateExpression()
  private def foldDouble(e: Expression): Double = e.eval() match {
    case n: Number => n.doubleValue
    case other => throw new IllegalArgumentException(
      s"expected a numeric literal, got $other")
  }

  /** Weighted singular quantile engines → exact percentile with a
    * frequency expression (the same same-observable mapping the
    * registry documents for quantileExactWeighted /
    * quantileInterpolatedWeighted; post-parametric-rewrite order is
    * (x, w[, p])). */
  private def weightedQ(args: Seq[Expression]): Expression =
    if (args.length == 2) new Percentile(args(0), Literal(0.5d), args(1))
    else new Percentile(args(0), args(2), args(1))

  /** Plural weighted forms: (x, w, p1, p2, …) → array percentile. */
  private def weightedQs(args: Seq[Expression]): Expression =
    new Percentile(args(0), CreateArray(args.drop(2)), args(1))

  /** Plural approx forms with one leading engine parameter
    * (accuracy/determinator): (x, param, p1, p2, …). */
  private def approxQsParam(args: Seq[Expression]): Expression =
    new ApproximatePercentile(args(0), CreateArray(args.drop(2)))

  private def structField(e: Expression, f: String): Expression =
    org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue(
      e, Literal(f))

  /** distinctJSONPathsAndTypes: per-row path→type maps merged into one
    * Map(path → sorted distinct types) (AggregateFunctionDistinct
    * JSONPaths.cpp family; the per-row walk is the jsonAllPathsWithTypes
    * kernel). */
  private def distinctPathsAndTypes(x: Expression): Expression = {
    val perRow = MapEntries(StaticInvoke(
      classOf[graft.functions.SweepKernels9.type],
      MapType(StringType, StringType), "jsonAllPathsWithTypes",
      Seq(x), Seq(StringType)))
    def all: Expression =
      ArrayDistinct(Flatten(agg(CollectList(perRow))))
    val paths = new SortArray(ArrayDistinct(
      ArrayTransform(all, lam1(e => structField(e, "key")))))
    MapFromEntries(ArrayTransform(paths, lam1(p =>
      CreateStruct(Seq(p, new SortArray(ArrayDistinct(ArrayTransform(
        ArrayFilter(all, lam1(e =>
          EqualTo(structField(e, "key"), p))),
        lam1(e => structField(e, "value"))))))))))
  }

  private def activeSession = org.apache.spark.sql.SparkSession.getActiveSession

  private def strLit(s: String): Expression =
    Literal(org.apache.spark.unsafe.types.UTF8String.fromString(s), StringType)

  private def foldStr(e: Expression): String = e.eval() match {
    case s: org.apache.spark.unsafe.types.UTF8String => s.toString
    case other => throw new IllegalArgumentException(
      s"expected a string literal, got $other")
  }

  val builders: Map[String, Seq[Expression] => Expression] = Map(
    // -- server-state names a single-session engine CAN answer honestly
    // (the rest of that residue category reads Keeper/TLS/transaction
    // state that has no analog here — documented in FUNCTIONS.md):
    // uname sysname+release (getOSKernelVersion.cpp)
    "getoskernelversion" -> (_ => strLit(
      System.getProperty("os.name") + " " + System.getProperty("os.version"))),
    // the session's SET query_id tag ('' when unset) — the same tag
    // KILL QUERY targets
    "query_id" -> (_ => strLit(activeSession
      .flatMap(s => s.conf.getOption("graft.ch.query_id"))
      .map(_.stripPrefix("'").stripSuffix("'")).getOrElse(""))),
    // plan-time statement start; on a single-node engine the INITIAL
    // (distributed-root) query IS this query — both spellings
    "initialquerystarttime" -> (_ =>
      Cast(Literal(System.currentTimeMillis() / 1000L), TimestampType)),
    "initial_query_start_time" -> (_ =>
      Cast(Literal(System.currentTimeMillis() / 1000L), TimestampType)),
    // hasColumnInTable([host[,user[,pw]],] db, table, column): catalog
    // probe — constant args, resolved at plan time; a missing table
    // throws (the reference's documented contract), a missing column
    // is false
    "hascolumnintable" -> (args => {
      val lits = args.takeRight(3).map(foldStr)
      val (db, table, column) = (lits(0), lits(1), lits(2))
      val s = activeSession.getOrElse(throw new IllegalStateException(
        "hasColumnInTable: no active session"))
      val name =
        if (db.isEmpty || db.equalsIgnoreCase("default")) table
        else s"$db.$table"
      val schema = scala.util.Try(s.table(name).schema).getOrElse(
        throw new IllegalArgumentException(
          s"hasColumnInTable: table $name does not exist"))
      Literal(schema.fieldNames.exists(_.equalsIgnoreCase(column)))
    }),
    // estimateCompressionRatio([codec[, block_kb]])(col) — real LZ4/ZSTD
    // through Spark's bundled codecs over a bounded per-group sample
    // (functions/CompressionRatio.scala; post-parametric-rewrite order
    // is (col[, codec[, block_kb]]); the block-size parameter is
    // accepted and absorbed by the bounded sample)
    "estimatecompressionratio" -> (args =>
      agg(graft.functions.CompressionRatio.EstimateCompressionRatio(
        args.head,
        if (args.size > 1) foldStr(args(1)) else "LZ4"))),
    // getMacro('name') — the reference reads the server's <macros>
    // config (getMacro.cpp); the session analog is a named collection
    // called `macros` (the same registration surface the TLD lists use)
    "getmacro" -> (args => {
      val name = foldStr(args.head)
      val v = ClickHouseSql.namedCollection("macros").flatMap(_.get(name))
        .getOrElse(throw new IllegalArgumentException(
          s"No macro '$name' in config (CREATE NAMED COLLECTION macros " +
            s"AS $name = '...')"))
      strLit(v)
    }),
    // getMaxTableNameLengthForDatabase('db') — the reference's own
    // formula (computeMaxTableNameLength.cpp): min(NAME_MAX - len(
    // ".sql.detached"), NAME_MAX - 1 - len(db) - 1 - 36 - len(".sql"))
    // with the Linux NAME_MAX of 255 (the JVM exposes no pathconf;
    // documented constant)
    "getmaxtablenamelengthfordatabase" -> (args => {
      val db = foldStr(args.head)
      val nameMax = 255
      val maxCreate = nameMax - ".sql.detached".length
      val maxDrop = nameMax - 1 - db.length - 1 - 36 - ".sql".length
      Literal(math.min(maxCreate, maxDrop))
    }),
    // -- the experimental-KQL array sorters (user-callable like any
    // registered function)
    "kql_array_sort_asc" -> kqlArraySort(desc = false) _,
    "kql_array_sort_desc" -> kqlArraySort(desc = true) _,
    // -- the IN-operator FUNCTION spellings (src/Functions/in.cpp
    // registers all eight as user-callable FunctionFactory entries;
    // `in` itself is the Spark builtin). GLOBAL twins are identical
    // trees (GLOBAL is a distribution hint — Catalyst owns that).
    // null_is_skipped lanes (in/notIn): NULL needle → NULL, set NULLs
    // skipped; nullIn lanes treat NULL as a value (NULL matches NULL).
    // The set argument is an ARRAY on this engine (documented).
    "notin" -> (args => chNotIn(args)),
    "globalin" -> (args => chIn(args)),
    "globalnotin" -> (args => chNotIn(args)),
    "nullin" -> (args => chNullIn(args)),
    "globalnullin" -> (args => chNullIn(args)),
    "notnullin" -> (args => Not(chNullIn(args))),
    "globalnotnullin" -> (args => Not(chNullIn(args))),
    // -- toIPv6 conversion family (FunctionsConversion.cpp IPv6 lanes;
    // DNS-free guava parse, RFC 5952 canonical carrier, IPv4 text maps
    // to ::ffff:a.b.c.d)
    "toipv6" -> (args => StaticInvoke(ipv6Cls, StringType, "toIpv6",
      Seq(args.head), Seq(StringType))),
    "toipv6ornull" -> (args => StaticInvoke(ipv6Cls, StringType,
      "toIpv6OrNull", Seq(args.head), Seq(StringType))),
    "toipv6orzero" -> (args => StaticInvoke(ipv6Cls, StringType,
      "toIpv6OrZero", Seq(args.head), Seq(StringType))),
    "toipv6ordefault" -> (args => StaticInvoke(ipv6Cls, StringType,
      "toIpv6OrDefault", Seq(args(0), args(1)),
      Seq(StringType, StringType))),
    // -- reinterpretAs 128/256-bit lanes (reinterpretAs.cpp): LE byte
    // image onto the wide-int decimal-string carrier
    "reinterpretasuint128" -> (args => reinterpretWide(args, 16,
      signed = false)),
    "reinterpretasint128" -> (args => reinterpretWide(args, 16,
      signed = true)),
    "reinterpretasuint256" -> (args => reinterpretWide(args, 32,
      signed = false)),
    "reinterpretasint256" -> (args => reinterpretWide(args, 32,
      signed = true)),
    // -- Hyperscan fuzzy family, literal lane (MultiMatchAnyImpl.h
    // edit-distance compilation; exact Sellers approximate-substring
    // semantics for metacharacter-free patterns, loud plan-time reject
    // for regex patterns)
    "multifuzzymatchany" -> fuzzy("fuzzyAny", BooleanType) _,
    "multifuzzymatchanyindex" -> fuzzy("fuzzyAnyIndex", LongType) _,
    "multifuzzymatchallindices" ->
      fuzzy("fuzzyAllIndices", ArrayType(LongType)) _,
    // -- embedded-geobase region family over SESSION-REGISTERED
    // hierarchy/name files (FunctionsEmbeddedDictionaries.h;
    // RegionType: City=6, Country=3, District=4, Area=5, Continent=1;
    // toTopContinent = LAST continent on the chain; regionToName
    // falls back to ru, unknown region = '')
    "regiontocity" -> regionWalk(6) _,
    "regiontocountry" -> regionWalk(3) _,
    "regiontodistrict" -> regionWalk(4) _,
    "regiontoarea" -> regionWalk(5) _,
    "regiontocontinent" -> regionWalk(1) _,
    "regiontotopcontinent" -> regionWalk(100) _,
    "regiontopopulation" -> (args =>
      StaticInvoke(geoCls, LongType, "regionPopulation",
        Seq(Cast(args.head, LongType), geoBlobArg(args, 1)),
        Seq(LongType, StringType))),
    "regionin" -> (args =>
      StaticInvoke(geoCls, BooleanType, "regionIn",
        Seq(Cast(args(0), LongType), Cast(args(1), LongType),
          geoBlobArg(args, 2)),
        Seq(LongType, LongType, StringType))),
    "regionhierarchy" -> (args =>
      StaticInvoke(geoCls, ArrayType(LongType), "regionHierarchy",
        Seq(Cast(args.head, LongType), geoBlobArg(args, 1)),
        Seq(LongType, StringType))),
    "regiontoname" -> (args =>
      StaticInvoke(geoCls, StringType, "regionName",
        Seq(Cast(args.head, LongType),
          strLit(graft.functions.GeoBases.namesBlob(
            if (args.size > 1) foldStr(args(1)) else "ru"))),
        Seq(LongType, StringType))),
    // -- quantile engine matrix completion (weighted + plural names;
    // AggregateFunctionQuantile.cpp registers every engine in both
    // singular and plural spellings, weighted twins included)
    "quantiletimingweighted" -> weightedQ _,
    "quantiletdigestweighted" -> weightedQ _,
    "quantilebfloat16weighted" -> weightedQ _,
    "quantileexactweightedinterpolated" -> weightedQ _,
    "quantilesexactweighted" -> weightedQs _,
    "quantilesexactweightedinterpolated" -> weightedQs _,
    "quantilesinterpolatedweighted" -> weightedQs _,
    "quantilestimingweighted" -> weightedQs _,
    "quantilestdigestweighted" -> weightedQs _,
    "quantilesbfloat16weighted" -> weightedQs _,
    "quantilesbfloat16" -> (args =>
      new ApproximatePercentile(args(0), CreateArray(args.tail))),
    "quantilesexactexclusive" -> (args =>
      new Percentile(args(0), CreateArray(args.tail))),
    "quantilesexactinclusive" -> (args =>
      new Percentile(args(0), CreateArray(args.tail))),
    "quantilesgk" -> approxQsParam _,
    "quantilesdeterministic" -> approxQsParam _,
    "quantilesdd" -> (args => CreateArray(args.drop(2).map(p =>
      agg(graft.functions.QuantileSketches.QuantileDD(args(0),
        q = foldDouble(p), alpha = foldDouble(args(1))))))),
    // -- array_concat_agg = the groupArrayArray (-Array combinator)
    // alias (AggregateFunctionFactory alias, case-insensitive)
    "array_concat_agg" -> (args =>
      Flatten(agg(CollectList(args.head)))),
    "grouparrayarray" -> (args =>
      Flatten(agg(CollectList(args.head)))),
    // -- the Nothing placeholder family (AggregateFunctionNothing.h:
    // "takes arbitrary arguments and does nothing"; return = NULL of
    // the argument type / Nullable(Nothing) / UInt64 default 0)
    "nothing" -> (args =>
      if (args.isEmpty) Literal(null)
      else agg(new First(If(Literal(false), args.head, Literal(null)),
        ignoreNulls = false))),
    "nothingnull" -> (_ =>
      agg(new First(Cast(Literal(null), StringType), ignoreNulls = false))),
    "nothinguint64" -> (_ =>
      Coalesce(Seq(agg(Max(Literal(0L))), Literal(0L)))),
    // -- Dynamic/JSON introspection aggregates over the Variant lane
    "distinctdynamictypes" -> (args =>
      new SortArray(ArrayDistinct(agg(CollectList(
        org.apache.spark.sql.catalyst.analysis.UnresolvedFunction(
          "schema_of_variant", Seq(args.head), isDistinct = false)))))),
    "distinctjsonpaths" -> (args =>
      new SortArray(ArrayDistinct(Flatten(agg(CollectList(StaticInvoke(
        classOf[graft.functions.SweepKernels9.type],
        ArrayType(StringType), "jsonAllPaths",
        Seq(args.head), Seq(StringType)))))))),
    "distinctjsonpathsandtypes" -> (args =>
      distinctPathsAndTypes(args.head)),
    "firstsignificantsubdomaincustom" -> fssCustom _,
    "firstsignificantsubdomaincustomrfc" -> fssCustom _,
    "cuttofirstsignificantsubdomaincustom" -> cutCustom(withWww = false) _,
    "cuttofirstsignificantsubdomaincustomrfc" -> cutCustom(withWww = false) _,
    "cuttofirstsignificantsubdomaincustomwithwww" ->
      cutCustom(withWww = true) _,
    "cuttofirstsignificantsubdomaincustomwithwwwrfc" ->
      cutCustom(withWww = true) _,
    "portrfc" -> portRfc _,
    "formatquery" -> fmt("formatQuery") _,
    "formatqueryornull" -> fmt("formatQueryOrNull") _,
    "formatquerysingleline" -> fmt("formatQuerySingleLine") _,
    "formatquerysinglelineornull" -> fmt("formatQuerySingleLineOrNull") _,
    // -- dictionary-backed NLP (round-13: lemmatize.cpp / synonyms.cpp
    // over session-registered dictionaries — NlpKernels)
    "lemmatize" -> lemmatizeFn _,
    "synonyms" -> synonymsFn _)
}
