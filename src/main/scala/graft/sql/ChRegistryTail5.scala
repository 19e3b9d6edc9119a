package graft.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graft.{HilbertDecode2, HilbertEncode2}
import org.apache.spark.sql.types._

/** Round-8 registry sweep #5 (diff of the reference's registered names
  * against the session registry; registerFunctions.cpp order):
  *  - arrayResize (array/arrayResize.cpp) — truncate/pad either end,
  *    negative size operates on the FRONT like the reference;
  *  - extractGroups / extractAllGroupsHorizontal / …Vertical
  *    (extractGroups.cpp, extractAllGroups.h) — capture-group extraction
  *    for LITERAL patterns (group count derives from the pattern, the
  *    reference resolves it the same way at analysis);
  *  - ULIDStringToDateTime (ULIDStringToDateTime.cpp) — the first 10
  *    Crockford-base32 chars are the millisecond timestamp; decoded by
  *    translating Crockford digits to base-32hex and `conv`;
  *  - hilbertEncode/hilbertDecode (hilbertEncode.cpp — the public
  *    Hilbert-curve xy2d/d2xy algorithm), the locality-preserving
  *    sibling of the Tail pack's Morton codec.
  */
object ChRegistryTail5 {

  /** Capture-group count of a literal Java regex (unescaped `(` not
    * opening a non-capturing / lookaround group). */
  private def groupCount(re: String): Int =
    java.util.regex.Pattern.compile(re).matcher("").groupCount()

  private def litString(e: Expression, what: String): String = e match {
    case Literal(s, StringType) if s != null => s.toString
    case _ => throw new IllegalArgumentException(
      s"$what must be a string literal")
  }

  // Crockford base32 digit alphabet → base-32hex digit alphabet (conv's
  // digit set). Values 0..17 share spellings; 18+ shift past the skipped
  // I, L, O, U letters.
  private val CrockfordDigits = "JKMNPQRSTVWXYZ"
  private val Base32HexDigits = "IJKLMNOPQRSTUV"

  /** Sufficient-statistics least-squares fit: drop trailing literal
    * hyperparameters, aggregate the intercept-augmented Gram matrix and
    * RHS, solve at finalization. */
  private def linRegFit(args0: Seq[Expression]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.Sum
    // trailing foldable literals are the reference's (lr, l2, batch,
    // 'method') parameters — the closed form ignores them
    val args = args0.reverse.dropWhile(_.isInstanceOf[Literal]).reverse
    require(args.length >= 2,
      "stochasticLinearRegression needs (target, feature...)")
    val y = Cast(args.head, DoubleType)
    val feats: Seq[Expression] =
      Literal(1.0) +: args.tail.map(Cast(_, DoubleType))
    val gram = for { fi <- feats; fj <- feats }
      yield Sum(Multiply(fi, fj)).toAggregateExpression()
    val rhs = feats.map(fi => Sum(Multiply(fi, y)).toAggregateExpression())
    org.apache.spark.sql.graft.SolveLinearSystem(CreateArray(gram ++ rhs))
  }

  /** Logistic fit = the linear fit's coefficients plus a trailing tag
    * element; evalMLMethod keys the sigmoid link off the extra length. */
  private def logRegFit(args: Seq[Expression]): Expression =
    Concat(Seq(linRegFit(args), CreateArray(Seq(Literal(1.0)))))

  val builders: Map[String, Seq[Expression] => Expression] = Map(
    // ---- arrayResize (array/arrayResize.cpp) -------------------------
    // positive size: truncate/pad at the END; negative: at the FRONT.
    // Extender defaults to NULL (the reference pads with the type's
    // default; this engine's declared default is NULL).
    "arrayresize" -> (args => {
      val arr = args(0)
      val size = Cast(args(1), IntegerType)
      val ext = if (args.length > 2) args(2) else Literal(null, NullType)
      val n = Size(arr)
      def pad(k: Expression) = ArrayRepeat(ext, k)
      val absSize = Abs(size)
      val back = If(GreaterThanOrEqual(n, absSize),
        Slice(arr, Literal(1), absSize),
        Concat(Seq(arr, pad(Subtract(absSize, n)))))
      val front = If(GreaterThanOrEqual(n, absSize),
        Slice(arr, Add(Subtract(n, absSize), Literal(1)), absSize),
        Concat(Seq(pad(Subtract(absSize, n)), arr)))
      If(GreaterThanOrEqual(size, Literal(0)), back, front)
    }),

    // ---- capture-group extraction ------------------------------------
    // extractGroups(s, 're') → array of the FIRST match's groups
    // (empty strings when no match — regexp_extract's contract).
    "extractgroups" -> (args => {
      val n = groupCount(litString(args(1), "extractGroups pattern"))
      CreateArray((1 to n).map(i =>
        RegExpExtract(args(0), args(1), Literal(i))))
    }),
    // extractAllGroupsHorizontal(s, 're') → one array PER GROUP holding
    // that group across all matches
    "extractallgroupshorizontal" -> (args => {
      val n = groupCount(litString(args(1),
        "extractAllGroupsHorizontal pattern"))
      CreateArray((1 to n).map(i =>
        RegExpExtractAll(args(0), args(1), Literal(i))))
    }),
    // extractAllGroupsVertical(s, 're') → one array PER MATCH holding
    // its groups (the zip of the horizontal form)
    "extractallgroupsvertical" -> (args => {
      val n = groupCount(litString(args(1),
        "extractAllGroupsVertical pattern"))
      val horiz = (1 to n).map(i =>
        RegExpExtractAll(args(0), args(1), Literal(i)))
      val idx = UnresolvedNamedLambdaVariable(Seq("ch_vrt_i"))
      // Sequence(1, 0) THROWS (descending without step) — zero matches
      // must yield an empty array, not an error
      If(LessThanOrEqual(Size(horiz.head), Literal(0)),
        Literal.create(Seq.empty[Seq[String]],
          ArrayType(ArrayType(StringType))),
        ArrayTransform(
          Sequence(Literal(1), Size(horiz.head), Some(Literal(1))),
          LambdaFunction(
            CreateArray(horiz.map(h => ElementAt(h, idx, None,
              failOnError = false))),
            Seq(idx))))
    }),

    // ---- ULIDStringToDateTime (ULIDStringToDateTime.cpp) -------------
    "ulidstringtodatetime" -> (args => {
      val ts10 = Upper(Substring(args.head, Literal(1), Literal(10)))
      val hex32 = StringTranslate(ts10,
        Literal(CrockfordDigits), Literal(Base32HexDigits))
      MillisToTimestamp(Cast(Conv(hex32, Literal(32), Literal(10)),
        LongType))
    }),

    // ---- ML regression (AggregateFunctionMLMethod.cpp) ---------------
    // stochasticLinearRegression(lr, l2, batch, 'method')(y, x1..xk):
    // the reference fits by SGD; this engine aggregates the
    // ORDER-INDEPENDENT sufficient statistics (intercept-augmented Gram
    // matrix + RHS sums — what distributed merges need to be
    // deterministic) and solves the normal equations at finalization —
    // the same least-squares optimum SGD converges to. Trailing numeric/
    // string parameters (learning rate etc.) are accepted and ignored:
    // the closed form has no hyperparameters. Returns [w1..wk, bias].
    "stochasticlinearregression" -> (args => linRegFit(args)),
    "stochasticlinearregressionstate" -> (args => linRegFit(args)),
    // logistic twin: linear-probability fit on the 0/1 labels with the
    // sigmoid applied at evalMLMethod — a documented stand-in (ranking-
    // consistent; the reference's SGD logistic differs in calibration).
    // The state carries a trailing TAG element (length k+2 vs the linear
    // k+1) so evalMLMethod can pick the logistic link at eval time.
    "stochasticlogisticregression" -> (args => logRegFit(args)),
    "stochasticlogisticregressionstate" -> (args => logRegFit(args)),
    // evalMLMethod(state, x1..xk) → prediction: the linear form for
    // regression states; 1/(1+exp(-z)) — a probability in [0,1], the
    // reference's logistic output — for tagged logistic states
    "evalmlmethod" -> (args => {
      val state = args.head
      val xs = args.tail
      val terms = xs.zipWithIndex.map { case (x, i) =>
        Multiply(ElementAt(state, Literal(i + 1), None, failOnError = false),
          Cast(x, DoubleType))
      } :+ ElementAt(state, Literal(xs.length + 1), None, failOnError = false)
      val z = terms.reduce[Expression](Add(_, _))
      If(EqualTo(Size(state), Literal(xs.length + 2)),
        Divide(Literal(1.0), Add(Literal(1.0), Exp(UnaryMinus(z)))),
        z)
    }),

    // ---- Dynamic type (DataTypeDynamic.h:10 — SURVEY §1.2 maps Dynamic
    // onto Spark's VariantType, like JSON/Variant before it) ------------
    // dynamicType(d) (src/Functions/dynamicType.cpp): the stored type
    // name of each row's value, reference-spelled (Int64/Float64/String/
    // Bool/Array(...)/None) — a per-row schema_of_variant with the Spark
    // DDL names textually mapped.
    "dynamictype" -> (args => {
      val schema = new org.apache.spark.sql.catalyst.expressions.variant
        .SchemaOfVariant(args.head)
      // order matters: composites first (ARRAY< before bare <), wide
      // names before their substrings (BIGINT before INT)
      Seq(
        "ARRAY<" -> "Array(", "MAP<" -> "Map(", "STRUCT<" -> "Tuple(",
        "<" -> "(", ">" -> ")",
        "BIGINT" -> "Int64", "SMALLINT" -> "Int16", "TINYINT" -> "Int8",
        "INT" -> "Int32", "DOUBLE" -> "Float64", "FLOAT" -> "Float32",
        "STRING" -> "String", "BOOLEAN" -> "Bool", "VOID" -> "None",
        "TIMESTAMP" -> "DateTime", "DATE" -> "Date", "DECIMAL" -> "Decimal"
      ).foldLeft(schema: Expression) { case (e, (from, to)) =>
        StringReplace(e, Literal(from), Literal(to))
      }
    }),
    // dynamicElement(d, 'Type'): typed extraction — the row's value when
    // it is stored as (or losslessly casts to) the asked type, else NULL
    // (the try-variant contract; the reference returns the type's default
    // NULL analog on mismatch). The type literal is reference-spelled.
    "dynamicelement" -> (args => {
      val chType = litString(args(1), "dynamicElement type")
      val spark = org.apache.spark.sql.types.DataType.fromDDL(
        ClickHouseSql.sparkTypeText(chType))
      new org.apache.spark.sql.catalyst.expressions.variant.VariantGet(
        args.head, Literal("$"), spark, false,
        Some(java.util.TimeZone.getDefault.getID))
    }),

    // ---- Hilbert codec (hilbertEncode.cpp/hilbertDecode.cpp) ---------
    // encode takes (x, y) or the reference's (2, x, y) arity form
    "hilbertencode" -> (args => {
      val xs = if (args.length == 3) args.drop(1) else args
      HilbertEncode2(Cast(xs(0), LongType), Cast(xs(1), LongType))
    }),
    // decode takes d or (2, d); → struct(x, y) like mortonDecode
    "hilbertdecode" -> (args =>
      HilbertDecode2(Cast(args.last, LongType)))
  )
}
