package graft.sql

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Mode
import org.apache.spark.sql.graft.ArrayDotProduct
import org.apache.spark.sql.types._

/** Array-function tail of the reference's registry
  * (src/Functions/array/ sources): higher-order forms in the reference's
  * lambda-FIRST argument order (`arrayMap(x -> e, arr)`), structural
  * transforms (cumSum, difference, compact, enumerate, rotate/shift,
  * shingles, split/fill), set predicates (hasAll/hasAny/hasSubstr), and
  * the vector norm/distance family
  * (src/Functions/array/arrayDistance.cpp, arrayNorm.cpp).
  *
  * Everything here is a pure Catalyst tree over Spark's built-in
  * collection expressions — lambdas are built with
  * UnresolvedNamedLambdaVariable exactly as the SQL parser does, so the
  * analyzer types them and whole-stage codegen applies where the
  * underlying expression supports it. ANSI mode is ON in Spark 4: every
  * ElementAt carries failOnError=false and every division sits behind a
  * lazy If guard.
  *
  * Scalar per-row arrays are small; the few O(n²) forms (enumerateUniq,
  * enumerateDense, normalize*) are documented at their definition and are
  * NOT used by any bulk pipeline (LlmPipeline uses explode+groupBy forms).
  */
object ChRegistryArrays {

  private val nameSeq = new AtomicInteger(0)

  private def lv(): UnresolvedNamedLambdaVariable =
    UnresolvedNamedLambdaVariable(Seq("ch_lv_" + nameSeq.incrementAndGet()))

  private def lam1(f: Expression => Expression): LambdaFunction = {
    val x = lv(); LambdaFunction(f(x), Seq(x))
  }

  private def lam2(f: (Expression, Expression) => Expression): LambdaFunction = {
    val x = lv(); val y = lv(); LambdaFunction(f(x, y), Seq(x, y))
  }

  /** The analyzer requires a function that RECEIVES a lambda argument to
    * resolve to a HigherOrderFunction at the top of the built tree
    * (ResolveFunctions NON_HIGHER_ORDER_FUNCTION check). For builders whose
    * natural result is a scalar wrapper (Size, ElementAt, If, Coalesce…)
    * around a genuine HOF, wrap the whole result as the zero of a fold over
    * an empty array: evaluates `result` exactly once, top node is a HOF. */
  private[sql] def hofWrap(result: Expression): Expression =
    ArrayAggregate(
      Literal.create(Array.empty[Int], ArrayType(IntegerType)),
      result,
      lam2((acc, _) => acc),
      LambdaFunction.identity)

  /** element_at that returns NULL (typed) out of bounds even under ANSI. */
  private def at(arr: Expression, i: Expression): Expression =
    ElementAt(arr, i, None, failOnError = false)

  private def at(arr: Expression, i: Int): Expression = at(arr, Literal(i))

  /** Empty array with the same element type as `arr`. */
  private def emptyLike(arr: Expression): Expression =
    Slice(arr, Literal(1), Literal(0))

  /** NULL literal typed like `arr`'s elements (element_at of an empty slice). */
  private def nullElem(arr: Expression): Expression = at(emptyLike(arr), 1)

  private def sz(arr: Expression): Expression = Size(arr)

  /** Type-preserving sum: seed with the first element, fold the tail.
    * Empty array → 0 (coerced to the element type by Coalesce). */
  private def arrSum(arr: Expression): Expression = {
    val tail = Slice(arr, Literal(2),
      Greatest(Seq(Subtract(sz(arr), Literal(1)), Literal(0))))
    Coalesce(Seq(
      ArrayAggregate(tail, at(arr, 1), lam2(Add(_, _)), LambdaFunction.identity),
      Literal(0)))
  }

  private def arrAvg(arr: Expression): Expression =
    If(LessThanOrEqual(sz(arr), Literal(0)), Literal(0.0d),
      Divide(Cast(arrSum(arr), DoubleType), Cast(sz(arr), DoubleType)))

  /** arrayReduce dispatch (arrayReduce.cpp): literal agg name → the
    * equivalent Catalyst collection expression over the array. Covers the
    * names a reference user reaches for over per-row arrays; the full
    * -State/-Merge combinator space stays with the real aggregates. */
  private def arrayReduce(args: Seq[Expression]): Expression = {
    val (name, param) = parseAggSpec(args.head, "arrayReduce")
    reduceDispatch(name, param, args(1), args.drop(2).headOption)
  }

  private def parseAggSpec(spec0: Expression, fn: String): (String, Option[Double]) = {
    val spec = spec0 match {
      case Literal(s, StringType) if s != null => s.toString
      case _ => throw new IllegalArgumentException(
        s"$fn expects a literal aggregate-function name")
    }
    val m = "(?i)^\\s*([A-Za-z0-9_]+)\\s*(?:\\(\\s*([0-9.]+)\\s*\\))?\\s*$".r
    spec match {
      case m(n, null) => (n.toLowerCase, None)
      case m(n, p)    => (n.toLowerCase, Some(p.toDouble))
      case _ => throw new IllegalArgumentException(s"bad $fn spec '$spec'")
    }
  }

  private def reduceDispatch(name: String, param: Option[Double],
      arr: Expression, second: Option[Expression]): Expression = {
    def nonNull = ArrayFilter(arr, lam1(IsNotNull))
    def sorted = SortArray(nonNull, Literal(true))
    def quantileExact(level: Double): Expression = {
      // n = floor(level * size), clamped to size-1 (QuantileExact.h)
      val n = sz(nonNull)
      val idx = Least(Seq(
        Cast(Multiply(Literal(level), Cast(n, DoubleType)), IntegerType),
        Subtract(n, Literal(1))))
      at(sorted, Add(idx, Literal(1)))
    }
    name match {
      case "count" => Cast(sz(arr), LongType)
      case "sum" => arrSum(arr)
      case "min" => ArrayMin(arr)
      case "max" => ArrayMax(arr)
      case "avg" => arrAvg(arr)
      case "any" => at(arr, 1)
      case "anylast" => at(arr, -1)
      case "uniq" | "uniqexact" => Cast(sz(ArrayDistinct(nonNull)), LongType)
      case "grouparray" => arr
      case "groupuniqarray" => ArrayDistinct(arr)
      case "median" | "medianexact" => quantileExact(0.5)
      case "quantile" | "quantileexact" => quantileExact(param.getOrElse(0.5))
      case "argmin" =>
        val v = second.getOrElse(throw new IllegalArgumentException("argMin needs two arrays"))
        at(arr, Cast(ArrayPosition(v, ArrayMin(v)), IntegerType))
      case "argmax" =>
        val v = second.getOrElse(throw new IllegalArgumentException("argMax needs two arrays"))
        at(arr, Cast(ArrayPosition(v, ArrayMax(v)), IntegerType))
      case other => throw new IllegalArgumentException(
        s"arrayReduce: unsupported aggregate '$other'")
    }
  }

  /** arrayReduceInRanges('agg', ranges, arr) — reference
    * arrayReduceInRanges.cpp: one reduced value per (start, length) tuple
    * (1-based starts, as the reference). Ranges come from tuple() structs. */
  private def arrayReduceInRanges(args: Seq[Expression]): Expression = {
    val (name, param) = parseAggSpec(args.head, "arrayReduceInRanges")
    val ranges = args(1)
    val arr = args(2)
    ArrayTransform(ranges, lam1 { r =>
      val start = Cast(UnresolvedExtractValue(r, Literal("col1")), IntegerType)
      val len = Cast(UnresolvedExtractValue(r, Literal("col2")), IntegerType)
      reduceDispatch(name, param, Slice(arr, start, Greatest(Seq(len, Literal(0)))), None)
    })
  }

  /** Dot product via the codegen'd kernel (VectorExpressions). */
  private def dot(a: Expression, b: Expression): Expression =
    ArrayDotProduct(Cast(a, ArrayType(DoubleType)), Cast(b, ArrayType(DoubleType)))

  private def diff(a: Expression, b: Expression): Expression =
    ZipWith(Cast(a, ArrayType(DoubleType)), Cast(b, ArrayType(DoubleType)),
      lam2(Subtract(_, _)))

  private def l2norm(a: Expression): Expression = Sqrt(dot(a, a))

  private def l1norm(a: Expression): Expression =
    ArrayAggregate(Cast(a, ArrayType(DoubleType)), Literal(0.0d),
      lam2((acc, x) => Add(acc, Abs(x))), LambdaFunction.identity)

  private def linfnorm(a: Expression): Expression =
    Coalesce(Seq(
      ArrayMax(ArrayTransform(Cast(a, ArrayType(DoubleType)), lam1(Abs(_)))),
      Literal(0.0d)))

  private def lpnorm(a: Expression, p: Expression): Expression = {
    val pd = Cast(p, DoubleType)
    Pow(
      ArrayAggregate(Cast(a, ArrayType(DoubleType)), Literal(0.0d),
        lam2((acc, x) => Add(acc, Pow(Abs(x), pd))), LambdaFunction.identity),
      Divide(Literal(1.0d), pd))
  }

  /** Rotate left by pmod(n, size); size-0 guarded lazily (ANSI pmod). */
  private def rotateLeft(arr: Expression, n: Expression): Expression = {
    val m = Pmod(Cast(n, IntegerType), sz(arr))
    If(LessThanOrEqual(sz(arr), Literal(0)), arr,
      Concat(Seq(
        Slice(arr, Add(m, Literal(1)), Subtract(sz(arr), m)),
        Slice(arr, Literal(1), m))))
  }

  /** Shift left: drop n, pad with `pad` (typed NULL when not given). */
  private def shiftLeft(arr: Expression, n: Expression, pad: Expression): Expression = {
    val m = Least(Seq(Greatest(Seq(Cast(n, IntegerType), Literal(0))), sz(arr)))
    Concat(Seq(
      Slice(arr, Add(m, Literal(1)), Subtract(sz(arr), m)),
      ArrayRepeat(pad, m)))
  }

  /** arrayFill(pred, arr): where flag is false, repeat the nearest
    * preceding flagged element (reference src/Functions/array/arrayFill.cpp).
    * Index-fold over 1..n — O(n) appends over per-row arrays. */
  private def fillForward(lambda: Expression, arr: Expression): Expression = {
    val flags = ArrayTransform(arr, lambda)
    If(LessThanOrEqual(sz(arr), Literal(0)), arr,
      ArrayAggregate(
        Sequence(Literal(1), sz(arr), Some(Literal(1))),
        emptyLike(arr),
        lam2((acc, i) =>
          If(Or(Cast(at(flags, i), BooleanType), LessThanOrEqual(sz(acc), Literal(0))),
            Concat(Seq(acc, CreateArray(Seq(at(arr, i))))),
            Concat(Seq(acc, CreateArray(Seq(at(acc, -1))))))),
        LambdaFunction.identity))
  }

  /** arraySplit(pred, arr): cut BEFORE each element whose flag is true
    * (reference src/Functions/array/arraySplit.cpp). */
  private def splitAt(lambda: Expression, arr: Expression): Expression = {
    val flags = ArrayTransform(arr, lambda)
    val cuts = Concat(Seq(
      CreateArray(Seq(Literal(1))),
      ArrayFilter(
        Sequence(Literal(2), sz(arr), Some(Literal(1))),
        lam1(i => Cast(at(flags, i), BooleanType))),
      CreateArray(Seq(Add(sz(arr), Literal(1))))))
    If(LessThanOrEqual(sz(arr), Literal(0)),
      emptyLike(CreateArray(Seq(arr))),
      ArrayTransform(
        Sequence(Literal(1), Subtract(Size(cuts), Literal(1)), Some(Literal(1))),
        lam1(j => Slice(arr, at(cuts, j), Subtract(at(cuts, Add(j, Literal(1))), at(cuts, j))))))
  }

  val builders: Map[String, Seq[Expression] => Expression] = Map(
    // ---- higher-order family, reference lambda-first order ----
    "arraymap" -> (args =>
      if (args.length == 2) ArrayTransform(args(1), args(0))
      else ZipWith(args(1), args(2), args(0))),
    "arrayfilter" -> (args => ArrayFilter(args(1), args(0))),
    "arrayexists" -> (args =>
      if (args.length == 2) ArrayExists(args(1), args(0))
      else ArrayExists(ArrayTransform(args.head,
        lam1(x => Not(EqualTo(Cast(x, DoubleType), Literal(0.0d))))), LambdaFunction.identity)),
    "arrayall" -> (args =>
      if (args.length == 2) ArrayForAll(args(1), args(0))
      else ArrayForAll(ArrayTransform(args.head,
        lam1(x => Not(EqualTo(Cast(x, DoubleType), Literal(0.0d))))), LambdaFunction.identity)),
    "arraycount" -> (args =>
      if (args.length == 2) hofWrap(Size(ArrayFilter(args(1), args(0))))
      else Size(ArrayFilter(args.head,
        lam1(x => Not(EqualTo(Cast(x, DoubleType), Literal(0.0d))))))),
    "arraysum" -> (args =>
      if (args.length == 2) hofWrap(arrSum(ArrayTransform(args(1), args(0))))
      else arrSum(args.head)),
    "arrayavg" -> (args =>
      if (args.length == 2) hofWrap(arrAvg(ArrayTransform(args(1), args(0))))
      else arrAvg(args.head)),
    // reference arrayProduct returns Float64 (arrayAggregation.cpp)
    "arrayproduct" -> (args =>
      ArrayAggregate(Cast(args.head, ArrayType(DoubleType)), Literal(1.0d),
        lam2(Multiply(_, _)), LambdaFunction.identity)),
    // arrayFold((acc, x) -> e, arr, init) — reference arrayFold.cpp
    "arrayfold" -> (args =>
      ArrayAggregate(args(1), args.last, args(0), LambdaFunction.identity)),
    // arrayReduce('agg', arr[, arr2]) — reference arrayReduce.cpp: apply a
    // NAMED aggregate function to array elements. The literal name is
    // dispatched at build time to the equivalent collection expression;
    // quantile/quantileExact accept the parameterized spelling
    // arrayReduce('quantile(0.9)', arr) with the reference's
    // nth_element index n = floor(level * size) (QuantileExact.h).
    "arrayreduce" -> (args => arrayReduce(args)),
    "arrayreduceinranges" -> (args => arrayReduceInRanges(args)),
    // no-match value: the reference returns the element type's DEFAULT (0,
    // '') for arrayFirst/arrayLast and NULL only for the OrNull forms
    // (arrayFirstLast.cpp) — TypeDefault resolves the element type at
    // analysis time.
    "arrayfirst" -> (args => {
      val e = at(ArrayFilter(args(1), args(0)), 1)
      hofWrap(Coalesce(Seq(e, org.apache.spark.sql.graft.TypeDefault(e))))
    }),
    "arraylast" -> (args => {
      val e = at(ArrayFilter(args(1), args(0)), -1)
      hofWrap(Coalesce(Seq(e, org.apache.spark.sql.graft.TypeDefault(e))))
    }),
    "arrayfirstornull" -> (args => hofWrap(at(ArrayFilter(args(1), args(0)), 1))),
    "arraylastornull" -> (args => hofWrap(at(ArrayFilter(args(1), args(0)), -1))),
    "arrayfirstindex" -> (args =>
      hofWrap(ArrayPosition(ArrayTransform(args(1), args(0)), Literal(true)))),
    "arraylastindex" -> (args => {
      val p = ArrayPosition(Reverse(ArrayTransform(args(1), args(0))), Literal(true))
      hofWrap(If(EqualTo(p, Literal(0L)), Literal(0L),
        Add(Subtract(Cast(sz(args(1)), LongType), p), Literal(1L))))
    }),

    // ---- structural transforms ----
    "arraycumsum" -> (args => {
      val arr = if (args.length == 2) ArrayTransform(args(1), args(0)) else args.head
      ArrayAggregate(arr, emptyLike(arr),
        lam2((acc, x) => Concat(Seq(acc,
          CreateArray(Seq(Add(Coalesce(Seq(at(acc, -1), Subtract(x, x))), x)))))),
        LambdaFunction.identity)
    }),
    "arraycumsumnonnegative" -> (args => {
      val arr = if (args.length == 2) ArrayTransform(args(1), args(0)) else args.head
      ArrayAggregate(arr, emptyLike(arr),
        lam2((acc, x) => Concat(Seq(acc, CreateArray(Seq(
          Greatest(Seq(Add(Coalesce(Seq(at(acc, -1), Subtract(x, x))), x),
            Subtract(x, x)))))))),
        LambdaFunction.identity)
    }),
    // arrayDifference([a,b,c]) = [0, b-a, c-b] (arrayDifference.cpp)
    "arraydifference" -> (args => {
      val arr = args.head
      ArrayTransform(arr, lam2((x, i) =>
        If(EqualTo(i, Literal(0)), Subtract(x, x), Subtract(x, at(arr, i)))))
    }),
    // collapse consecutive duplicates (arrayCompact.cpp)
    "arraycompact" -> (args => {
      val arr = args.head
      ArrayAggregate(arr, emptyLike(arr),
        lam2((acc, x) =>
          If(And(GreaterThan(sz(acc), Literal(0)), EqualNullSafe(at(acc, -1), x)),
            acc, Concat(Seq(acc, CreateArray(Seq(x)))))),
        LambdaFunction.identity)
    }),
    "arrayenumerate" -> (args =>
      If(LessThanOrEqual(sz(args.head), Literal(0)),
        Literal.create(Array.empty[Int], ArrayType(IntegerType)),
        Sequence(Literal(1), sz(args.head), Some(Literal(1))))),
    // occurrence counter per element (arrayEnumerateUniq.cpp) — O(n²) over
    // one row's array, fine for per-row use; bulk paths use explode forms.
    "arrayenumerateuniq" -> (args => {
      val arr = args.head
      ArrayTransform(arr, lam2((x, i) =>
        Size(ArrayFilter(Slice(arr, Literal(1), Add(i, Literal(1))),
          lam1(e => EqualNullSafe(e, x))))))
    }),
    // dense first-occurrence rank (arrayEnumerateDense.cpp) — O(n²) per row.
    "arrayenumeratedense" -> (args => {
      val arr = args.head
      ArrayTransform(arr, lam1(x =>
        Size(ArrayDistinct(Slice(arr, Literal(1), ArrayPosition(arr, x))))))
    }),
    "arrayrotateleft" -> (args => rotateLeft(args(0), args(1))),
    "arrayrotateright" -> (args =>
      rotateLeft(args(0), UnaryMinus(Cast(args(1), IntegerType)))),
    "arrayshiftleft" -> (args =>
      shiftLeft(args(0), args(1),
        if (args.length > 2) args(2) else nullElem(args(0)))),
    "arrayshiftright" -> (args => {
      val pad = if (args.length > 2) args(2) else nullElem(args(0))
      Reverse(shiftLeft(Reverse(args(0)), args(1), pad))
    }),
    "arraywithconstant" -> (args => ArrayRepeat(args(1), args(0))),
    // arrayShingles(arr, l) (arrayShingles.cpp)
    "arrayshingles" -> (args => {
      val arr = args(0); val l = Cast(args(1), IntegerType)
      If(Or(LessThan(sz(arr), l), LessThanOrEqual(l, Literal(0))),
        emptyLike(CreateArray(Seq(arr))),
        ArrayTransform(
          Sequence(Literal(1), Add(Subtract(sz(arr), l), Literal(1)), Some(Literal(1))),
          lam1(i => Slice(arr, i, l))))
    }),
    "arrayfill" -> (args => hofWrap(fillForward(args(0), args(1)))),
    "arrayreversefill" -> (args => hofWrap(Reverse(fillForward(args(0), Reverse(args(1)))))),
    "arraysplit" -> (args => hofWrap(splitAt(args(0), args(1)))),
    "arrayreversesplit" -> (args =>
      hofWrap(Reverse(ArrayTransform(splitAt(args(0), Reverse(args(1))), lam1(Reverse(_)))))),

    // ---- set predicates / algebra ----
    "hasall" -> (args => LessThanOrEqual(Size(ArrayExcept(args(1), args(0))), Literal(0))),
    "hasany" -> (args => GreaterThan(Size(ArrayIntersect(args(0), args(1))), Literal(0))),
    // contiguous subsequence (hasSubstr in array.cpp semantics)
    "hassubstr" -> (args => {
      val a = args(0); val b = args(1)
      If(LessThanOrEqual(sz(b), Literal(0)), Literal(true),
        If(LessThan(sz(a), sz(b)), Literal(false),
          ArrayExists(
            Sequence(Literal(1), Add(Subtract(sz(a), sz(b)), Literal(1)), Some(Literal(1))),
            lam1(i => EqualTo(Slice(a, i, sz(b)), b)))))
    }),
    "countequal" -> (args =>
      Size(ArrayFilter(args(0), lam1(x => EqualNullSafe(x, args(1)))))),
    "arrayunion" -> (args => args.reduce((a, b) => ArrayUnion(a, b))),
    "arraysymmetricdifference" -> (args =>
      ArrayExcept(args.reduce((a, b) => ArrayUnion(a, b)),
        args.reduce((a, b) => ArrayIntersect(a, b)))),
    "arrayjaccardindex" -> (args =>
      If(LessThanOrEqual(Size(ArrayUnion(args(0), args(1))), Literal(0)), Literal(1.0d),
        Divide(Cast(Size(ArrayIntersect(args(0), args(1))), DoubleType),
          Cast(Size(ArrayUnion(args(0), args(1))), DoubleType)))),

    // ---- norms / distances (arrayNorm.cpp, arrayDistance.cpp) ----
    "arraydotproduct" -> (args => dot(args(0), args(1))),
    "dotproduct" -> (args => dot(args(0), args(1))),
    "scalarproduct" -> (args => dot(args(0), args(1))),
    "l1norm" -> (args => l1norm(args.head)),
    "l2norm" -> (args => l2norm(args.head)),
    "l2squarednorm" -> (args => dot(args.head, args.head)),
    "linfnorm" -> (args => linfnorm(args.head)),
    "lpnorm" -> (args => lpnorm(args(0), args(1))),
    "norml1" -> (args => l1norm(args.head)),
    "norml2" -> (args => l2norm(args.head)),
    "norml2squared" -> (args => dot(args.head, args.head)),
    "normlinf" -> (args => linfnorm(args.head)),
    "normlp" -> (args => lpnorm(args(0), args(1))),
    "l1distance" -> (args => l1norm(diff(args(0), args(1)))),
    "l2distance" -> (args => l2norm(diff(args(0), args(1)))),
    "l2squareddistance" -> (args => {
      val d = diff(args(0), args(1)); dot(d, d)
    }),
    "linfdistance" -> (args => linfnorm(diff(args(0), args(1)))),
    "lpdistance" -> (args => lpnorm(diff(args(0), args(1)), args(2))),
    "distancel1" -> (args => l1norm(diff(args(0), args(1)))),
    "distancel2" -> (args => l2norm(diff(args(0), args(1)))),
    "distancel2squared" -> (args => {
      val d = diff(args(0), args(1)); dot(d, d)
    }),
    "distancelinf" -> (args => linfnorm(diff(args(0), args(1)))),
    "distancelp" -> (args => lpnorm(diff(args(0), args(1)), args(2))),
    "cosinedistance" -> (args => {
      val den = Multiply(l2norm(args(0)), l2norm(args(1)))
      If(LessThanOrEqual(den, Literal(0.0d)), Literal(1.0d),
        Subtract(Literal(1.0d), Divide(dot(args(0), args(1)), den)))
    }),
    // normalize*(v) — norm subtree re-evaluates per element: O(n²) per row,
    // per-row vectors only; bulk normalization pre-computes the norm column.
    "normalizel1" -> (args => {
      val a = Cast(args.head, ArrayType(DoubleType))
      ArrayTransform(a, lam1(x => If(LessThanOrEqual(l1norm(a), Literal(0.0d)),
        Literal(0.0d), Divide(x, l1norm(a)))))
    }),
    "normalizel2" -> (args => {
      val a = Cast(args.head, ArrayType(DoubleType))
      ArrayTransform(a, lam1(x => If(LessThanOrEqual(l2norm(a), Literal(0.0d)),
        Literal(0.0d), Divide(x, l2norm(a)))))
    }),
    "normalizelinf" -> (args => {
      val a = Cast(args.head, ArrayType(DoubleType))
      ArrayTransform(a, lam1(x => If(LessThanOrEqual(linfnorm(a), Literal(0.0d)),
        Literal(0.0d), Divide(x, linfnorm(a)))))
    }),

    // arrayAUC(scores, labels) — rank-sum AUC over the score-sorted pairs
    // (reference arrayAUC.cpp; distinct scores assumed: no midrank ties).
    "arrayauc" -> (args => {
      val pairs = SortArray(
        ZipWith(Cast(args(0), ArrayType(DoubleType)),
          Cast(args(1), ArrayType(DoubleType)),
          lam2((s, l) => CreateNamedStruct(Seq(Literal("s"), s, Literal("l"), l)))),
        Literal(true))
      val labs = ArrayTransform(pairs,
        lam1(p => UnresolvedExtractValue(p, Literal("l"))))
      val n = Cast(Size(labs), DoubleType)
      val pos = ArrayAggregate(labs, Literal(0.0d), lam2(Add(_, _)),
        LambdaFunction.identity)
      val sumRanks = ArrayAggregate(
        Sequence(Literal(1), Size(labs), Some(Literal(1))),
        Literal(0.0d),
        lam2((acc, i) => Add(acc, Multiply(at(labs, i), Cast(i, DoubleType)))),
        LambdaFunction.identity)
      val neg = Subtract(n, pos)
      If(Or(LessThanOrEqual(pos, Literal(0.0d)), LessThanOrEqual(neg, Literal(0.0d))),
        Literal.create(null, DoubleType),
        Divide(
          Subtract(sumRanks,
            Divide(Multiply(pos, Add(pos, Literal(1.0d))), Literal(2.0d))),
          Multiply(pos, neg)))
    }),
    "indexofassumesorted" -> (args => ArrayPosition(args(0), args(1))),
    "arrayzip" -> (args => ArraysZip(args)),
    // full sort is a valid instance of the reference's "first k ordered,
    // rest unspecified" contract (arrayPartialSort.cpp)
    "arraypartialsort" -> (args => SortArray(args.last, Literal(true))),
    "arraypartialreversesort" -> (args =>
      Reverse(SortArray(args.last, Literal(true)))),
    // 2-D Morton (Z-order) codec (mortonEncode.cpp) — bit-interleave fold
    // over the low 32 bits of each coordinate; per-row scalar use.
    "mortonencode" -> (args => {
      val x = Cast(args(0), LongType); val y = Cast(args(1), LongType)
      ArrayAggregate(
        Sequence(Literal(0), Literal(31), Some(Literal(1))),
        Literal(0L),
        lam2((acc, i) => BitwiseOr(acc,
          BitwiseOr(
            ShiftLeft(BitwiseAnd(ShiftRightUnsigned(x, i), Literal(1L)),
              Multiply(i, Literal(2))),
            ShiftLeft(BitwiseAnd(ShiftRightUnsigned(y, i), Literal(1L)),
              Add(Multiply(i, Literal(2)), Literal(1)))))),
        LambdaFunction.identity)
    }),
    // mortonDecode(2, z) → tuple(x, y)
    "mortondecode" -> (args => {
      val z = Cast(args.last, LongType)
      def deinterleave(offset: Int): Expression =
        ArrayAggregate(
          Sequence(Literal(0), Literal(31), Some(Literal(1))),
          Literal(0L),
          lam2((acc, i) => BitwiseOr(acc,
            ShiftLeft(
              BitwiseAnd(
                ShiftRightUnsigned(z, Add(Multiply(i, Literal(2)), Literal(offset))),
                Literal(1L)),
              i))),
          LambdaFunction.identity)
      CreateNamedStruct(Seq(Literal("x"), deinterleave(0),
        Literal("y"), deinterleave(1)))
    }),
    // heavy-hitter single value (AggregateFunctionAnyHeavy.cpp) — the
    // mode is the deterministic heavy hitter when one exists
    "anyheavy" -> (args => Mode(args.head))
  )
}
