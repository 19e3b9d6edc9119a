package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Runtime struct reshaping — schema-driven Catalyst expressions whose
  * output type derives from the child's STRUCT schema at analysis time
  * (no hand-listed columns, so they compose with any named tuple).
  *
  * tupleToNameValuePairs (reference src/Functions/
  * tupleToNameValuePairs.cpp:60-100): named tuple whose elements all
  * share ONE type → Array(Tuple(name String, value T)) — one (name,
  * value) pair per field, in field order. Mixed element types are an
  * analysis error, like the reference's ILLEGAL_TYPE_OF_ARGUMENT.
  *
  * flattenTuple (reference src/Functions/flattenTuple.cpp +
  * DataTypes/ObjectUtils flattenTuple): named tuple → flat named tuple
  * whose names are the dot-joined paths of the nested leaves
  * (PathInData::getPath). Nested STRUCTS flatten recursively; arrays
  * stay opaque leaves (the reference additionally restructures
  * Array(Tuple) columns — an in-memory columnar layout concern with no
  * analog over Spark rows; documented deviation).
  */
object TupleReshape {

  case class TupleToNameValuePairs(child: Expression)
      extends UnaryExpression with CodegenFallback {

    private lazy val st = child.dataType.asInstanceOf[StructType]

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case s: StructType if s.isEmpty =>
          TypeCheckResult.TypeCheckFailure(
            "the argument tuple for tupleToNameValuePairs must not be empty")
        case s: StructType
            if s.fields.forall(_.dataType == s.fields.head.dataType) =>
          TypeCheckResult.TypeCheckSuccess
        case _: StructType => TypeCheckResult.TypeCheckFailure(
          "the argument tuple for tupleToNameValuePairs must contain " +
            "just one type")
        case other => TypeCheckResult.TypeCheckFailure(
          s"first argument for tupleToNameValuePairs must be a tuple, " +
            s"got ${other.simpleString}")
      }

    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("name", StringType, nullable = false),
        StructField("value", st.fields.head.dataType,
          nullable = st.fields.exists(_.nullable)))),
      containsNull = false)

    override protected def nullSafeEval(input: Any): Any = {
      val row = input.asInstanceOf[InternalRow]
      val items: Array[Any] = st.fields.zipWithIndex.map { case (f, i) =>
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(f.name),
          if (row.isNullAt(i)) null else row.get(i, f.dataType)))
      }
      new GenericArrayData(items)
    }

    override def prettyName: String = "tupletonamevaluepairs"
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** addTupleOfIntervals / subtractTupleOfIntervals (reference
    * src/Functions/FunctionBinaryArithmetic.h tuple-of-intervals lane):
    * apply every interval in the tuple to the date/timestamp, in field
    * order. Schema-driven like the reshapers — the struct's interval
    * field types resolve at analysis time. */
  case class ShiftTupleOfIntervals(date: Expression, tuple: Expression,
      sign: Int) extends Expression with CodegenFallback {
    override def children: Seq[Expression] = Seq(date, tuple)
    override def nullable: Boolean = true

    private lazy val st = tuple.dataType.asInstanceOf[StructType]

    override def checkInputDataTypes(): TypeCheckResult = {
      val dateOk = date.dataType == DateType ||
        date.dataType == TimestampType
      val tupleOk = tuple.dataType match {
        case s: StructType => s.fields.forall(f => f.dataType match {
          case _: YearMonthIntervalType | _: DayTimeIntervalType |
               CalendarIntervalType => true
          case _ => false
        })
        case _ => false
      }
      if (dateOk && tupleOk) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "expected (date/timestamp, tuple of intervals), got " +
          s"(${date.dataType.simpleString}, ${tuple.dataType.simpleString})")
    }

    override def dataType: DataType = date.dataType

    override def eval(input: InternalRow): Any = {
      val d = date.eval(input)
      val t = tuple.eval(input)
      if (d == null || t == null) return null
      val row = t.asInstanceOf[InternalRow]
      var ldt: java.time.LocalDateTime = date.dataType match {
        case DateType => java.time.LocalDate
          .ofEpochDay(d.asInstanceOf[Int].toLong).atStartOfDay()
        case _ => java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(d.asInstanceOf[Long], 1000000L),
          (Math.floorMod(d.asInstanceOf[Long], 1000000L) * 1000).toInt,
          java.time.ZoneOffset.UTC)
      }
      st.fields.zipWithIndex.foreach { case (f, i) =>
        if (!row.isNullAt(i)) f.dataType match {
          case _: YearMonthIntervalType =>
            ldt = ldt.plusMonths(sign.toLong * row.getInt(i))
          case _: DayTimeIntervalType =>
            ldt = ldt.plus(sign.toLong * row.getLong(i),
              java.time.temporal.ChronoUnit.MICROS)
          case CalendarIntervalType =>
            val iv = row.getInterval(i)
            ldt = ldt.plusMonths(sign.toLong * iv.months)
              .plusDays(sign.toLong * iv.days)
              .plus(sign.toLong * iv.microseconds,
                java.time.temporal.ChronoUnit.MICROS)
          case _ =>
        }
      }
      date.dataType match {
        case DateType => ldt.toLocalDate.toEpochDay.toInt
        case _ => ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000L
      }
    }

    override def prettyName: String =
      if (sign > 0) "addtupleofintervals" else "subtracttupleofintervals"
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Expression =
      copy(date = c(0), tuple = c(1))
  }

  case class FlattenTuple(child: Expression)
      extends UnaryExpression with CodegenFallback {

    /** (dotted path, leaf type, nullable-anywhere, index path). */
    private lazy val leaves: Seq[(String, DataType, Boolean, Seq[Int])] = {
      def walk(s: StructType, prefix: String, path: Seq[Int],
          nullableAbove: Boolean): Seq[(String, DataType, Boolean, Seq[Int])] =
        s.fields.toSeq.zipWithIndex.flatMap { case (f, i) =>
          val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
          f.dataType match {
            case nested: StructType =>
              walk(nested, name, path :+ i, nullableAbove || f.nullable)
            case leaf =>
              Seq((name, leaf, nullableAbove || f.nullable, path :+ i))
          }
        }
      walk(child.dataType.asInstanceOf[StructType], "", Nil,
        nullableAbove = false)
    }

    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case _: StructType => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"argument for flattenTuple must be a named tuple, " +
            s"got ${other.simpleString}")
      }

    override def dataType: DataType = StructType(leaves.map {
      case (name, t, nullable, _) => StructField(name, t, nullable)
    })

    override protected def nullSafeEval(input: Any): Any = {
      val root = input.asInstanceOf[InternalRow]
      val out: Array[Any] = leaves.map { case (_, t, _, path) =>
        var cur: InternalRow = root
        var i = 0
        var result: Any = null
        var dead = false
        while (i < path.length && !dead) {
          val idx = path(i)
          if (cur.isNullAt(idx)) dead = true
          else if (i == path.length - 1) result = cur.get(idx, t)
          else cur = cur.getStruct(idx,
            // field count of the intermediate struct is irrelevant to
            // GenericInternalRow access; 0 is accepted by getStruct
            numFieldsOf(path.take(i + 1)))
          i += 1
        }
        result
      }.toArray
      new GenericInternalRow(out)
    }

    private lazy val fieldCounts: Map[Seq[Int], Int] = {
      def walk(s: StructType, path: Seq[Int]): Seq[(Seq[Int], Int)] =
        s.fields.toSeq.zipWithIndex.flatMap { case (f, i) =>
          f.dataType match {
            case nested: StructType =>
              ((path :+ i) -> nested.size) +: walk(nested, path :+ i)
            case _ => Nil
          }
        }
      walk(child.dataType.asInstanceOf[StructType], Nil).toMap
    }
    private def numFieldsOf(path: Seq[Int]): Int =
      fieldCounts.getOrElse(path, 0)

    override def prettyName: String = "flattentuple"
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }
}
