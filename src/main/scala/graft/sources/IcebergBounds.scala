package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.avro.generic.GenericRecord
import org.apache.spark.sql.types._

/** Iceberg manifest COLUMN BOUNDS (`lower_bounds` / `upper_bounds`,
  * spec data_file fields 125/128) — file-level min/max statistics for
  * non-partition columns, serialized per the spec's Appendix D
  * "Single-value serialization" (little-endian numerics, UTF-8
  * strings). The reference prunes on these through its
  * `min_max_key_conditions` (ManifestFilesPruning.cpp:188); this
  * module is the shared write/read half: the sink serializes parquet
  * footer statistics into manifest entries, the source deserializes
  * them into the normalized compare domain the
  * [[IcebergManifestFileIndex]] prunes with — so a predicate on a
  * NON-partition column can skip whole files from metadata alone,
  * before any footer is opened.
  *
  * Normalized compare domain: `java.lang.Long` for
  * int/long/date/time/timestamp, `java.lang.Double` for float/double,
  * `String` for strings (compared in UTF-8 byte order — the order
  * parquet binary statistics and the Iceberg spec sort in, which
  * differs from Java's UTF-16 code-unit order for supplementary
  * characters). Types outside the domain (uuid, fixed, binary,
  * decimal, boolean) carry no bounds and always admit.
  */
object IcebergBounds {

  /** File-level bounds for one column, in the normalized domain. */
  final case class ColBounds(min: Option[Any], max: Option[Any])

  // ---- Appendix D single-value serialization ----

  private def leBytes(n: Int)(fill: ByteBuffer => Unit): Array[Byte] = {
    val b = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    fill(b); b.array()
  }

  /** Serialize a normalized-domain value under an ICEBERG type name.
    * None = the type carries no bounds. */
  def serialize(icebergType: String, v: Any): Option[Array[Byte]] =
    (icebergType, v) match {
      case ("int" | "date", x: java.lang.Long) =>
        Some(leBytes(4)(_.putInt(x.intValue)))
      case ("long" | "time" | "timestamp" | "timestamptz",
          x: java.lang.Long) => Some(leBytes(8)(_.putLong(x.longValue)))
      case ("float", x: java.lang.Double) =>
        Some(leBytes(4)(_.putFloat(x.floatValue)))
      case ("double", x: java.lang.Double) =>
        Some(leBytes(8)(_.putDouble(x.doubleValue)))
      case ("string", s: String) => Some(s.getBytes(UTF_8))
      case _ => None
    }

  /** Deserialize a spec-serialized bound under an ICEBERG type name
    * into the normalized domain. None = type outside the domain or a
    * malformed length (admit). */
  def deserialize(icebergType: String, bytes: Array[Byte]): Option[Any] = {
    def le = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    icebergType match {
      case "int" | "date" if bytes.length == 4 =>
        Some(Long.box(le.getInt.toLong))
      case "long" | "time" | "timestamp" | "timestamptz"
          if bytes.length == 8 => Some(Long.box(le.getLong))
      case "float" if bytes.length == 4 =>
        val f = le.getFloat
        if (java.lang.Float.isNaN(f)) None else Some(Double.box(f.toDouble))
      case "double" if bytes.length == 8 =>
        val d = le.getDouble
        if (java.lang.Double.isNaN(d)) None else Some(Double.box(d))
      case "string" => Some(new String(bytes, UTF_8))
      case _ => None
    }
  }

  /** The Iceberg type name a SPARK type serializes as (the write side
    * maps parquet footer statistics through this). None = no bounds
    * for the type. */
  def icebergTypeOf(dt: DataType): Option[String] = dt match {
    case IntegerType => Some("int")
    case LongType => Some("long")
    case FloatType => Some("float")
    case DoubleType => Some("double")
    case DateType => Some("date")
    case TimestampType => Some("timestamptz")
    case TimestampNTZType => Some("timestamp")
    case StringType => Some("string")
    case _ => None
  }

  // ---- normalized-domain comparison (driver-side, file-count scale) --

  /** UTF-8 byte order — parquet/Iceberg's string statistics order. */
  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(UTF_8); val y = b.getBytes(UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return Integer.signum(c)
      i += 1
    }
    Integer.signum(x.length - y.length)
  }

  /** Compare two normalized-domain values; None = incomparable. */
  def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long) => Some(x.compareTo(y))
    case (x: java.lang.Double, y: java.lang.Double) => Some(x.compareTo(y))
    case (x: String, y: String) => Some(utf8Cmp(x, y))
    case _ => None
  }

  /** A CATALYST literal value → the normalized domain (the FileIndex
    * compares pushed-filter literals against deserialized bounds).
    * None = null or an unhandled type (admit). */
  def normLiteral(value: Any, dt: DataType): Option[Any] =
    if (value == null) None
    else dt match {
      case IntegerType | LongType | ShortType | ByteType =>
        Some(Long.box(value.toString.toLong))
      case DateType => Some(Long.box(value.asInstanceOf[Int].toLong))
      case TimestampType | TimestampNTZType =>
        Some(Long.box(value.asInstanceOf[Long]))
      case FloatType =>
        val f = value.asInstanceOf[Float]
        if (java.lang.Float.isNaN(f)) None else Some(Double.box(f.toDouble))
      case DoubleType =>
        val d = value.asInstanceOf[Double]
        if (java.lang.Double.isNaN(d)) None else Some(Double.box(d))
      case StringType => Some(value.toString)
      case _ => None
    }

  // ---- parquet footer statistics → serialized bounds (write side) ----

  /** Per-column (lower, upper) serialized bounds from a parquet
    * footer: top-level primitive columns only, min-of-mins /
    * max-of-maxs across row groups, skipped entirely for a column when
    * any row group lacks statistics or a float/double bound is NaN
    * (absent bounds always admit — never wrong, just unpruned).
    * `colIds`: lower-cased column name → Iceberg field id. */
  def footerBounds(
      footer: org.apache.parquet.hadoop.metadata.ParquetMetadata,
      schema: StructType, colIds: Map[String, Int])
      : (Map[Int, Array[Byte]], Map[Int, Array[Byte]]) = {
    import scala.jdk.CollectionConverters._
    val byName = schema.fields.map(f => f.name.toLowerCase -> f.dataType)
      .toMap
    val lower = Map.newBuilder[Int, Array[Byte]]
    val upper = Map.newBuilder[Int, Array[Byte]]
    val blocks = footer.getBlocks.asScala.toSeq
    if (blocks.isEmpty) return (Map.empty, Map.empty)
    // column path → per-block stats; only top-level primitives have a
    // single-element path
    val perCol = blocks.flatMap(_.getColumns.asScala)
      .groupBy(_.getPath.toArray.toSeq)
      .collect { case (Seq(name), chunks) => name -> chunks }
    perCol.foreach { case (name, chunks) =>
      val key = name.toLowerCase
      for {
        dt <- byName.get(key)
        iceType <- icebergTypeOf(dt)
        id <- colIds.get(key)
      } {
        val stats = chunks.map(_.getStatistics)
        // every chunk must CARRY statistics (an unknown chunk makes
        // the column unboundable); chunks that are all-null contribute
        // no min/max but don't invalidate, and a column with no
        // non-null value anywhere gets no bounds at all
        val allKnown = stats.forall(s => s != null && !s.isEmpty)
        val withValues = stats.filter(s => allKnown && s.hasNonNullValue)
        if (allKnown && withValues.nonEmpty) {
          val mins: Seq[Any] = withValues.flatMap(s =>
            normStat(s.genericGetMin.asInstanceOf[AnyRef], dt))
          val maxs: Seq[Any] = withValues.flatMap(s =>
            normStat(s.genericGetMax.asInstanceOf[AnyRef], dt))
          if (mins.size == withValues.size && maxs.size == withValues.size) {
            val lo = mins.reduce((a, b) =>
              if (cmp(a, b).exists(_ <= 0)) a else b)
            val hi = maxs.reduce((a, b) =>
              if (cmp(a, b).exists(_ >= 0)) a else b)
            for {
              lb <- serialize(iceType, lo)
              ub <- serialize(iceType, hi)
            } { lower += id -> lb; upper += id -> ub }
          }
        }
      }
    }
    (lower.result(), upper.result())
  }

  /** A parquet statistics min/max value → the normalized domain. NaN
    * float/double bounds poison the whole column (None). */
  private def normStat(v: AnyRef, dt: DataType): Option[Any] = (v, dt) match {
    case (x: java.lang.Integer, IntegerType | DateType) =>
      Some(Long.box(x.longValue))
    case (x: java.lang.Long,
        LongType | TimestampType | TimestampNTZType) =>
      Some(Long.box(x.longValue))
    case (x: java.lang.Float, FloatType) =>
      if (java.lang.Float.isNaN(x)) None
      else Some(Double.box(x.doubleValue))
    case (x: java.lang.Double, DoubleType) =>
      if (java.lang.Double.isNaN(x)) None else Some(Double.box(x.doubleValue))
    case (b: org.apache.parquet.io.api.Binary, StringType) =>
      Some(new String(b.getBytes, UTF_8))
    case _ => None
  }

  // ---- Avro manifest entry (de)serialization of the bounds maps ----

  /** Parse a data_file record's `lower_bounds`/`upper_bounds` field:
    * handles both the spec's key/value-record array rendering
    * (logicalType map) and a plain Avro map. Empty when absent. */
  def boundsOfEntry(d: GenericRecord, field: String)
      : Map[Int, Array[Byte]] = {
    if (d.getSchema.getField(field) == null) return Map.empty
    def bytesOf(v: AnyRef): Option[Array[Byte]] = v match {
      case bb: ByteBuffer =>
        val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a)
        Some(a)
      case fx: org.apache.avro.generic.GenericFixed => Some(fx.bytes())
      case _ => None
    }
    d.get(field) match {
      case null => Map.empty
      case arr: java.lang.Iterable[_] =>
        import scala.jdk.CollectionConverters._
        arr.asScala.collect {
          case kv: GenericRecord =>
            for {
              k <- Option(kv.get("key")).map(_.toString.toInt)
              v <- Option(kv.get("value")).flatMap(bytesOf)
            } yield k -> v
        }.flatten.toMap
      case m: java.util.Map[_, _] =>
        import scala.jdk.CollectionConverters._
        m.asScala.flatMap { case (k, v) =>
          for {
            kk <- scala.util.Try(k.toString.toInt).toOption
            vv <- bytesOf(v.asInstanceOf[AnyRef])
          } yield kk -> vv
        }.toMap
      case _ => Map.empty
    }
  }

  /** Deserialize both bounds maps into per-column [[ColBounds]] keyed
    * by LOWER-CASED column name, resolving field ids through
    * `idToNameType` (id → (name, iceberg type name)). */
  def colBoundsOf(lower: Map[Int, Array[Byte]],
      upper: Map[Int, Array[Byte]],
      idToNameType: Map[Int, (String, String)])
      : Map[String, ColBounds] = {
    val ids = (lower.keySet ++ upper.keySet).toSeq
    ids.flatMap { id =>
      idToNameType.get(id).map { case (name, iceType) =>
        name.toLowerCase -> ColBounds(
          lower.get(id).flatMap(deserialize(iceType, _)),
          upper.get(id).flatMap(deserialize(iceType, _)))
      }
    }.toMap.filter { case (_, b) => b.min.nonEmpty || b.max.nonEmpty }
  }
}
