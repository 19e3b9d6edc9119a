package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, expr, lit}
import org.apache.spark.sql.types._

/** Iceberg partition TRANSFORMS (iceberg.apache.org/spec "Partition
  * Transforms" + Appendix B "32-bit Hash Requirements") — the shared
  * evaluation used by the write side (computing each row's partition
  * tuple while staging) and the read side (pruning manifest entries
  * against a query literal). The reference prunes the same transform
  * family in its Iceberg ManifestFilesPruning (identity, temporal
  * year/month/day/hour, bucket, truncate); round 15 covered identity
  * only — real Iceberg tables are overwhelmingly `day(ts)` or
  * `bucket(N, id)` partitioned, so a derived-transform table read
  * correctly but scanned every file.
  *
  * Transform results, per the spec:
  *  - identity: the source value
  *  - bucket[N]: (murmur3_x86_32(bytes(v), seed 0) & Int.MaxValue) % N,
  *    where bytes() is the spec's layout — int/long/date/timestamp hash
  *    as the 8-byte little-endian LONG value, strings as UTF-8 bytes
  *  - truncate[W]: v - (((v % W) + W) % W) for ints, the first W
  *    characters for strings
  *  - year/month: years/months from 1970; day: days from epoch;
  *    hour: micros floorDiv 3_600_000_000
  *
  * Appendix B pins the hash: bucket bytes of long 34 → 2017239379,
  * "iceberg" → 1210000089, date 2017-11-16 → -653330422, timestamp
  * 2017-11-16T22:31:08 → -2047944441 (IcebergTransformsSpec asserts
  * all four against this implementation).
  */
object IcebergTransforms {

  // ---- murmur3_x86_32, the standard public algorithm, seed 0 ----

  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  def murmur3(bytes: Array[Byte], seed: Int): Int = {
    val len = bytes.length
    var h = seed
    var i = 0
    while (i + 4 <= len) {
      var k = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
      k *= C1; k = Integer.rotateLeft(k, 15); k *= C2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    // tail (standard murmur3: accumulate remaining bytes into one k)
    var k = 0
    (len & 3) match {
      case 3 =>
        k ^= (bytes(i + 2) & 0xff) << 16
        k ^= (bytes(i + 1) & 0xff) << 8
        k ^= bytes(i) & 0xff
      case 2 =>
        k ^= (bytes(i + 1) & 0xff) << 8
        k ^= bytes(i) & 0xff
      case 1 =>
        k ^= bytes(i) & 0xff
      case _ =>
    }
    if ((len & 3) != 0) {
      k *= C1; k = Integer.rotateLeft(k, 15); k *= C2; h ^= k
    }
    // finalization mix
    h ^= len
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** Spec rule: int/long/date/time/timestamp all hash as the 8-byte
    * little-endian long. */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    murmur3(b, 0)
  }

  def hashString(s: String): Int =
    murmur3(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), 0)

  def bucketLong(n: Int, v: Long): Int =
    ((hashLong(v) & Int.MaxValue) % n)

  def bucketString(n: Int, s: String): Int =
    ((hashString(s) & Int.MaxValue) % n)

  // ---- the parsed partition-spec field ----

  /** One partition-spec field: `name` is the spec's field name (the
    * tuple key), `transform`/`param` the parsed transform
    * ("bucket[4]" → ("bucket", 4)), `sourceName`/`sourceType` the
    * schema column it derives from, `fieldId` the spec's 1000+
    * partition field id. */
  final case class IcePartField(name: String, transform: String,
      param: Int, sourceName: String, sourceId: Int, fieldId: Int,
      sourceType: DataType)

  private val bucketRe = "^bucket\\[(\\d+)\\]$".r
  private val truncRe = "^truncate\\[(\\d+)\\]$".r

  /** Spec-JSON transform string → (transform, param). */
  def parseTransform(t: String): (String, Int) = t match {
    case "identity" | "year" | "month" | "day" | "hour" | "void" =>
      (t, 0)
    case bucketRe(n) => ("bucket", n.toInt)
    case truncRe(w) => ("truncate", w.toInt)
    case other => throw new IllegalArgumentException(
      s"iceberg: unsupported partition transform '$other'")
  }

  /** (transform, param) → the spec-JSON transform string. */
  def transformString(transform: String, param: Int): String =
    transform match {
      case "bucket" => s"bucket[$param]"
      case "truncate" => s"truncate[$param]"
      case t => t
    }

  /** Parse a caller-facing partitionBy element: a bare column name
    * (identity) or `bucket(N, col)` / `truncate(W, col)` / `year(col)`
    * / `month(col)` / `day(col)` / `hour(col)`. Returns (transform,
    * param, source column). */
  def parseWriteSpec(s: String): (String, Int, String) = {
    val fn2 = "^(bucket|truncate)\\s*\\(\\s*(\\d+)\\s*,\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\)$".r
    val fn1 = "^(year|month|day|hour)\\s*\\(\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\)$".r
    s.trim match {
      case fn2(t, p, c) => (t, p.toInt, c)
      case fn1(t, c) => (t, 0, c)
      case c => ("identity", 0, c)
    }
  }

  /** The spec's conventional field name for a transform. */
  def defaultFieldName(transform: String, param: Int, src: String): String =
    transform match {
      case "identity" => src
      case "bucket" => s"${src}_bucket"
      case "truncate" => s"${src}_trunc"
      case t => s"${src}_$t"
    }

  /** The transform's RESULT type (what the manifest partition struct
    * stores). */
  def resultType(f: IcePartField): DataType = f.transform match {
    case "identity" => f.sourceType
    case "truncate" => f.sourceType
    case "bucket" | "year" | "month" | "day" | "hour" => IntegerType
    case "void" => IntegerType
    case other => throw new IllegalArgumentException(
      s"iceberg: unsupported transform '$other'")
  }

  /** The Avro schema fragment of a result type (the manifest's typed
    * `partition` struct field). Loud on types this writer cannot stage
    * through Hive-style directory names. */
  def resultAvroType(f: IcePartField): String = resultType(f) match {
    case IntegerType => "\"int\""
    case LongType => "\"long\""
    case StringType => "\"string\""
    case BooleanType => "\"boolean\""
    case FloatType => "\"float\""
    case DoubleType => "\"double\""
    case DateType => "{\"type\":\"int\",\"logicalType\":\"date\"}"
    case other => throw new IllegalArgumentException(
      s"iceberg write: partition result type $other is not supported " +
        "for typed manifest tuples")
  }

  /** Write-side staging column: evaluates the transform per row so the
    * Hive-style staging directory names carry the TUPLE value while
    * every source column stays IN the data file. All lanes are
    * codegen'd Spark expressions except bucket, which is a custom
    * Catalyst expression wrapping the spec's murmur3 (still codegen'd
    * through doGenCode — no Scala UDF boundary). Temporal lanes assume
    * the session timezone is UTC (every entry point in this engine
    * sets it). */
  def stagingColumn(f: IcePartField): Column = {
    val src = col(f.sourceName)
    f.transform match {
      case "identity" => src
      case "void" => lit(null).cast(IntegerType)
      case "bucket" =>
        val child = f.sourceType match {
          case IntegerType | LongType => src.cast(LongType)
          case DateType =>
            // days from epoch, hashed as a long per the spec
            expr(s"datediff(`${f.sourceName}`, date'1970-01-01')")
              .cast(LongType)
          case TimestampType | TimestampNTZType =>
            expr(s"unix_micros(cast(`${f.sourceName}` as timestamp))")
          case StringType => src
          case other => throw new IllegalArgumentException(
            s"iceberg write: bucket over $other is not supported")
        }
        val isStr = f.sourceType == StringType
        org.apache.spark.sql.graft.ExprColumn.column(IcebergBucketExpr(
          org.apache.spark.sql.graft.ExprColumn.expression(child),
          f.param, isStr))
      case "truncate" => f.sourceType match {
        case IntegerType | LongType =>
          val w = lit(f.param).cast(f.sourceType)
          (src - (((src % w) + w) % w)).cast(f.sourceType)
        case StringType =>
          org.apache.spark.sql.functions.substring(src, 1, f.param)
        case other => throw new IllegalArgumentException(
          s"iceberg write: truncate over $other is not supported")
      }
      case "year" | "month" | "day" | "hour" =>
        val d = f.sourceType match {
          case DateType => s"`${f.sourceName}`"
          case TimestampType | TimestampNTZType =>
            s"to_date(`${f.sourceName}`)"
          case other => throw new IllegalArgumentException(
            s"iceberg write: ${f.transform} over $other is not supported")
        }
        f.transform match {
          case "year" => expr(s"year($d) - 1970").cast(IntegerType)
          case "month" =>
            expr(s"(year($d) - 1970) * 12 + month($d) - 1")
              .cast(IntegerType)
          case "day" =>
            expr(s"datediff($d, date'1970-01-01')").cast(IntegerType)
          case "hour" =>
            require(f.sourceType != DateType,
              "iceberg write: hour() needs a timestamp source")
            expr(s"cast(unix_micros(cast(`${f.sourceName}` as timestamp))" +
              " div 3600000000 as int)")
        }
      case other => throw new IllegalArgumentException(
        s"iceberg write: unsupported transform '$other'")
    }
  }

  /** Canonical string rendering of a tuple value, used on BOTH sides
    * of the prune comparison (manifest entry vs transformed query
    * literal). Identity-over-date renders ISO (matching the Hive-style
    * staging dirs the sink records in partition_json); date-typed
    * struct ints convert. Identity-over-timestamp canonicalizes to RAW
    * EPOCH MICROS — external typed partition structs store the long
    * micros value, and [[transformLiteral]] renders the query literal
    * the same way, so the two sides agree (round 17: the ISO-vs-micros
    * mismatch silently pruned every file on external
    * identity-timestamp tables). */
  def canonicalOfAvro(value: AnyRef, f: IcePartField): Option[String] =
    Option(value).map { v =>
      (resultType(f), v) match {
        case (DateType, i: java.lang.Integer) =>
          java.time.LocalDate.ofEpochDay(i.longValue).toString
        case (DateType, l: java.lang.Long) =>
          java.time.LocalDate.ofEpochDay(l.longValue).toString
        case _ => v.toString
      }
    }

  /** Is a typed struct value RENDERABLE into the canonical string form
    * the pruner compares? Avro fixed/bytes values (uuid, binary,
    * decimal partition sources) have no faithful canonical string —
    * entryTuple DROPS such fields so the file always admits, instead
    * of comparing a Java toString that can never match and silently
    * pruning every file. */
  def renderableStructValue(v: AnyRef): Boolean = v match {
    case null => true
    case _: java.nio.ByteBuffer => false
    case _: org.apache.avro.generic.GenericFixed => false
    case _ => true
  }

  /** Evaluate the transform over a query literal (rendered as a
    * string: "7", "2024-03-05", "2024-03-05 17:00:00", "hello") into
    * the canonical tuple string. None = the literal cannot be parsed
    * for this source type, so the caller must NOT prune. */
  def transformLiteral(f: IcePartField, raw: String): Option[String] = {
    def parsedLong: Option[Long] = f.sourceType match {
      case IntegerType | LongType => raw.toLongOption
      case DateType => scala.util.Try(
        java.time.LocalDate.parse(raw).toEpochDay).toOption
      case TimestampType | TimestampNTZType => parsedMicros
      case _ => None
    }
    def parsedMicros: Option[Long] = scala.util.Try {
      val norm = raw.replace(' ', 'T')
      val ldt =
        if (norm.length <= 10) java.time.LocalDate.parse(norm).atStartOfDay
        else java.time.LocalDateTime.parse(norm)
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000
    }.toOption
    def parsedDays: Option[Long] = f.sourceType match {
      case DateType => scala.util.Try(
        java.time.LocalDate.parse(raw).toEpochDay).toOption
      case TimestampType | TimestampNTZType =>
        parsedMicros.map(m => Math.floorDiv(m, 86400000000L))
      case _ => None
    }
    f.transform match {
      case "identity" => f.sourceType match {
        // canonical for identity-over-timestamp is epoch MICROS (what
        // the typed partition struct stores); everything else compares
        // the raw rendering directly
        case TimestampType | TimestampNTZType =>
          parsedMicros.map(_.toString)
        case _ => Some(raw)
      }
      case "bucket" => f.sourceType match {
        case StringType => Some(bucketString(f.param, raw).toString)
        case _ => parsedLong.map(v => bucketLong(f.param, v).toString)
      }
      case "truncate" => f.sourceType match {
        case StringType => Some(raw.take(f.param))
        case IntegerType | LongType => raw.toLongOption.map { v =>
          val w = f.param.toLong
          (v - (((v % w) + w) % w)).toString
        }
        case _ => None
      }
      case "day" => parsedDays.map(_.toString)
      case "year" => parsedDays.map(d =>
        (java.time.LocalDate.ofEpochDay(d).getYear - 1970).toString)
      case "month" => parsedDays.map { d =>
        val ld = java.time.LocalDate.ofEpochDay(d)
        ((ld.getYear - 1970) * 12 + ld.getMonthValue - 1).toString
      }
      case "hour" =>
        parsedMicros.map(m => Math.floorDiv(m, 3600000000L).toString)
      case _ => None
    }
  }

  /** Does a file whose recorded `tuple` admit rows where source column
    * `src` equals the literal rendered as `raw`? Shared by the static
    * read-side pruning (`pruneSource`) and the dynamic
    * [[IcebergManifestFileIndex]] planning-time pruning so the two can
    * never disagree. None tuples, unevaluable literals, and spec
    * fields of other sources all ADMIT (keep = safe). */
  def tupleAdmitsSource(tuple: Option[Map[String, Option[String]]],
      fields: Seq[IcePartField], src: String, raw: String): Boolean =
    tuple match {
      case None => true
      case Some(t) =>
        fields.filter(_.sourceName.equalsIgnoreCase(src)).forall { f =>
          (transformLiteral(f, raw), t.get(f.name)) match {
            case (Some(expect), Some(Some(actual))) => expect == actual
            // a non-null literal cannot live in a null tuple
            case (Some(_), Some(None)) => false
            case _ => true // unevaluable — keep the file
          }
        }
    }

  /** Transforms whose result is MONOTONIC NON-DECREASING in the source
    * value, so a transformed bound compares directly against a file's
    * tuple value (the reference's partition KeyCondition prunes exactly
    * this family on ranges — ManifestFilesPruning.cpp:44-93). Bucket is
    * a hash: equality-only, never range-pruned. */
  def orderPreservingTransform(f: IcePartField): Boolean =
    f.transform match {
      case "identity" | "truncate" | "year" | "month" | "day" | "hour" =>
        true
      case _ => false
    }

  /** Compare two canonical tuple strings under the field's RESULT
    * domain. None = not comparable (unparseable or a type without a
    * defined order here) — callers must admit. Timestamp-result fields
    * (identity over a timestamp source) canonicalize to epoch micros,
    * so they compare as longs. */
  def compareCanonical(f: IcePartField, a: String, b: String)
      : Option[Int] = resultType(f) match {
    case IntegerType | LongType | TimestampType | TimestampNTZType =>
      for (x <- a.toLongOption; y <- b.toLongOption)
        yield java.lang.Long.compare(x, y)
    case FloatType | DoubleType =>
      for (x <- a.toDoubleOption; y <- b.toDoubleOption)
        yield java.lang.Double.compare(x, y)
    case DateType => scala.util.Try(java.lang.Long.compare(
      java.time.LocalDate.parse(a).toEpochDay,
      java.time.LocalDate.parse(b).toEpochDay)).toOption
    case StringType => Some(Integer.signum(a.compareTo(b)))
    case _ => None
  }

  /** Evaluate an order-preserving transform over the literal SHIFTED
    * by `delta` in the source's discrete unit (ints: 1, dates: days,
    * timestamps: micros) — the exact-bound trick for STRICT
    * inequalities: `v < X ⟺ v <= X-ε`, so the admit test compares
    * against `t(X-ε)` instead of the conservative `t(X)` (a
    * `ts < midnight` predicate then prunes the midnight day instead of
    * admitting it). None for string sources, unparseable literals, or
    * overflow — callers fall back to the unshifted bound. */
  def transformLiteralShifted(f: IcePartField, raw: String,
      delta: Long): Option[String] = {
    val base: Option[Long] = f.sourceType match {
      case IntegerType | LongType => raw.toLongOption
      case DateType => scala.util.Try(
        java.time.LocalDate.parse(raw).toEpochDay).toOption
      case TimestampType | TimestampNTZType => scala.util.Try {
        val norm = raw.replace(' ', 'T')
        val ldt =
          if (norm.length <= 10)
            java.time.LocalDate.parse(norm).atStartOfDay
          else java.time.LocalDateTime.parse(norm)
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
          ldt.getNano / 1000
      }.toOption
      case _ => None
    }
    base.flatMap(v0 =>
        scala.util.Try(Math.addExact(v0, delta)).toOption)
      .flatMap(v => evalFromDomain(f, v))
  }

  /** Evaluate a transform over a source value in its LONG domain
    * (int/long value, date epoch days, timestamp epoch micros) into
    * the canonical tuple string. Order-preserving transforms only. */
  private def evalFromDomain(f: IcePartField, v: Long): Option[String] = {
    def days: Option[Long] = f.sourceType match {
      case DateType => Some(v)
      case TimestampType | TimestampNTZType =>
        Some(Math.floorDiv(v, 86400000000L))
      case _ => None
    }
    f.transform match {
      case "identity" => f.sourceType match {
        case IntegerType | LongType | TimestampType | TimestampNTZType =>
          Some(v.toString)
        case DateType =>
          Some(java.time.LocalDate.ofEpochDay(v).toString)
        case _ => None
      }
      case "truncate" => f.sourceType match {
        case IntegerType | LongType =>
          val w = f.param.toLong
          Some((v - (((v % w) + w) % w)).toString)
        case _ => None
      }
      case "day" => days.map(_.toString)
      case "year" => days.map(d =>
        (java.time.LocalDate.ofEpochDay(d).getYear - 1970).toString)
      case "month" => days.map { d =>
        val ld = java.time.LocalDate.ofEpochDay(d)
        ((ld.getYear - 1970) * 12 + ld.getMonthValue - 1).toString
      }
      case "hour" => f.sourceType match {
        case TimestampType | TimestampNTZType =>
          Some(Math.floorDiv(v, 3600000000L).toString)
        case _ => None
      }
      case _ => None
    }
  }

  /** Range analog of [[tupleAdmitsSource]]: may a file whose recorded
    * `tuple` contain rows where source column `src` satisfies an
    * INEQUALITY against the literal `raw`? `lower` = the predicate
    * bounds the column from BELOW (`src > raw` / `src >= raw`);
    * otherwise from above. Because every order-preserving transform t
    * is monotonic non-decreasing, `v >= X ⇒ t(v) >= t(X)`: a file with
    * tuple T can hold a qualifying row only if `T >= t(X)` (lower) /
    * `T <= t(X)` (upper). STRICT predicates tighten the bound exactly
    * by shifting one discrete unit (`v > X ⟺ v >= X+ε` →
    * `T >= t(X+ε)`) when the domain allows, falling back to the
    * non-strict bound otherwise. Bucket and unevaluable shapes always
    * admit; a NULL tuple value satisfies no inequality and prunes. */
  def tupleAdmitsSourceBound(tuple: Option[Map[String, Option[String]]],
      fields: Seq[IcePartField], src: String, raw: String,
      lower: Boolean, strict: Boolean = false): Boolean =
    tuple match {
      case None => true
      case Some(t) =>
        fields.filter(f => f.sourceName.equalsIgnoreCase(src) &&
            orderPreservingTransform(f)).forall { f =>
          val bound =
            if (strict)
              transformLiteralShifted(f, raw, if (lower) 1L else -1L)
                .orElse(transformLiteral(f, raw))
            else transformLiteral(f, raw)
          (bound, t.get(f.name)) match {
            case (Some(b), Some(Some(actual))) =>
              compareCanonical(f, actual, b) match {
                case Some(c) => if (lower) c >= 0 else c <= 0
                case None => true
              }
            case (Some(_), Some(None)) => false
            case _ => true
          }
        }
    }

  /** NULL-predicate pruning: transforms of null are null (spec rule),
    * so `src IS NULL` admits only files whose tuple value is null, and
    * `src IS NOT NULL` only files whose tuple value is not. Applies to
    * every VALUE transform including bucket — but never void, whose
    * result is null for every source value. Absent tuples/fields
    * admit. */
  def tupleAdmitsSourceNull(tuple: Option[Map[String, Option[String]]],
      fields: Seq[IcePartField], src: String, isNull: Boolean): Boolean =
    tuple match {
      case None => true
      case Some(t) =>
        fields.filter(f => f.sourceName.equalsIgnoreCase(src) &&
            f.transform != "void").forall { f =>
          t.get(f.name) match {
            case Some(Some(_)) => !isNull
            case Some(None) => isNull
            case None => true
          }
        }
    }

  /** Render a CATALYST literal (internal representation) as the raw
    * string [[transformLiteral]] parses — ints/longs/strings verbatim,
    * DateType days and TimestampType micros as ISO text. None = a type
    * the pruner does not evaluate (keep the file). */
  def rawOfLiteral(value: Any, dt: DataType): Option[String] =
    if (value == null) None
    else dt match {
      case IntegerType | LongType | ShortType | ByteType =>
        Some(value.toString)
      case StringType => Some(value.toString)
      case DateType => Some(java.time.LocalDate
        .ofEpochDay(value.asInstanceOf[Int].toLong).toString)
      case TimestampType | TimestampNTZType =>
        val us = value.asInstanceOf[Long]
        val secs = Math.floorDiv(us, 1000000L)
        val nanos = (Math.floorMod(us, 1000000L) * 1000L).toInt
        Some(java.time.LocalDateTime.ofEpochSecond(secs, nanos,
          java.time.ZoneOffset.UTC).toString)
      case _ => None
    }

  /** Parse a tuple string back to the typed value the manifest's
    * partition struct stores (Hive staging renders everything as
    * strings). */
  def typedOfCanonical(s: Option[String], f: IcePartField): AnyRef =
    s match {
      case None => null
      case Some(v) => resultType(f) match {
        case IntegerType => Int.box(v.toInt)
        case LongType => Long.box(v.toLong)
        case StringType => v
        case BooleanType => Boolean.box(v.toBoolean)
        case FloatType => Float.box(v.toFloat)
        case DoubleType => Double.box(v.toDouble)
        case DateType =>
          Int.box(java.time.LocalDate.parse(v).toEpochDay.toInt)
        case other => throw new IllegalArgumentException(
          s"iceberg write: cannot type tuple value '$v' as $other")
      }
    }

  /** Extract a manifest entry's partition tuple as canonical strings
    * keyed by spec field name: the spec's typed `partition` struct
    * when present (external engines and this sink both write it),
    * falling back to the sink's `partition_json` convenience field.
    * None = no tuple recorded (cannot prune). */
  def entryTuple(d: org.apache.avro.generic.GenericRecord,
      fields: Seq[IcePartField],
      mapper: com.fasterxml.jackson.databind.ObjectMapper)
      : Option[Map[String, Option[String]]] = {
    def opt(name: String): Option[AnyRef] =
      if (d.getSchema.getField(name) == null) None else Option(d.get(name))
    val fromStruct: Option[Map[String, Option[String]]] =
      if (fields.isEmpty) None
      else opt("partition").collect {
        case r: org.apache.avro.generic.GenericRecord =>
          fields.flatMap { f =>
            if (r.getSchema.getField(f.name) == null) None
            else {
              val v = r.get(f.name)
              // fixed/bytes values (uuid, binary, decimal) have no
              // faithful string canonical — drop the field so the
              // pruner always admits instead of never matching
              if (!renderableStructValue(v)) None
              else Some(f.name -> canonicalOfAvro(v, f))
            }
          }.toMap
      }.filter(_.nonEmpty)
    fromStruct.orElse {
      opt("partition_json").map { tj =>
        val node = mapper.readTree(tj.toString)
        val it = node.properties().iterator()
        val b = Map.newBuilder[String, Option[String]]
        while (it.hasNext) {
          val e = it.next()
          b += e.getKey -> (if (e.getValue.isNull) None
            else Some(e.getValue.asText))
        }
        b.result()
      }
    }
  }

  /** Parse the metadata JSON's default partition spec into fields,
    * resolving source name/type through the schema node's field ids.
    * Empty for unpartitioned tables. */
  def specFieldsOf(meta: com.fasterxml.jackson.databind.JsonNode,
      schemaNode: com.fasterxml.jackson.databind.JsonNode)
      : Seq[IcePartField] = {
    val specs = Option(meta.get("partition-specs")).toSeq
      .flatMap(arr => (0 until arr.size).map(arr.get))
    if (specs.isEmpty) return Nil
    val defaultId = Option(meta.get("default-spec-id")).map(_.asInt)
      .getOrElse(0)
    val spec = specs.find(s =>
      Option(s.get("spec-id")).exists(_.asInt == defaultId))
      .getOrElse(specs.head)
    val byId: Map[Int, (String, DataType)] = {
      val fields = schemaNode.get("fields")
      (0 until fields.size).flatMap { i =>
        val f = fields.get(i)
        Option(f.get("id")).map(_.asInt ->
          (f.get("name").asText,
            scala.util.Try(sparkTypeOfIceberg(f.get("type")))
              .getOrElse(NullType)))
      }.toMap
    }
    val fields = Option(spec.get("fields")).toSeq
      .flatMap(arr => (0 until arr.size).map(arr.get))
    fields.map { f =>
      val (tr, p) = parseTransform(f.get("transform").asText)
      val srcId = f.get("source-id").asInt
      val (srcName, srcType) = byId.getOrElse(srcId,
        throw new IllegalArgumentException(
          s"iceberg: partition source-id $srcId is not a top-level " +
            "schema field"))
      IcePartField(f.get("name").asText, tr, p, srcName, srcId,
        Option(f.get("field-id")).map(_.asInt).getOrElse(1000),
        srcType)
    }
  }

  /** Iceberg primitive type name → Spark type (partition sources are
    * primitives; complex source types cannot be partition sources). */
  private def sparkTypeOfIceberg(
      t: com.fasterxml.jackson.databind.JsonNode): DataType = {
    require(t.isTextual, "iceberg: partition source type must be primitive")
    t.asText match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "date" => DateType
      case "timestamp" => TimestampNTZType
      case "timestamptz" => TimestampType
      case "string" | "uuid" => StringType
      case s if s.startsWith("decimal(") =>
        val Array(p, sc) = s.stripPrefix("decimal(").stripSuffix(")")
          .split(",").map(_.trim.toInt)
        DecimalType(p, sc)
      case other => throw new IllegalArgumentException(
        s"iceberg: unsupported partition source type '$other'")
    }
  }
}

/** Codegen'd Iceberg bucket transform: murmur3_x86_32 (seed 0, the
  * spec's byte layouts) of the child, masked and modded into N buckets.
  * `stringInput` = the child is a string (UTF-8 bytes hash); otherwise
  * the child is a long (8-byte little-endian hash — the spec's rule for
  * int/long/date/timestamp). */
private[graft] case class IcebergBucketExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    numBuckets: Int, stringInput: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(numBuckets > 0, "iceberg bucket: N must be positive")
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(v: Any): Any =
    if (stringInput)
      IcebergTransforms.bucketString(numBuckets,
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
    else IcebergTransforms.bucketLong(numBuckets, v.asInstanceOf[Long])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val obj = "graft.sources.IcebergTransforms"
    if (stringInput)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $obj.bucketString($numBuckets, $c.toString());")
    else
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $obj.bucketLong($numBuckets, $c);")
  }
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = newChild)
}
