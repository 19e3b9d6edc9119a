package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Round-14 closure of the small input-format residue the round-13
  * verdict re-scoped (reference src/Formats/registerFormats.cpp):
  *
  *   One       (sources Impl/OneFormat.cpp) — ignores the stream and
  *             produces exactly ONE row per input file with a single
  *             UInt8 `dummy` column valued 0. The reference uses it for
  *             `SELECT count() FROM file(..., One)`-style existence /
  *             metadata probes that must not read data.
  *   Form      (Impl/FormRowInputFormat.cpp) — one row per file of
  *             application/x-www-form-urlencoded `k=v&k=v` text;
  *             values percent-decode, unknown keys skip
  *             (skip_unknown_fields), duplicate known keys are LOUD,
  *             omitted columns take their type defaults
  *             (defaults_for_omitted_fields).
  *   HiveText  (Impl/HiveTextRowInputFormat.cpp) — CSV with the Hive
  *             default 0x01 field delimiter, NO header (names come
  *             from the target schema, with_names_use_header), `\N`
  *             nulls. Reads through Spark's native CSV datasource, so
  *             the scan stays distributed/splittable at any size.
  *
  * All three are INPUT-only in the reference (no output registration),
  * and are input-only here.
  */
object ChSmallFormats {

  private def listFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    if (st.isFile) Seq(p.toString)
    else fs.listStatus(p).filter(_.isFile)
      .map(_.getPath)
      .filterNot(x => x.getName.startsWith(".") || x.getName.startsWith("_"))
      .map(_.toString).sorted.toSeq
  }

  /** FORMAT One: one (dummy = 0) row per input file, content unread. */
  def readOne(spark: SparkSession, path: String): DataFrame = {
    val files = listFiles(spark, path)
    val schema = StructType(Seq(StructField("dummy", ShortType,
      nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        files.map(_ => Row(0.toShort)), math.max(files.length, 1)),
      schema)
  }

  private def defaultOf(dt: DataType): Any = dt match {
    case BooleanType => false
    case ByteType => 0.toByte
    case ShortType => 0.toShort
    case IntegerType => 0
    case LongType => 0L
    case FloatType => 0.0f
    case DoubleType => 0.0d
    case StringType => ""
    case d: DecimalType =>
      new java.math.BigDecimal(0).setScale(d.scale)
    case other => throw new IllegalArgumentException(
      s"Form: no default for $other")
  }

  /** FORMAT Form: one row per file of `k=v&k=v` url-encoded text. */
  def readForm(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val files = listFiles(spark, path)
    val fieldIdx = schema.fields.zipWithIndex
      .map { case (f, i) => f.name -> i }.toMap
    val types = schema.fields.map(_.dataType)
    val rows = spark.sparkContext
      .parallelize(files, math.max(files.length, 1))
      .map { file =>
        val p = new Path(file)
        val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val in = fs.open(p)
        val text = try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).stripPrefix("\uFEFF")
        finally in.close()
        val vals = new Array[Any](types.length)
        val seen = new Array[Boolean](types.length)
        text.trim.split("&").filter(_.nonEmpty).foreach { kv =>
          val eq = kv.indexOf('=')
          require(eq >= 0, s"Form: field without '=' in $file: '$kv'")
          val k = kv.substring(0, eq)
          // percent-decode only — Poco::URI::decode keeps '+' literal
          // (java URLDecoder is form-decoding, which would eat it)
          val v = kv.substring(eq + 1).replace("+", "%2B")
          val decoded = java.net.URLDecoder.decode(v, "UTF-8")
          fieldIdx.get(k) match {
            case Some(i) =>
              require(!seen(i),
                s"Form: duplicate field '$k' in $file")
              seen(i) = true
              vals(i) = ChTextFormats.parseRaw(types(i), decoded)
            case None => // skip_unknown_fields
          }
        }
        types.indices.foreach(i =>
          if (!seen(i)) vals(i) = defaultOf(types(i)))
        Row.fromSeq(vals.toIndexedSeq)
      }
    spark.createDataFrame(rows, schema)
  }

  /** FORMAT HiveText: header-less CSV with the Hive 0x01 delimiter
    * and `\N` nulls, column names from the target schema. */
  def readHiveText(spark: SparkSession, path: String, schema: StructType,
      delimiter: String = "\u0001"): DataFrame =
    spark.read
      .schema(schema)
      .option("sep", delimiter)
      .option("header", "false")
      .option("nullValue", "\\N")
      .option("mode", "FAILFAST")
      .csv(path)
}
