package graft

import java.nio.file.Files

import graft.sources.ChTextFormats
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** TSV / CSV / JSONCompactEachRow / Values text codecs (ref
  * TabSeparatedRow*Format.cpp, CSVRow*Format.cpp,
  * JSONCompactEachRow*Format.cpp, ValuesBlockInputFormat.cpp). Golden
  * pins for the documented escaping plus adversarial roundtrips: tabs,
  * newlines, quotes, backslashes, unicode, nulls, and header
  * verification. */
class ChTextFormatsSpec extends SparkFunSuite {

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"txt_$name").toString
    new java.io.File(d).deleteOnExit()
    d
  }

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("s", StringType, nullable = true),
    StructField("x", DoubleType, nullable = false),
    StructField("ts", TimestampType, nullable = false)))

  private val ts = java.sql.Timestamp.from(java.time.Instant.parse("2024-06-01T12:34:56.789012Z"))

  private val nasty = Seq(
    Row(1L, "plain", 1.5, ts),
    Row(2L, "tab\there", -2.25, ts),
    Row(3L, "new\nline", 0.0, ts),
    Row(4L, "quote\"and'apos", 3.0, ts),
    Row(5L, "back\\slash", Double.NaN, ts),
    Row(6L, null, Double.PositiveInfinity, ts),
    Row(7L, "unié中文", -0.125, ts),
    Row(8L, "comma,sep", 1e300, ts))

  private def df = spark.createDataFrame(
    spark.sparkContext.parallelize(nasty, 3), schema)

  private def sortedRows(d: org.apache.spark.sql.DataFrame): Seq[Row] =
    d.collect().sortBy(_.getLong(0)).toSeq

  private def assertSame(back: org.apache.spark.sql.DataFrame): Unit = {
    val a = sortedRows(back); val b = nasty
    assert(a.size == b.size)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      assert(x.getAs[String](1) == y.getAs[String](1), s"row ${y.getLong(0)} string")
      val dx = x.getDouble(2); val dy = y.getDouble(2)
      assert(java.lang.Double.doubleToLongBits(dx) == java.lang.Double.doubleToLongBits(dy)
        || (dx == dy), s"row ${y.getLong(0)} double $dx != $dy")
      assert(x.getAs[java.sql.Timestamp](3) == y.getAs[java.sql.Timestamp](3))
    }
  }

  test("TSV roundtrips adversarial strings, nulls, denormals") {
    val p = tmp("tsv")
    ChTextFormats.writeTabSeparated(df, p, withNames = true, withTypes = true)
    assertSame(ChTextFormats.readTabSeparated(spark, p, schema, withNames = true, withTypes = true))
  }

  test("CSV roundtrips adversarial strings, nulls, embedded newlines") {
    val p = tmp("csv")
    ChTextFormats.writeCsv(df, p, withNames = true, withTypes = true)
    assertSame(ChTextFormats.readCsv(spark, p, schema, withNames = true, withTypes = true))
  }

  test("JSONCompactEachRow roundtrips with names+types header") {
    val p = tmp("jsonc")
    ChTextFormats.writeJsonCompactEachRow(df, p, withNamesAndTypes = true)
    assertSame(ChTextFormats.readJsonCompactEachRow(spark, p, schema, withNamesAndTypes = true))
  }

  test("Values roundtrips adversarial strings and NULL") {
    val p = tmp("values")
    ChTextFormats.writeValues(df, p)
    assertSame(ChTextFormats.readValues(spark, p, schema))
  }

  test("TSV golden bytes: escaping, \\N null, DateTime64(6) text") {
    val one = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(9L, "a\tb\nc\\d", 1.5, ts), Row(10L, null, 2.0, ts)), 1), schema)
    val p = tmp("tsvg")
    ChTextFormats.writeTabSeparated(one, p)
    val dir = new java.io.File(p)
    val part = dir.listFiles().filter(_.getName.endsWith(".tsv")).head
    val text = new String(Files.readAllBytes(part.toPath), "UTF-8")
    assert(text ==
      "9\ta\\tb\\nc\\\\d\t1.5\t2024-06-01 12:34:56.789012\n" +
      "10\t\\N\t2.0\t2024-06-01 12:34:56.789012\n", s"got: $text")
  }

  test("CSV golden bytes: doubled quotes, quoted textual fields, bare numerics") {
    val one = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "say \"hi\"", 2.5, ts), Row(2L, null, 3.0, ts)), 1), schema)
    val p = tmp("csvg")
    ChTextFormats.writeCsv(one, p)
    val part = new java.io.File(p).listFiles().filter(_.getName.endsWith(".csv")).head
    val text = new String(Files.readAllBytes(part.toPath), "UTF-8")
    assert(text ==
      "1,\"say \"\"hi\"\"\",2.5,\"2024-06-01 12:34:56.789012\"\n" +
      "2,\\N,3.0,\"2024-06-01 12:34:56.789012\"\n", s"got: $text")
  }

  test("header verification fails loudly on a schema mismatch") {
    val p = tmp("tsvh")
    ChTextFormats.writeTabSeparated(df, p, withNames = true, withTypes = true)
    val wrong = StructType(schema.fields.map {
      case f if f.name == "x" => f.copy(name = "y")
      case f => f
    }.toSeq)
    val ex = intercept[Exception] {
      ChTextFormats.readTabSeparated(spark, p, wrong, withNames = true, withTypes = true).collect()
    }
    assert(ex.getMessage != null)
  }

  test("TSKV roundtrips adversarial strings with self-describing keys") {
    val p = tmp("tskv")
    ChTextFormats.writeTskv(df, p)
    assertSame(ChTextFormats.readTskv(spark, p, schema))
  }

  test("TSKV reads column-order-independent (self-describing rows)") {
    val p = tmp("tskv2")
    ChTextFormats.writeTskv(df, p)
    val reordered = StructType(Seq(schema("ts"), schema("id"), schema("x"), schema("s")))
    val back = ChTextFormats.readTskv(spark, p, reordered)
    val byId = back.collect().map(r => r.getLong(1) -> r.getAs[String](3)).toMap
    assert(byId(1L) == "plain" && byId(6L) == null)
  }

  test("CustomSeparated roundtrips with multi-char delimiters") {
    val p = tmp("custom")
    ChTextFormats.writeCustomSeparated(df, p, "||", ";\n")
    assertSame(ChTextFormats.readCustomSeparated(spark, p, schema, "||", ";\n"))
  }

  test("Pretty golden render: box drawing, alignment, NULL marker") {
    val one = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "alpha", 2.5, ts), Row(42L, null, -1.0, ts)), 1), schema)
    val text = ChTextFormats.renderPretty(one.orderBy("id"))
    val expected =
      "┌─id─┬─s─────┬─x────┬─ts─────────────────────────┐\n" +
      "│  1 │ alpha │  2.5 │ 2024-06-01 12:34:56.789012 │\n" +
      "│ 42 │ ᴺᵁᴸᴸ  │ -1.0 │ 2024-06-01 12:34:56.789012 │\n" +
      "└────┴───────┴──────┴────────────────────────────┘\n"
    assert(text == expected, s"got:\n$text")
  }

  test("JSONObjectEachRow roundtrips adversarial strings; binds by name") {
    val p = tmp("jsonobj")
    ChTextFormats.writeJsonObjectEachRow(df, p)
    assertSame(ChTextFormats.readJsonObjectEachRow(spark, p, schema))
    // by-name binding: a column-reordered schema still reads correctly
    val reordered = StructType(Seq(schema("s"), schema("id")))
    val back = ChTextFormats.readJsonObjectEachRow(spark, p, reordered)
    val byId = back.collect().map(r => r.getLong(1) -> r.getAs[String](0)).toMap
    assert(byId(1L) == "plain" && byId(6L) == null)
  }

  test("Markdown render escapes pipes; Vertical aligns and marks nulls") {
    val s2 = StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("t", StringType, nullable = true)))
    val one = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(7L, "a|b"), Row(8L, null)), 1), s2)
    val md = ChTextFormats.renderMarkdown(one.orderBy("n"))
    assert(md ==
      "| n | t |\n| --: | :-- |\n| 7 | a\\|b |\n| 8 | ᴺᵁᴸᴸ |\n", s"got:\n$md")
    val v = ChTextFormats.renderVertical(one.orderBy("n"))
    assert(v == "Row 1:\n──────\nn: 7\nt: a|b\n\nRow 2:\n──────\nn: 8\nt: ᴺᵁᴸᴸ\n",
      s"got:\n$v")
  }

  test("JSONStringsEachRow roundtrips adversarial strings as all-string cells") {
    val p = tmp("jsonstrings")
    ChTextFormats.writeJsonStringsEachRow(df, p)
    assertSame(ChTextFormats.readJsonStringsEachRow(spark, p, schema))
  }

  test("JSON document: meta verified, rows count verified, roundtrip exact") {
    val p = tmp("jsondoc")
    ChTextFormats.writeJsonDocument(df, p)
    assertSame(ChTextFormats.readJsonDocument(spark, p, schema))
    // a WRONG schema fails loudly on the meta block, not silently
    val drifted = StructType(Seq(schema("id").copy(name = "nope"),
      schema("s"), schema("x"), schema("ts")))
    val err = intercept[Exception] {
      ChTextFormats.readJsonDocument(spark, p, drifted).collect()
    }
    assert(err.getMessage != null)
  }

  test("TabSeparatedRaw roundtrips clean values; separators fail LOUDLY") {
    val s2 = StructType(Seq(
      StructField("n", LongType, nullable = false),
      StructField("t", StringType, nullable = true)))
    val clean = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, "plain"), Row(2L, null), Row(3L, "no escapes here")), 1), s2)
    val p = tmp("tsvraw")
    ChTextFormats.writeTabSeparatedRaw(clean, p)
    val back = ChTextFormats.readTabSeparatedRaw(spark, p, s2)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(back.toSeq == Seq((1L, "plain"), (2L, null), (3L, "no escapes here")))
    val dirty = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(9L, "tab\there")), 1), s2)
    val err = intercept[org.apache.spark.SparkException] {
      ChTextFormats.writeTabSeparatedRaw(dirty, tmp("tsvraw_bad"))
    }
    assert(err.getMessage.contains("TabSeparatedRaw") ||
      err.getCause != null)
  }

  test("empty-string single-column row survives the TSV roundtrip") {
    // r6 ADVICE: an empty line is a REAL row for a one-string-column
    // schema; only the final row delimiter's trailing empty element drops
    val one = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType, nullable = false)))
    val src = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("alpha"), Row(""), Row("omega")), 1), one)
    val p = tmp("tsv_empty")
    ChTextFormats.writeTabSeparated(src, p)
    val back = ChTextFormats.readTabSeparated(spark, p, one)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(back == Seq("", "alpha", "omega"), s"got $back")
  }

  test("read parallelism is one task per part file") {
    val p = tmp("tsvp")
    ChTextFormats.writeTabSeparated(df.repartition(3), p)
    val back = ChTextFormats.readTabSeparated(spark, p, schema)
    assert(back.rdd.getNumPartitions == 3)
  }

  test("JSONCompact document: meta verified, array rows, roundtrip exact") {
    val p = tmp("jsoncompact")
    ChTextFormats.writeJsonCompactDocument(df, p)
    assertSame(ChTextFormats.readJsonCompactDocument(spark, p, schema))
    val drifted = StructType(Seq(schema("id").copy(name = "nope"),
      schema("s"), schema("x"), schema("ts")))
    val err = intercept[Exception] {
      ChTextFormats.readJsonCompactDocument(spark, p, drifted).collect()
    }
    assert(err.getMessage.contains("meta") || err.getMessage.contains("Meta")
      || err.getMessage.contains("nope"))
  }

  test("JSONCompactColumns: positional binding, arity verified, roundtrip") {
    val p = tmp("jsoncompactcols")
    ChTextFormats.writeJsonCompactColumns(df, p)
    assertSame(ChTextFormats.readJsonCompactColumns(spark, p, schema))
    // a schema with the wrong column COUNT fails loudly (positional form
    // has no names to reconcile by)
    val narrower = StructType(schema.fields.take(2))
    val err = intercept[Exception] {
      ChTextFormats.readJsonCompactColumns(spark, p, narrower).collect()
    }
    assert(err.getMessage.contains("columns"))
  }

  test("JSONColumnsWithMetadata: meta + rows verified, binds by name") {
    val p = tmp("jsoncolsmeta")
    ChTextFormats.writeJsonColumnsWithMetadata(df, p)
    assertSame(ChTextFormats.readJsonColumnsWithMetadata(spark, p, schema))
    val drifted = StructType(Seq(schema("id").copy(name = "nope"),
      schema("s"), schema("x"), schema("ts")))
    val err = intercept[Exception] {
      ChTextFormats.readJsonColumnsWithMetadata(spark, p, drifted).collect()
    }
    assert(err.getMessage != null)
  }

  test("JSONAsObject: one variant row per top-level object, typed paths") {
    import org.apache.spark.sql.functions.{col, expr}
    val p = tmp("jsonasobject")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p, "part-00000.json"),
      """{"k": 1, "s": "a{b}c"} {"k": 2, "s": "x\"y"}
        |{"k": 3, "s": null}""".stripMargin)
    val back = graft.sources.ChMiscFormats.readJsonAsObject(spark, p)
      .select(
        expr("variant_get(json, '$.k', 'bigint')").as("k"),
        expr("variant_get(json, '$.s', 'string')").as("s"))
      .collect().sortBy(_.getLong(0)).toSeq
    assert(back.map(_.getLong(0)) == Seq(1L, 2L, 3L))
    assert(back.map(r => Option(r.getString(1))) ==
      Seq(Some("a{b}c"), Some("x\"y"), None))
  }
}
