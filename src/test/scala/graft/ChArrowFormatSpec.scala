package graft

import java.nio.file.Files

import graft.sources.ChArrowFormat
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** ArrowStream IPC codec (ref ArrowBlockInput/OutputFormat.cpp): full-type
  * roundtrip incl. nulls, unicode, denormals, multi-batch streams, and the
  * embedded-schema verification. */
class ChArrowFormatSpec extends SparkFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("s", StringType, nullable = true),
    StructField("x", DoubleType, nullable = false),
    StructField("b", BooleanType, nullable = false),
    StructField("ts", TimestampType, nullable = false)))

  private val ts = java.sql.Timestamp.from(java.time.Instant.parse("2024-06-01T12:34:56.789012Z"))

  test("roundtrips all types, nulls, unicode, NaN across multiple batches") {
    val rows = (1 to 10000).map { i =>
      Row(i.toLong, if (i % 7 == 0) null else s"v$i 中文", if (i % 11 == 0) Double.NaN else i / 3.0,
        i % 2 == 0, ts)
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
    val p = Files.createTempDirectory("arrowrt").toString
    ChArrowFormat.writeArrowStream(df, p)
    val back = ChArrowFormat.readArrowStream(spark, p, schema)
    assert(back.rdd.getNumPartitions == 3)
    val a = back.collect().sortBy(_.getLong(0))
    assert(a.length == 10000)
    a.zip(rows).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      assert(x.getAs[String](1) == y.getAs[String](1))
      val dx = x.getDouble(2); val dy = y.getDouble(2)
      assert(java.lang.Double.doubleToLongBits(dx) == java.lang.Double.doubleToLongBits(dy))
      assert(x.getBoolean(3) == y.getBoolean(3))
      assert(x.getAs[java.sql.Timestamp](4) == y.getAs[java.sql.Timestamp](4))
    }
  }

  test("embedded schema is verified on read") {
    val df = spark.createDataFrame(spark.sparkContext.parallelize(
      Seq(Row(1L, "a", 1.0, true, ts)), 1), schema)
    val p = Files.createTempDirectory("arrowsv").toString
    ChArrowFormat.writeArrowStream(df, p)
    val wrong = StructType(schema.fields.map {
      case f if f.name == "x" => f.copy(name = "y")
      case f => f
    }.toSeq)
    val ex = intercept[Exception] {
      ChArrowFormat.readArrowStream(spark, p, wrong).collect()
    }
    assert(ex.getMessage != null)
  }
}
