package graft

import graft.operators.ExecutableUdf
import org.apache.spark.sql.types._

/** TSV field-position stability through the subprocess boundary — a NULL
  * column must come out as an empty field, never shift its neighbours
  * (the advice-round concat_ws bug). */
class ExecutableUdfSpec extends SparkFunSuite {

  test("NULL columns hold their TSV field position through the pipe") {
    val s = spark
    import s.implicits._
    val in = Seq(
      (1L, Option("a"), Option(10L)),
      (2L, None: Option[String], Option(20L)),
      (3L, Option("c"), None: Option[Long])
    ).toDF("id", "tag", "v")
    // identity pipe: what comes back is exactly what field positions went out
    val out = ExecutableUdf.pipe(in, "cat",
      StructType(Seq(StructField("id", LongType), StructField("tag", StringType),
        StructField("v", LongType))))
      .orderBy("id").collect()
    assert(out(1).getString(1) == "" && out(1).getLong(2) == 20L,
      s"NULL tag shifted later fields: ${out(1)}")
    assert(out(2).getString(1) == "c" && out(2).isNullAt(2))
  }
}
