package graft

import graft.operators.{VectorIndex, VectorSQ}
import org.apache.spark.sql.functions._

/** SQ8 scalar-quantization contracts: measured recall vs exact cosine,
  * codec size, and range-edge behavior. */
class VectorSQSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._

  test("8-bit codes: d bytes per vector, constant dims quantize to 0") {
    val df = Seq((1L, Seq(0.0, 5.0, 7.0)), (2L, Seq(1.0, 5.0, -7.0)))
      .toDF("vec_id", "v")
    val r = VectorSQ.train(df, "v")
    // dim 1 is constant: span 0 -> scale 0, codes 0
    assert(r.scales(1) == 0.0)
    val enc = VectorSQ.encode(df, r, "vec_id", "v").collect()
    enc.foreach { row =>
      val codes = row.getAs[Array[Byte]]("codes")
      assert(codes.length == 3)
      assert(codes(1) == 0)
    }
    // norms are exact
    val n1 = enc.find(_.getLong(0) == 1L).get.getAs[Double]("norm")
    assert(math.abs(n1 - math.sqrt(0 + 25 + 49)) < 1e-12)
  }

  test("measured recall@10 vs exact cosine on the corpus (floor 0.9)") {
    val e = VectorIndex.prep(
      Tables.load(spark, sf, "embeddings"))
    val r = VectorSQ.train(e, "v")
    val enc = VectorSQ.encode(e, r, "vec_id", "v")
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("v")).collect().toSeq
      .map(row => (row.getLong(0), row.getSeq[Double](1).toArray))
    val approx = VectorSQ.topK(spark, enc, r, queries, 10,
        excludeSelf = true)
      .select(col("query_id").as("qid"), col("vec_id").as("nid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // exact reference
    import org.apache.spark.sql.expressions.Window
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val dot = expr("aggregate(zip_with(qv, v, (a, b) -> a * b), 0D, (s, x) -> s + x)")
    val exact = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos", dot / (col("qnrm") * col("nrm")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rn") <= 10)
      .select(col("qid"), col("vec_id").as("nid"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val recall = approx.intersect(exact).size.toDouble / exact.size
    info(f"SQ8 recall@10 = $recall%.3f (${approx.intersect(exact).size}/${exact.size})")
    assert(recall >= 0.9, f"recall $recall%.3f below the 0.9 floor")
  }
}
