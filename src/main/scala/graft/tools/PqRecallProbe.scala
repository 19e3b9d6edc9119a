package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Tables}
import graft.operators.{VectorIndex, VectorPQ}
import graft.functions.TextFunctions.dot

/** Diagnostic: measured IVF-PQ recall@10 vs exact, by (m, k, nProbe). */
object PqRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = Tables.load(spark, dir, "embeddings")
    val e = VectorIndex.prep(src).localCheckpoint()
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val pairs = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    val exact = pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select("qid", "vec_id").withColumnRenamed("vec_id", "nid").localCheckpoint()
    val total = exact.count()
    for (resid <- Seq(false, true);
         (m, k) <- Seq((8, 16), (8, 64), (16, 16), (16, 64));
         np <- Seq(4, 8)) {
      val idx = s"/tmp/pqprobe_${resid}_${m}_${k}"
      if (np == 4)
        VectorPQ.create(spark, src, idx, nCells = 16, m = m, k = k,
          residual = resid)
      val topk = VectorPQ.topK(spark, idx, q, k = 10, nProbe = np)
      val hits = topk.join(exact, Seq("qid", "nid")).count()
      val rr = VectorPQ.topKRerank(spark, idx, e, q, k = 10, nProbe = np,
        shortlist = 100)
      val rrHits = rr.join(exact, Seq("qid", "nid")).count()
      println(f"residual=$resid m=$m k=$k nProbe=$np recall@10 = ${hits.toDouble / total}%.3f rerank100 = ${rrHits.toDouble / total}%.3f")
    }
    spark.stop()
  }
}
