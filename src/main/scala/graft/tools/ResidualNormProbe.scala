package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{VectorIndex, VectorPQ}
import graft.functions.TextFunctions.l2norm

/** Diagnostic: mean ‖x − centroid(cell)‖ / ‖x‖ — whether the corpus has
  * the cluster structure IVFADC's residual encoding exploits (Jégou
  * §IV.A assumes residual energy ≪ raw energy; isotropic corpora have
  * ratio ≈ 1 and residual codes buy nothing). */
object ResidualNormProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = VectorIndex.prep(Tables.load(spark, dir, "embeddings"))
    for (nCells <- Seq(16, 64)) {
      val cents = VectorIndex.seedCents(e, nCells)
      val r = VectorPQ.withResidual(VectorIndex.withCell(e, cents), cents)
        .withColumn("ratio", l2norm(col("rv")) / col("nrm"))
        .agg(avg("ratio"), min("ratio"), max("ratio")).collect().head
      println(f"nCells=$nCells mean ratio=${r.getDouble(0)}%.3f " +
        f"min=${r.getDouble(1)}%.3f max=${r.getDouble(2)}%.3f")
    }
    spark.stop()
  }
}
