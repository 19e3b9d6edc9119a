object LshProf {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions._
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $tag ${(System.nanoTime()-t0)/1e9}%.1f s"); r
    }
    val sfd = "/root/testdata/sf0.1"
    val docs = graft.Tables.load(spark, sfd, "documents")
      .select(col("doc_id"), wordShingles(col("text"), 3).as("ws"))
    val sigs = docs.withColumn("sig", minhashSignature(col("ws"), 32))
    t("minhash")(sigs.select(avg(element_at(col("sig"), 1).cast("double"))).collect())
    val banded = sigs.select(col("doc_id"), explode(lshBandKeys(col("sig"), 8, 4)).as("bk"))
    t("banded")(banded.count())
    val cand = banded.select(col("doc_id").as("id_a"), col("bk"))
      .join(banded.select(col("doc_id").as("id_b"), col("bk")), Seq("bk"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct()
    t("candidates")(println("PROF n_cand=" + cand.count()))
    t("verify") {
      cand.join(docs.select(col("doc_id").as("id_a"), col("ws").as("wa")), Seq("id_a"))
        .join(docs.select(col("doc_id").as("id_b"), col("ws").as("wb")), Seq("id_b"))
        .withColumn("jac", jaccard(col("wa"), col("wb")))
        .filter(col("jac") >= 0.8).count()
    }
    spark.stop()
  }
}
