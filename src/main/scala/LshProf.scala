/** Stage-by-stage profiler for the SHIPPED q_dedup_minhash_lsh plan
  * (explode+groupBy `minhashTable` signatures, cached shingle table,
  * capped band buckets). Round-2 verdict: the previous version timed the
  * superseded interpreted-HOF `minhashSignature` path — keep this in sync
  * with graft.queries.LlmPipeline. */
object LshProf {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
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
    val sfd = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.Tables.load(spark, sfd, "documents")
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), wordShingles(col("text"), 3).as("ws"))
      .cache()
    t("shingle+cache")(docs.count())
    val sigs = minhashTable(docs, "doc_id", col("ws"), 32)
    t("minhashTable")(sigs.select(avg(element_at(col("sig"), 1).cast("double"))).collect())
    val bandedRaw = sigs.select(col("doc_id"), explode(lshBandKeys(col("sig"), 8, 4)).as("bk"))
    val w = Window.partitionBy(col("bk")).orderBy(col("doc_id"))
    val banded = bandedRaw.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 128).drop("__rn")
    t("banded+cap")(banded.count())
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
