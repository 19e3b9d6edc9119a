package graft

import graft.operators.{TextIndex, VectorIndex}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Persisted index structures: token inverted-index file pruning and the
  * on-disk IVF vector index. The pins here are the I/O claims the oracled
  * queries can't state: fewer files read, index-not-corpus scans,
  * partition-filter pruning. */
class IndexSpec extends SparkFunSuite {

  private val base = "/tmp/graft_indexspec"

  /** Leaf parquet scans of a plan (descending into AQE subtrees). */
  private def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(s.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => walk(r.child)
        case f: FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(walk)
      }
    walk(df.queryExecution.executedPlan)
  }

  test("text index prunes files and returns exactly the full-scan rows") {
    // plant one doc with a unique token so pruning is provable: its file
    // must be the ONLY one admitted for that token
    val docs = Tables.load(spark, sf, "documents")
      .unionByName(spark.sql(
        """SELECT 999999L AS doc_id, 'zzyzx_marker only here' AS text,
           'en' AS lang, 'spec' AS source, 22L AS n_chars"""))
    TextIndex.create(spark, docs, s"$base/data", s"$base/index", nFiles = 16)

    // unique token → exactly one admitted file out of 16
    val rare = TextIndex.matchingFiles(spark, s"$base/index", Seq("zzyzx_marker"))
    assert(rare.size == 1, s"expected 1 file for the planted token, got $rare")
    val hit = TextIndex.search(spark, s"$base/data", s"$base/index",
      Seq("zzyzx_marker")).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(hit == Seq(999999L))

    // conjunctive search == brute-force scan, rows identical
    val viaIndex = TextIndex.search(spark, s"$base/data", s"$base/index",
        Seq("dup", "vector"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val full = spark.read.parquet(s"$base/data")
      .filter(array_contains(TextIndex.tokensOf(col("text")), "dup") &&
        array_contains(TextIndex.tokensOf(col("text")), "vector"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(viaIndex == full && full.nonEmpty)

    // a token absent from the corpus prunes everything
    assert(TextIndex.matchingFiles(spark, s"$base/index", Seq("nosuchtok")).isEmpty)
    assert(TextIndex.search(spark, s"$base/data", s"$base/index",
      Seq("nosuchtok")).count() == 0)
  }

  test("phrase lane: adjacent-bigram pruning is tighter than AND-of-tokens") {
    // planted: one doc with the EXACT phrase, one decoy with all three
    // tokens present but never adjacent — token-AND admits both files,
    // the phrase lane admits only the true one
    val docs = Tables.load(spark, sf, "documents")
      .unionByName(spark.sql(
        """SELECT 777001L AS doc_id, 'zqxalpha zqxbeta zqxgamma here' AS text,
           'en' AS lang, 'spec' AS source, 30L AS n_chars"""))
      .unionByName(spark.sql(
        """SELECT 777002L AS doc_id,
           'zqxalpha pad zqxbeta pad zqxgamma' AS text,
           'en' AS lang, 'spec' AS source, 33L AS n_chars"""))
    TextIndex.create(spark, docs, s"$base/pdata", s"$base/pindex", nFiles = 16)
    val tokens = Seq("zqxalpha", "zqxbeta", "zqxgamma")
    val byTokens = TextIndex.matchingFiles(spark, s"$base/pindex", tokens)
    val byPhrase = TextIndex.matchingFilesPhrase(spark, s"$base/pindex", tokens)
    assert(byPhrase.size < byTokens.size,
      s"phrase should prune tighter: phrase=$byPhrase tokens=$byTokens")
    val hits = TextIndex.searchPhrase(spark, s"$base/pdata", s"$base/pindex",
      tokens).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(hits == Seq(777001L), s"got $hits")
    // full-scan equality on a corpus phrase
    val viaIndex = TextIndex.searchPhrase(spark, s"$base/pdata", s"$base/pindex",
        Seq("vector", "small"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val full = spark.read.parquet(s"$base/pdata")
      .filter(TextIndex.phraseMatch(col("text"), Seq("vector", "small")))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(viaIndex == full && full.nonEmpty)
    // an adjacent pair absent from the corpus prunes everything
    assert(TextIndex.searchPhrase(spark, s"$base/pdata", s"$base/pindex",
      Seq("zqxgamma", "zqxalpha")).count() == 0)
  }

  test("incremental append indexes only the new files; new docs searchable") {
    val docs = Tables.load(spark, sf, "documents")
    TextIndex.create(spark, docs, s"$base/adata", s"$base/aindex", nFiles = 8)
    val before = spark.read.parquet(s"$base/aindex").count()
    val beforeFiles = spark.read.parquet(s"$base/aindex")
      .select("file").distinct().count()
    val scanned = TextIndex.append(spark, spark.sql(
      """SELECT 888888L AS doc_id, 'qwggle_token fresh arrival' AS text,
         'en' AS lang, 'spec' AS source, 26L AS n_chars"""),
      s"$base/adata", s"$base/aindex")
    // SCALE PIN (round-7 weak item): the tokenize job's input is ONLY the
    // appended delta — one new file, not the 8-file corpus; append cost
    // is proportional to the appended data, never a corpus re-read
    assert(scanned.size == 1,
      s"append scanned ${scanned.size} files, expected the 1 new file: $scanned")
    // exactly the new file's postings were added — old files untouched
    val afterFiles = spark.read.parquet(s"$base/aindex")
      .select("file").distinct().count()
    assert(afterFiles == beforeFiles + 1)
    val added = spark.read.parquet(s"$base/aindex").count() - before
    assert(added > 0 && added <= 5, s"unexpected posting delta $added")
    // and the new doc is found through the index
    val hit = TextIndex.search(spark, s"$base/adata", s"$base/aindex",
      Seq("qwggle_token")).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(hit == Seq(888888L))
  }

  test("streaming ingest maintains the IVF index: new vectors are queryable") {
    import java.nio.file.Files
    val src = Tables.load(spark, sf, "embeddings")
    VectorIndex.create(spark, src, s"$base/vecs", nCells = 16)
    // stage a batch of planted exact twins (vec_id + 1e6 of the first 5)
    // as a file-stream backlog
    val stage = Files.createTempDirectory("graft_vec_stream").toString
    src.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 1000000L)
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val stream = spark.readStream
      .schema(spark.read.parquet(stage).schema)
      .parquet(stage)
    val q = VectorIndex.appendStream(spark, stream, s"$base/vecs",
      Files.createTempDirectory("graft_vec_ckpt").toString)
    q.awaitTermination(60000)
    // the ingested twins are now top-1 at cos 1.0 for their originals
    val queries = VectorIndex.prep(src).filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    val top1 = VectorIndex.topK(spark, s"$base/vecs", queries, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 5L).foreach { i =>
      assert(top1.get(i).contains(i + 1000000L),
        s"ingested twin of $i not found (got ${top1.get(i)})")
    }
  }

  test("IVF-PQ: map-side encode, bounded codes, rerank recovers exact top-1") {
    import graft.operators.VectorPQ
    val src = Tables.load(spark, sf, "embeddings")
    val idx = s"$base/pqidx"
    VectorPQ.create(spark, src, idx, nCells = 16, m = 16, k = 16)
    // code table shape: m codes per row, every code in [0, k)
    val codeStats = spark.read.parquet(s"$idx/pq")
      .select(size(col("codes")).as("m"),
        array_max(col("codes")).as("mx"), array_min(col("codes")).as("mn"))
      .agg(min("m"), max("m"), max("mx"), min("mn")).head()
    assert(codeStats.getInt(0) == 16 && codeStats.getInt(1) == 16,
      s"codes not length-16: $codeStats")
    assert(codeStats.getInt(2) < 16 && codeStats.getInt(3) >= 0,
      s"codes out of [0,16): $codeStats")
    // SCALE PIN: encode + assignment are one map-side projection — no
    // Exchange, no join between the embeddings scan and the codes
    val e = VectorIndex.prep(src)
    val cb = VectorPQ.readCodebooks(spark, idx)
    val cents = VectorIndex.seedCents(e, 16)
    val plan = VectorPQ.withCodes(VectorIndex.withCell(e, cents), cb)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"PQ encode is not map-side:\n$plan")
    // deterministic training: same inputs → identical codebooks
    val cb2 = VectorPQ.train(e, m = 16, k = 16)
    assert(cb.cents.flatten.flatten.toSeq == cb2.cents.flatten.flatten.toSeq,
      "PQ training is not deterministic")
    // exact re-rank of the ADC shortlist recovers the true top-1 for
    // most queries (ADC alone cannot promise this at 8-byte codes)
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    import graft.functions.TextFunctions.dot
    val wx = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    val exact1 = e.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
      .withColumn("rn", row_number().over(wx)).filter(col("rn") === 1)
      .select("qid", "vec_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = VectorPQ.topKRerank(spark, idx, e, queries, k = 1,
      nProbe = 8, shortlist = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = exact1.count { case (q, n) => got.get(q).contains(n) }
    assert(agree >= 14, s"rerank top-1 agreement $agree/20 below floor")
  }

  test("IVF-PQ residual lane (IVFADC §IV.A): flagged codebooks, map-side " +
      "encode, rerank recovers exact top-1") {
    import graft.operators.VectorPQ
    val src = Tables.load(spark, sf, "embeddings")
    val idx = s"$base/pqresid"
    VectorPQ.create(spark, src, idx, nCells = 16, m = 16, k = 16,
      residual = true)
    val cb = VectorPQ.readCodebooks(spark, idx)
    assert(cb.residual, "codebooks must carry the residual flag")
    // the residual + encode path is still ONE map-side projection — no
    // Exchange, no join (zip_with against a centroid array literal)
    val e = VectorIndex.prep(src)
    val cents = VectorIndex.seedCents(e, 16)
    val plan = VectorPQ.withCodes(
        VectorPQ.withResidual(VectorIndex.withCell(e, cents), cents),
        cb, "rv")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"residual PQ encode is not map-side:\n$plan")
    // ADC scoring carries the per-(query, cell) centroid term; the
    // reranked lane must recover the exact top-1 like the raw lane
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    import graft.functions.TextFunctions.dot
    val wx = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    val exact1 = e.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
      .withColumn("rn", row_number().over(wx)).filter(col("rn") === 1)
      .select("qid", "vec_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = VectorPQ.topKRerank(spark, idx, e, queries, k = 1,
      nProbe = 8, shortlist = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = exact1.count { case (q, n) => got.get(q).contains(n) }
    assert(agree >= 14, s"residual rerank top-1 agreement $agree/20 below floor")
  }

  test("q_ann_ivfpq metrics (k=64 grid point, recall floors) hold at sf0.001") {
    val rows = SparkEntry.queries("q_ann_ivfpq")(spark, sf).collect()
    assert(rows.length == 8 && rows.forall(_.getBoolean(1)),
      s"ivfpq metrics: ${rows.mkString(", ")}")
  }

  test("streaming ingest maintains the PQ code table: twins found via rerank") {
    import java.nio.file.Files
    import graft.operators.VectorPQ
    val src = Tables.load(spark, sf, "embeddings")
    val idx = s"$base/pqstream"
    VectorPQ.create(spark, src, idx, nCells = 16, m = 16, k = 16)
    val stage = Files.createTempDirectory("graft_pq_stream").toString
    src.filter(col("vec_id") < 5)
      .withColumn("vec_id", col("vec_id") + 2000000L)
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val stream = spark.readStream
      .schema(spark.read.parquet(stage).schema).parquet(stage)
    val q = VectorPQ.appendStream(spark, stream, idx,
      Files.createTempDirectory("graft_pq_ckpt").toString)
    q.awaitTermination(60000)
    // a twin has IDENTICAL codes and nrm → its rerank cosine is 1.0 and
    // it wins top-1 for its original
    val e = VectorIndex.prep(src.unionByName(
      src.filter(col("vec_id") < 5)
        .withColumn("vec_id", col("vec_id") + 2000000L)))
    val queries = VectorIndex.prep(src).filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    val top1 = VectorPQ.topKRerank(spark, idx, e, queries, k = 1,
      nProbe = 8, shortlist = 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 5L).foreach { i =>
      assert(top1.get(i).contains(i + 2000000L),
        s"ingested PQ twin of $i not found (got ${top1.get(i)})")
    }
  }

  test("IVF build: centroid assignment is map-side — no Exchange, no window") {
    // the round-6 scale-killer: broadcast-crossJoin + row_number expanded
    // the corpus nCells× and shuffled the expansion. The argmax form must
    // plan as scan → project → (sort for the partitioned write), with no
    // Exchange between the embeddings scan and the write.
    val e = VectorIndex.prep(Tables.load(spark, sf, "embeddings"))
    val cents = VectorIndex.seedCents(e, 16)
    val assigned = VectorIndex.withCell(e, cents)
      .select("vec_id", "v", "nrm", "cell")
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"centroid assignment plan contains a shuffle:\n$plan")
    assert(!plan.contains("Window"),
      s"centroid assignment plan contains a window:\n$plan")
    // and it agrees with the reference arithmetic: argmax over explicit
    // per-centroid cosines, ties to the lowest cid
    val row = assigned.filter(col("vec_id") === 7L).collect().head
    val v = row.getSeq[Double](1).toArray
    val nrm = row.getDouble(2)
    val want = cents.map { c =>
      val d = v.zip(c.cv).foldLeft(0.0)((a, p) => a + p._1 * p._2)
      (d / (nrm * c.cnrm), c.cid)
    }.maxBy { case (s, cid) => (s, -cid) }._2
    assert(row.getAs[Long]("cell") == want)
  }

  test("k-means cells: deterministic, balanced, exact twins co-assigned") {
    val src = Tables.load(spark, sf, "embeddings")
    val e = VectorIndex.prep(src)
    val n = src.count()
    val k = VectorIndex.nCellsFor(n)
    assert(k >= 16 && k <= 4096)
    val c1 = VectorIndex.kmeansCents(e, 64, iters = 3)
    val c2 = VectorIndex.kmeansCents(e, 64, iters = 3)
    // deterministic across runs (hash-ordered seeds + fixed iterations)
    assert(c1.map(_.cid) == c2.map(_.cid))
    assert(c1.zip(c2).forall { case (a, b) => a.cv.sameElements(b.cv) })
    // cell-size distribution: the SemDeDup per-cell self-join stays
    // bounded iff no cell dwarfs the mean
    val sizes = VectorIndex.withCell(e, c1)
      .groupBy("cell").count().collect().map(_.getLong(1))
    val mean = sizes.sum.toDouble / 64 // all k cells, incl. empties
    assert(sizes.max <= math.max(16.0, 12.0 * mean),
      s"max cell ${sizes.max} vs mean $mean — skewed clustering")
    // exact twins land in the same cell regardless of centroid quality
    val twins = VectorIndex.withCell(
      e.filter(col("vec_id") < 8)
        .withColumn("vec_id", col("vec_id") + 1000000L), c1)
    val orig = VectorIndex.withCell(e.filter(col("vec_id") < 8), c1)
    val got = twins.select(col("vec_id") - 1000000L, col("cell")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    orig.select("vec_id", "cell").collect().foreach { r =>
      assert(got(r.getLong(0)) == r.getLong(1), s"twin of ${r.getLong(0)} split")
    }
  }

  test("persisted IVF: queries read the index partitions, not the corpus") {
    val src = Tables.load(spark, sf, "embeddings")
    VectorIndex.create(spark, src, s"$base/vec", nCells = 16)
    val queries = VectorIndex.prep(src).filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    // "second query": the index already exists; topK must plan entirely
    // over it
    val top = VectorIndex.topK(spark, s"$base/vec", queries, k = 3)
    val got = top.collect()
    assert(got.nonEmpty && got.length <= 5 * 3)

    val paths = scans(top).flatMap(_.relation.location.rootPaths.map(_.toString))
    assert(paths.nonEmpty && paths.forall(_.contains("/graft_indexspec/vec")),
      s"expected all scans over the index, got: $paths")
    assert(!paths.exists(_.contains("testdata")),
      "topK scanned the original corpus")

    // cell pruning reaches the scan as PartitionFilters over `cell`
    val assignScan = scans(top).find(_.relation.location.rootPaths
      .exists(_.toString.contains("assignments")))
    assert(assignScan.isDefined, "no scan over the assignments layout")
    assert(assignScan.get.partitionFilters.nonEmpty,
      s"no partition filters on the assignments scan:\n${assignScan.get}")

    // results match the same probe computed from the corpus directly
    // (identical arithmetic, different storage): spot-check top-1 ids
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    val top1 = top.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("qid", "nid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top1.size == 5)
  }
}
