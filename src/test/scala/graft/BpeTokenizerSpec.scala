package graft

import graft.operators.BpeTokenizer
import org.apache.spark.sql.functions._

/** BPE trainer/encoder contracts (Sennrich et al. 2016): merges learned
  * from weighted word counts match the hand-computed sequence on the
  * paper-style corpus, encode respects merge ranks, decode is the exact
  * inverse over the pretoken stream, and the whole loop is
  * deterministic. */
class BpeTokenizerSpec extends SparkFunSuite {

  private def df(rows: Seq[String]) = {
    val s = spark
    import s.implicits._
    rows.toDF("text")
  }

  test("merges match the hand-computed sequence on a weighted corpus") {
    // corpus: "hug " x4, "pug " x1, "hugs " x2  (word freq via repetition)
    val corpus = df(Seq.fill(4)("hug") ++ Seq("pug") ++ Seq.fill(2)("hugs"))
    val merges = BpeTokenizer.train(corpus, "text", 3)
    // pair counts round 1: (h,u)=6, (u,g</w>)=5, (u,g)=2, (g,s</w>)=2,
    // (p,u)=1 → merge 'h u' (6). round 2: (hu,g</w>)=4, (hu,g)=2,
    // (u,g</w>)=1, (g,s</w>)=2, (p,u)=1 → 'hu g</w>' (4). round 3:
    // (hu,g)=2 ties (g,s</w>)=2 → deterministic break picks the
    // lexicographically larger pair: 'hu g'
    assert(merges == Seq("h u", "hu g</w>", "hu g"))
  }

  test("encode applies ranks greedily; decode inverts exactly") {
    val corpus = df(Seq.fill(4)("hug") ++ Seq("pug") ++ Seq.fill(2)("hugs"))
    val merges = BpeTokenizer.train(corpus, "text", 3)
    val out = df(Seq("hug pugs hug"))
      .select(BpeTokenizer.encode(col("text"), merges).as("toks"))
      .collect().head.getSeq[String](0)
    // hug → 'h u' then 'hu g</w>' → [hug</w>]; pugs → p u g s</w>
    // (no learned merge applies: 'hu g' needs the merged hu symbol)
    assert(out == Seq("hug</w>", "p", "u", "g", "s</w>", "hug</w>"))
    val round = df(Seq("hug pugs hug", "totally unseen words!"))
      .select(col("text"),
        BpeTokenizer.decode(
          BpeTokenizer.encode(col("text"), merges)).as("back"))
      .collect()
    round.foreach { r =>
      // decode restores the PRETOKEN stream (whitespace canonicalized
      // to single spaces; punctuation split off as its own word)
      val want = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]".r
        .findAllIn(r.getString(0)).mkString(" ")
      assert(r.getString(1) == want)
    }
  }

  test("tokenCount equals encode length; training is deterministic") {
    val docs = Tables.load(spark, sf, "documents").limit(50)
    val m1 = BpeTokenizer.train(docs, "text", 40)
    val m2 = BpeTokenizer.train(docs, "text", 40)
    assert(m1 == m2 && m1.size == 40)
    val r = docs.select(
      size(BpeTokenizer.encode(col("text"), m1)).as("n1"),
      BpeTokenizer.tokenCount(col("text"), m1).as("n2"))
      .filter(col("n1") =!= col("n2")).count()
    assert(r == 0L)
    // merges compress: BPE token count strictly below character count
    val c = docs.select(
      sum(BpeTokenizer.tokenCount(col("text"), m1)).as("toks"),
      sum(length(col("text"))).as("chars")).collect().head
    assert(c.getLong(0) < c.getLong(1))
  }

  test("rank cache is content-keyed: different merge tables of the same " +
      "shape never share ranks (r11 32-bit-key collision nit)") {
    // same length, different content — with the old one-Int rolling key
    // a collision would silently encode list 2 with list 1's ranks; the
    // content key makes cross-contamination structurally impossible
    val m1 = Seq("h u", "hu g</w>")
    val m2 = Seq("p u", "pu g</w>")
    val d = df(Seq("hug pug"))
    val o1 = d.select(BpeTokenizer.encode(col("text"), m1).as("t"))
      .collect().head.getSeq[String](0)
    val o2 = d.select(BpeTokenizer.encode(col("text"), m2).as("t"))
      .collect().head.getSeq[String](0)
    assert(o1 == Seq("hug</w>", "p", "u", "g</w>"), s"m1 ranks: $o1")
    assert(o2 == Seq("h", "u", "g</w>", "pug</w>"), s"m2 ranks: $o2")
  }
}
