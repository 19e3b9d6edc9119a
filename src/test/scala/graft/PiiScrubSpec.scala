package graft

import graft.operators.PiiScrub
import org.apache.spark.sql.functions._

class PiiScrubSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._

  private def one(text: String) = Seq(text).toDF("t")

  test("scrub replaces every class with its typed token") {
    val out = one("mail a.b@ex.org card 4111 1111 1111 1111 ssn 123-45-6789 " +
        "tel (415) 555-0142 ip 192.168.1.7 end")
      .select(PiiScrub.scrub(col("t"))).as[String].collect().head
    assert(out == "mail <EMAIL> card <CARD> ssn <SSN> tel <PHONE> ip <IP> end")
  }

  test("ordered chain prevents double counting across digit-run classes") {
    // the card shape would also contain phone-like 3-4 digit runs; the
    // total counts each span once because classes count on the
    // progressively scrubbed text
    val df = one("4111 1111 1111 1111 and 123-45-6789")
    val total = df.select(PiiScrub.totalCount(col("t"))).as[Long].collect().head
    assert(total == 2L, s"one card + one ssn, got $total")
  }

  test("counts are per-class taggers; clean text counts zero") {
    val r = one("no personal data here, just 42 and 3.14")
      .select(PiiScrub.counts(col("t")): _*).collect().head
    assert(r.toSeq.forall(_ == 0))
    val r2 = one("x@y.io and 10.0.0.1")
      .select(PiiScrub.counts(col("t")): _*).collect().head
    assert(r2.getAs[Int]("pii_email") == 1 && r2.getAs[Int]("pii_ip") == 1)
  }

  test("conservative bounds: out-of-range IPs and loose digit runs do not match") {
    val r = one("v 999.999.999.999 n 12345678901234567890")
      .select(PiiScrub.counts(col("t")): _*).collect().head
    assert(r.toSeq.forall(_ == 0))
  }
}
