package graft

import graft.operators.Components
import org.apache.spark.sql.functions._
import scala.util.Random

/** Large-star/small-star contraction (Kiveris et al., SoCC 2014) vs the
  * min-label propagation baseline: identical labels on random graphs, and
  * logarithmic round behavior on the long-chain shape where label
  * propagation needs a round per hop. */
class ComponentsStarSpec extends SparkFunSuite {

  private val ss = SparkTestBase.spark
  import ss.implicits._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star contraction matches min-label propagation on seeded random graphs") {
    val rng = new Random(42)
    for (trial <- 1 to 3) {
      val n = 200
      val edges = Seq.fill(150)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val df = edges.toDF("src", "dst")
      val base = labelsOf(Components.connectedComponents(df, maxRounds = 50))
      val star = labelsOf(Components.connectedComponentsStar(df))
      assert(star == base, s"trial $trial")
    }
  }

  test("long chain: star contraction converges where label propagation is O(n)") {
    // 300-node path — min-label needs ~300 rounds; star needs O(log²).
    val edges = (0L until 299L).map(i => (i, i + 1)).toDF("src", "dst")
    val star = labelsOf(Components.connectedComponentsStar(edges, maxRounds = 25))
    assert(star.size == 300)
    assert(star.values.forall(_ == 0L))
    // the propagation baseline genuinely cannot do this in few rounds
    intercept[IllegalStateException] {
      Components.connectedComponents(edges, maxRounds = 5)
    }
  }

  test("hub graph (giant star) and multiple components") {
    val hub = (1L to 500L).map(i => (0L, i))
    val other = Seq((1000L, 1001L), (1001L, 1002L))
    val df = (hub ++ other).toDF("src", "dst")
    val star = labelsOf(Components.connectedComponentsStar(df))
    assert((0L to 500L).forall(star(_) == 0L))
    assert((1000L to 1002L).forall(star(_) == 1000L))
  }

  test("two-node and empty edge sets") {
    val two = labelsOf(Components.connectedComponentsStar(Seq((7L, 3L)).toDF("src", "dst")))
    assert(two == Map(7L -> 3L, 3L -> 3L))
    val empty = Components.connectedComponentsStar(
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(empty.count() == 0)
  }

  test("self-loops and duplicate edges are absorbed") {
    val df = Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)).toDF("src", "dst")
    val star = labelsOf(Components.connectedComponentsStar(df))
    assert(star == Map(1L -> 1L, 2L -> 1L))
  }
}
