package graft

import graft.functions.SeriesStl

/** STL decomposition contracts (Cleveland et al. 1990 procedure;
  * reference surface seriesDecomposeSTL.cpp). */
class SeriesStlSpec extends SparkFunSuite {

  test("additive identity holds exactly by construction") {
    val y = Array.tabulate(48)(i =>
      3.0 + 0.2 * i + 2.0 * math.sin(2 * math.Pi * i / 8))
    val (s, t, r) = SeriesStl.decompose(y, 8)
    (0 until 48).foreach { i =>
      assert(math.abs(y(i) - (s(i) + t(i) + r(i))) < 1e-9)
    }
  }

  test("pure seasonal series: seasonal lane carries the signal") {
    val y = Array.tabulate(60)(i => 4.0 * math.sin(2 * math.Pi * i / 12))
    val (s, _, r) = SeriesStl.decompose(y, 12)
    val seasonalEnergy = s.map(x => x * x).sum
    val residualEnergy = r.map(x => x * x).sum
    assert(seasonalEnergy > 10 * residualEnergy,
      s"seasonal $seasonalEnergy vs residual $residualEnergy")
  }

  test("pure linear series: trend tracks it, seasonal stays near zero") {
    val y = Array.tabulate(40)(i => 1.0 + 0.5 * i)
    val (s, t, _) = SeriesStl.decompose(y, 10)
    assert(s.map(math.abs).max < 0.3, s"seasonal max ${s.map(math.abs).max}")
    // trend approximates the line away from the edges
    (5 until 35).foreach { i =>
      assert(math.abs(t(i) - y(i)) < 0.5, s"trend at $i: ${t(i)} vs ${y(i)}")
    }
  }

  test("reference error contract: short series and oversized period reject") {
    intercept[IllegalArgumentException] {
      SeriesStl.decompose(Array(1.0, 2.0, 3.0), 1)
    }
    intercept[IllegalArgumentException] {
      SeriesStl.decompose(Array.tabulate(10)(_.toDouble), 6)
    }
  }
}
