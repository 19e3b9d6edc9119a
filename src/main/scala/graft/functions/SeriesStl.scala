package graft.functions

/** STL — Seasonal-Trend decomposition based on Loess — implemented from
  * the published procedure (Cleveland, Cleveland, McRae & Terpenning,
  * "STL: A Seasonal-Trend Decomposition Procedure Based on Loess",
  * Journal of Official Statistics 6(1), 1990). Reference carrier:
  * src/Functions/seriesDecomposeSTL.cpp (wraps stl-cpp; numeric output
  * differs in smoothing-parameter details, the decomposition contract —
  * y = seasonal + trend + residual, seasonal carries the period-p
  * component — is the same and is what the oracle pins).
  *
  * Parameters follow the paper's defaults: n_i = 2 inner iterations,
  * no robustness iterations, loess degree 1, seasonal window n_s = 7,
  * low-pass window n_l = next odd ≥ p, trend window n_t = next odd ≥
  * 1.5·p / (1 − 1.5/n_s). */
object SeriesStl {

  private def nextOdd(x: Double): Int = {
    val c = math.ceil(x).toInt
    if (c % 2 == 1) c else c + 1
  }

  /** Degree-1 loess at integer design points 0..n-1, evaluated at `at`
    * (which may lie one step outside for subseries extension): tricube
    * weights over the q nearest design points. */
  private def loessAt(ys: Array[Double], q: Int, at: Double): Double = {
    val n = ys.length
    if (n == 1) return ys(0)
    val qq = math.min(math.max(q, 2), n)
    // q nearest integer points to `at`
    val left0 = math.round(at).toInt - (qq - 1) / 2
    val left = math.max(0, math.min(left0, n - qq))
    val maxD = math.max(math.abs(at - left), math.abs(at - (left + qq - 1)))
      .max(1e-9)
    var sw = 0.0; var swx = 0.0; var swy = 0.0; var swxy = 0.0; var swxx = 0.0
    var j = left
    while (j < left + qq) {
      val u = math.abs(j - at) / maxD
      val w = if (u >= 1.0) 0.0 else { val t = 1.0 - u * u * u; t * t * t }
      sw += w; swx += w * j; swy += w * ys(j)
      swxy += w * j * ys(j); swxx += w * j.toDouble * j
      j += 1
    }
    val denom = sw * swxx - swx * swx
    if (math.abs(denom) < 1e-12) swy / sw
    else {
      val b = (sw * swxy - swx * swy) / denom
      val a = (swy - b * swx) / sw
      a + b * at
    }
  }

  private def loessSeries(ys: Array[Double], q: Int): Array[Double] =
    Array.tabulate(ys.length)(i => loessAt(ys, q, i.toDouble))

  private def movingAvg(ys: Array[Double], m: Int): Array[Double] = {
    val out = new Array[Double](ys.length - m + 1)
    var s = 0.0
    var i = 0
    while (i < m) { s += ys(i); i += 1 }
    out(0) = s / m
    while (i < ys.length) {
      s += ys(i) - ys(i - m)
      out(i - m + 1) = s / m
      i += 1
    }
    out
  }

  /** Decompose `y` with seasonality `period`; returns (seasonal, trend,
    * residual). Contract mirrors the reference: at least 4 points and
    * at least two full periods. */
  def decompose(y: Array[Double], period: Int)
      : (Array[Double], Array[Double], Array[Double]) = {
    val n = y.length
    require(n >= 4, "At least four data points are needed for " +
      "seriesDecomposeSTL")
    require(period >= 1 && period <= n / 2,
      "The series should have data of at least two period lengths for " +
        "seriesDecomposeSTL")
    val p = period
    val ns = 7
    val nl = nextOdd(p.toDouble)
    val nt = nextOdd(1.5 * p / (1.0 - 1.5 / ns))

    var trend = new Array[Double](n) // zeros
    var seasonal = new Array[Double](n)
    var iter = 0
    while (iter < 2) { // n_i = 2 inner iterations (paper default)
      // step 1: detrend
      val d = Array.tabulate(n)(i => y(i) - trend(i))
      // step 2: cycle-subseries loess, extended one period each side
      val c = new Array[Double](n + 2 * p) // positions -p .. n+p-1
      var k = 0
      while (k < p) {
        val idx = k.until(n, p).toArray
        val sub = idx.map(d)
        val m = sub.length
        // smoothed subseries evaluated at -1, 0..m-1, m
        var pos = -1
        while (pos <= m) {
          val v = loessAt(sub, ns, pos.toDouble)
          val at = (pos + 1) * p + k // shift by one period for the pad
          if (at < c.length) c(at) = v
          pos += 1
        }
        k += 1
      }
      // step 3: low-pass — MA(p), MA(p), MA(3), then loess(nl)
      val l0 = movingAvg(movingAvg(movingAvg(c, p), p), 3) // length n
      val l = loessSeries(l0, nl)
      // step 4: seasonal = smoothed subseries minus low-pass
      var i = 0
      while (i < n) { seasonal(i) = c(i + p) - l(i); i += 1 }
      // step 5/6: deseasonalize + trend loess
      val ds = Array.tabulate(n)(i => y(i) - seasonal(i))
      trend = loessSeries(ds, nt)
      iter += 1
    }
    val residual = Array.tabulate(n)(i => y(i) - seasonal(i) - trend(i))
    (seasonal, trend, residual)
  }

  /** seriesDecomposeSTL kernel: Array(Float) rows of
    * [seasonal, trend, residue, baseline] (the reference's 4-array
    * output shape — baseline = seasonal + trend). */
  def stl(values: org.apache.spark.sql.catalyst.util.ArrayData,
      period: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val y = values.toDoubleArray()
    val (s, t, r) = decompose(y, period)
    val base = Array.tabulate(y.length)(i => s(i) + t(i))
    val rows: Array[AnyRef] = Array(s, t, r, base).map { a =>
      org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(a.map(_.toFloat)): AnyRef
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(rows)
  }
}
