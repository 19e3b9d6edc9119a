package graft.queries

import graft.{Q, QueryPack}

/** ML aggregate analog (SURVEY "stochastic regression" row — the last
  * out-of-scope'd aggregate family): the reference's
  * stochasticLinearRegression (src/AggregateFunctions/
  * AggregateFunctionMLMethod.h) fits weights by SGD and evalMLMethod
  * applies them. SGD is execution-order dependent (not reproducible across
  * engines), so this engine's documented spec is the CLOSED-FORM least
  * squares fit — same model family, deterministic, oracle-able: normal
  * equations solved by Cramer's rule over EXACT integer moment sums, then
  * evalMLMethod = the fitted linear predictor, scored by RMSE.
  */
object MlQueries extends QueryPack {

  // det of [[a,b,c],[d,e,f],[g,h,i]]
  private def det3(a: String, b: String, c: String,
      d: String, e: String, f: String,
      g: String, h: String, i: String): String =
    s"($a*($e*$i - $f*$h) - $b*($d*$i - $f*$g) + $c*($d*$h - $e*$g))"

  override def queries: Seq[Q] = Seq(

    // The reference's FUNCTION-NAME surface (round 8):
    // stochasticLinearRegression(params)(y, x1, x2) through the dialect
    // — parametric call form, trailing hyperparameters accepted and
    // ignored by the closed form — and evalMLMethod applying the state.
    // Exact-linear synthetic target ⇒ the fit recovers the generating
    // coefficients exactly, which the oracle states literally.
    graft.Q("q_ml_stochastic_linreg", (s, dir) => {
      graft.Tables.register(s, dir)
      graft.sql.ClickHouseSql.sql(s, """
        SELECT
          ROUND(arrayElement(w, 1), 4) AS w1,
          ROUND(arrayElement(w, 2), 4) AS w2,
          ROUND(arrayElement(w, 3), 4) AS bias,
          ROUND(evalMLMethod(w, 10, 2), 4) AS pred
        FROM (SELECT stochasticLinearRegression(0.1, 0.0, 5, 'SGD')(
                2 * n_nationkey - 3 * n_regionkey + 5,
                n_nationkey, n_regionkey) AS w
              FROM nation)""")
    }, Some("""
      SELECT 2.0 AS w1, -3.0 AS w2, 5.0 AS bias, 19.0 AS pred""")),

    // Fit price_cents ~ w0 + w1*quantity + w2*discount_pct on lineitem and
    // evaluate in-sample RMSE. Every moment is an exact DECIMAL sum; the
    // Cramer solve and RMSE are identical double expressions both engines.
    Q.shared("q_ml_linreg_eval", s"""
      WITH t AS (SELECT
          CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y,
          CAST(l_quantity AS BIGINT) AS x1,
          CAST(ROUND(l_discount * 100) AS BIGINT) AS x2
        FROM lineitem),
      m AS (SELECT
          CAST(COUNT(*) AS DOUBLE) AS n,
          CAST(SUM(x1) AS DOUBLE) AS sx1,
          CAST(SUM(x2) AS DOUBLE) AS sx2,
          CAST(SUM(CAST(x1 AS DECIMAL(18,0)) * CAST(x1 AS DECIMAL(18,0))) AS DOUBLE) AS s11,
          CAST(SUM(CAST(x1 AS DECIMAL(18,0)) * CAST(x2 AS DECIMAL(18,0))) AS DOUBLE) AS s12,
          CAST(SUM(CAST(x2 AS DECIMAL(18,0)) * CAST(x2 AS DECIMAL(18,0))) AS DOUBLE) AS s22,
          CAST(SUM(y) AS DOUBLE) AS sy,
          CAST(SUM(CAST(x1 AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0))) AS DOUBLE) AS s1y,
          CAST(SUM(CAST(x2 AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,0))) AS DOUBLE) AS s2y
        FROM t),
      w AS (SELECT
          ${det3("sy", "sx1", "sx2", "s1y", "s11", "s12", "s2y", "s12", "s22")}
            / ${det3("n", "sx1", "sx2", "sx1", "s11", "s12", "sx2", "s12", "s22")} AS w0,
          ${det3("n", "sy", "sx2", "sx1", "s1y", "s12", "sx2", "s2y", "s22")}
            / ${det3("n", "sx1", "sx2", "sx1", "s11", "s12", "sx2", "s12", "s22")} AS w1,
          ${det3("n", "sx1", "sy", "sx1", "s11", "s1y", "sx2", "s12", "s2y")}
            / ${det3("n", "sx1", "sx2", "sx1", "s11", "s12", "sx2", "s12", "s22")} AS w2
        FROM m),
      e AS (SELECT
          SUM(CAST(ROUND(
            (CAST(y AS DOUBLE) - (w.w0 + w.w1 * CAST(x1 AS DOUBLE) + w.w2 * CAST(x2 AS DOUBLE)))
            * (CAST(y AS DOUBLE) - (w.w0 + w.w1 * CAST(x1 AS DOUBLE) + w.w2 * CAST(x2 AS DOUBLE)))
            / 1000000.0) AS BIGINT)) AS sse_m6,
          COUNT(*) AS n_rows
        FROM t CROSS JOIN w)
      SELECT
        ROUND(w.w0 / 100.0, 4) AS w0_dollars,
        ROUND(w.w1 / 100.0, 4) AS w1_dollars_per_qty,
        ROUND(w.w2 / 100.0, 4) AS w2_dollars_per_pct,
        ROUND(SQRT(CAST(e.sse_m6 AS DOUBLE) * 1000000.0 / CAST(e.n_rows AS DOUBLE)) / 100.0, 2)
          AS rmse_dollars,
        CAST(e.n_rows AS BIGINT) AS n_rows
      FROM w CROSS JOIN e""")
  )
}
