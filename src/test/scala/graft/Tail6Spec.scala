package graft

import graft.sql.ClickHouseSql

/** Registry sweep #6 pins beyond the oracled battery (q_fn_tail6 /
  * q_agg_theta_algebra): theta set algebra in ESTIMATION mode, loud
  * finalizeAggregation on non-states, session introspection, and the
  * random-family contracts. */
class Tail6Spec extends SparkFunSuite {

  private def ch(sql: String) = ClickHouseSql.sql(spark, sql)

  test("theta set algebra estimates within RSE bounds above k") {
    // 60k distinct keys vs k=1024: union/intersect/not estimates must
    // land within ~5x the 3.1% RSE (loose bound, deterministic hashes)
    Tables.register(spark, sf)
    val r = ch("""
      SELECT
        finalizeAggregation(uniqThetaUnion(a.s, b.s)) AS u,
        finalizeAggregation(uniqThetaIntersect(a.s, b.s)) AS i
      FROM (SELECT uniqThetaState(l_orderkey * 10) AS s FROM lineitem) a
      CROSS JOIN (SELECT uniqThetaState(l_orderkey * 10 + 5) AS s
                  FROM lineitem) b""").collect().head
    val n = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey").distinct().count()
    val u = r.getLong(0)
    assert(math.abs(u - 2.0 * n) / (2.0 * n) < 0.16,
      s"union estimate $u for true ${2 * n}")
    // disjoint key sets: the intersection estimate must be near zero
    assert(r.getLong(1) < math.max(8L, (0.02 * n).toLong),
      s"intersect of disjoint sets estimated ${r.getLong(1)}")
  }

  test("finalizeAggregation rejects a non-theta binary loudly") {
    val e = intercept[Exception] {
      ch("SELECT finalizeAggregation(CAST('junk' AS BINARY)) AS x").collect()
    }
    assert(e.getMessage.contains("theta") ||
      Option(e.getCause).exists(_.getMessage.contains("theta")))
  }

  test("queryID reflects SET query_id; uptime/revision sane") {
    ch("SET query_id = 'tail6-spec-run'")
    val r = ch("""SELECT queryID() AS q, initialQueryID() AS iq,
      uptime() AS up, revision() AS rev, serverUUID() AS su""").collect().head
    assert(r.getString(0) == "tail6-spec-run" && r.getString(1) == "tail6-spec-run")
    assert(r.getLong(2) >= 0L)
    assert(r.getLong(3) >= 40000L) // numeric Spark version, 4.x.y
    assert(r.getString(4).matches("[0-9a-f-]{36}"))
    ch("SET query_id = ''")
  }

  test("random family: ranges, lengths, and fuzzBits flips within p bounds") {
    val r = ch("""SELECT rand64() AS r64, randConstant() AS rc,
      CAST(length(randomString(16)) AS BIGINT) AS rs,
      CAST(length(randomFixedString(8)) AS BIGINT) AS rf,
      CAST(length(fuzzBits('aaaaaaaaaa', 0.0)) AS BIGINT) AS fz0""")
      .collect().head
    assert(r.getLong(2) <= 16 && r.getLong(2) >= 1) // UTF8 length counts chars, random bytes may shrink
    assert(r.getLong(4) == 10) // p=0 flips nothing
    // randConstant is identical across rows of one query
    Tables.register(spark, sf)
    val rows = ch("SELECT randConstant() AS rc FROM nation").collect()
    assert(rows.map(_.getLong(0)).distinct.length == 1)
  }

  test("tuple tail: concat/negate/names") {
    val r = ch("""SELECT
      tupleConcat(struct(1, 'a'), struct(2.5)) AS tc,
      tupleNegate(struct(1, -2)) AS tn,
      arrayStringConcat(tupleNames(struct(1 AS x, 2 AS y)), ',') AS nm""")
      .collect().head
    val tc = r.getStruct(0)
    assert(tc.size == 3 && tc.getInt(0) == 1 && tc.getString(1) == "a")
    val tn = r.getStruct(1)
    assert(tn.getInt(0) == -1 && tn.getInt(1) == 2)
    assert(r.getString(2) == "x,y")
  }

  test("variantType/variantElement are the Dynamic twins") {
    val r = ch("""SELECT variantType(parse_json('7')) AS t,
      variantElement(parse_json('7'), 'Int64') AS v""").collect().head
    assert(r.getString(0) == "Int64" && r.getLong(1) == 7L)
  }
}
