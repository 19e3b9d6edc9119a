package graft

/** KQL dialect front-end (round-13; reference src/Parsers/Kusto/ —
  * ParserKQLQuery operator surface + ParserKQLOperators string-operator
  * catalog + the KQL_ReleaseNote.md alias/indexing rules), activated
  * exactly like the reference: `SET dialect = 'kusto'`. */
class KqlSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._

  private def ch(s: String) = graft.sql.ClickHouseSql.sql(spark, s)

  private def inKusto[T](body: => T): T = {
    ch("SET dialect = 'kusto'")
    try body
    finally ch("SET dialect = 'clickhouse'")
  }

  private def mk(): Unit =
    Seq((1L, "Alice Kim", 28L, "Engineer", "md"),
        (2L, "bob tran", 38L, "Teacher", "phd"),
        (3L, "Cara Wu", 28L, "Engineer", "bs"),
        (4L, "dan ito", 45L, "Manager", "md"),
        (5L, "Eve Ray", 33L, "Teacher", "ms"))
      .toDF("Id", "Name", "Age", "Occupation", "Education")
      .createOrReplaceTempView("Customers")

  test("pipeline core: where / project / sort (DESC default) / take") {
    mk()
    inKusto {
      val r = ch("Customers | where Age < 40 | project Name, Age " +
        "| sort by Age | take 3").collect()
      // KQL sort defaults to DESCENDING (ParserKQLSort.cpp:49)
      assert(r.map(_.getLong(1)).toSeq == Seq(38L, 33L, 28L))
    }
  }

  test("summarize alias rules (KQL_ReleaseNote.md): count() -> count_, " +
      "count(col) -> count_col, bin key keeps the column name") {
    mk()
    inKusto {
      val r = ch("Customers | summarize count() by bin(Age, 10) " +
        "| sort by Age asc").collect()
      assert(r.head.schema.fieldNames.toSeq == Seq("Age", "count_"))
      assert(r.map(x => (x.getAs[Number](0).longValue,
        x.getAs[Number](1).longValue)).toSeq ==
        Seq((20L, 2L), (30L, 2L), (40L, 1L)))
      val named = ch("Customers | summarize n = dcount(Occupation), " +
        "avg(Age) by Education | sort by Education asc").collect()
      assert(named.head.schema.fieldNames.toSeq ==
        Seq("Education", "n", "avg_Age"))
    }
  }

  test("distinct, extend (replaces an existing column), count operator") {
    mk()
    inKusto {
      assert(ch("Customers | distinct Occupation").count() == 3L)
      val e = ch("Customers | extend Age = Age + 1, IsOld = Age >= 45 " +
        "| where IsOld | project Name, Age").collect()
      // extend REPLACES Age; IsOld computed from the ORIGINAL Age
      // evaluates within the same layer, so 45 stays the threshold on
      // the pre-extend value — dan (45) qualifies, now aged 46
      assert(e.map(x => (x.getString(0), x.getLong(1))).toSeq ==
        Seq(("dan ito", 46L)))
      assert(ch("Customers | count").collect().head.getLong(0) == 5L)
    }
  }

  test("KQL string operators: contains/startswith are case-INSENSITIVE, " +
      "_cs variants exact, has matches whole terms, in~/!in, =~") {
    mk()
    inKusto {
      assert(ch("Customers | where Name contains 'ALICE' | count")
        .head().getLong(0) == 1L)
      assert(ch("Customers | where Name contains_cs 'ALICE' | count")
        .head().getLong(0) == 0L)
      assert(ch("Customers | where Name startswith 'bo' | count")
        .head().getLong(0) == 1L)
      // has = whole term: 'Kim' is a term of 'Alice Kim'; 'Ki' is not
      assert(ch("Customers | where Name has 'kim' | count")
        .head().getLong(0) == 1L)
      assert(ch("Customers | where Name has 'ki' | count")
        .head().getLong(0) == 0L)
      assert(ch("Customers | where Name !has 'kim' | count")
        .head().getLong(0) == 4L)
      assert(ch("Customers | where Occupation in~ ('engineer', 'MANAGER') " +
        "| count").head().getLong(0) == 3L)
      assert(ch("Customers | where Occupation !in ('Engineer') | count")
        .head().getLong(0) == 3L)
      assert(ch("Customers | where Occupation =~ 'engineer' | count")
        .head().getLong(0) == 2L)
      assert(ch("Customers | where Age between (28 .. 33) | count")
        .head().getLong(0) == 3L)
      // decimal bounds (review fix: the lazy bound capture reads 1.5)
      assert(ch("Customers | where Age between (27.5 .. 33.5) | count")
        .head().getLong(0) == 3L)
      // !between (round-14 ADVICE fix: '!' is a non-word char, so the
      // old \b(!)?between could never capture the negation)
      assert(ch("Customers | where Age !between (28 .. 33) | count")
        .head().getLong(0) == 2L)
      // ISO datetime spellings (Kusto's canonical T/Z forms)
      assert(ch("print d = datetime(2024-05-25T08:20:03Z)").collect()
        .head.getTimestamp(0).toString.startsWith("2024-05-25 08:20:03"))
      // =~ with an unreadable operand shape is LOUD, never
      // partially-lowercased
      val eqi = intercept[Exception](ch(
        "Customers | where strcat(Name, strcat('a', 'b')) =~ 'x' | count"))
      assert(eqi.getMessage.contains("=~"))
    }
  }

  test("print, scalar functions, dynamic arrays, 0-based indexing, " +
      "mv-expand") {
    mk()
    inKusto {
      val p = ch("print x = strcat('a', 'b'), strlen('abc'), " +
        "iif(2 > 1, 'y', 'n'), toint('7') + 1").collect().head
      assert(p.getString(0) == "ab")
      assert(p.getAs[Number](1).longValue == 3L) // length
      assert(p.getString(2) == "y")
      assert(p.getAs[Number](3).longValue == 8L)
      // KQL indexes arrays from 0 (KQL_ReleaseNote bug-fix entry)
      val a = ch("print v = dynamic([10, 20, 30])[1]").collect().head
      assert(a.getAs[Number](0).longValue == 20L)
      val mv = ch("print k = 'x', v = dynamic([1, 2, 3]) | mv-expand v " +
        "| summarize s = sum(v) by k").collect().head
      assert(mv.getAs[Number](1).longValue == 6L)
      // case() chain
      val c = ch("print case(1 > 2, 'a', 3 > 2, 'b', 'c')").collect().head
      assert(c.getString(0) == "b")
    }
  }

  test("operator spellings inside string literals never fire; unsupported " +
      "operators reject loudly; SET switches the dialect back") {
    mk()
    inKusto {
      val lit = ch("print s = 'x has y | where contains'").collect().head
      assert(lit.getString(0) == "x has y | where contains")
      val e2 = intercept[Exception](ch("Customers | foobar Age"))
      assert(e2.getMessage.contains("unsupported operator"))
    }
    // back in the default dialect, ordinary SQL runs again
    assert(ch("SELECT 1 AS one").collect().head.getInt(0) == 1)
  }

  test("KQL scalar-function tail (KQLFunctionFactory): 0-based " +
      "substring/indexof/split, countof, trim(regex, s), extract, " +
      "array ops, datetime start/end family, binary ops") {
    inKusto {
      val s1 = ch("print substring('abcdef', 1, 3), indexof('abcdef', 'cd'), " +
        "indexof('abcdef', 'zz'), countof('a,b,a,a', 'a'), " +
        "split('a;b;c', ';', 1), strcat_delim('-', 'x', 'y', 'z'), " +
        "strcmp('a', 'b'), replace_string('aXbXc', 'X', '_')").collect().head
      assert(s1.getString(0) == "bcd")
      assert(s1.getAs[Number](1).longValue == 2L)  // 0-based hit
      assert(s1.getAs[Number](2).longValue == -1L) // miss
      assert(s1.getAs[Number](3).longValue == 3L)
      assert(s1.getString(4) == "b")
      assert(s1.getString(5) == "x-y-z")
      assert(s1.getAs[Number](6).intValue == -1)
      assert(s1.getString(7) == "a_b_c")
      val s2 = ch("print trim('-', '--ab--'), trim_start('-', '--ab--'), " +
        "trim_end('-', '--ab--'), tohex(255), " +
        "base64_decode_tostring(base64_encode_tostring('hi')), " +
        "extract('([0-9]+)', 1, 'v42x'), " +
        "extract_json('$.a', '{\"a\": 7}', typeof(int))").collect().head
      assert(s2.getString(0) == "ab" && s2.getString(1) == "ab--" &&
        s2.getString(2) == "--ab")
      assert(s2.getString(3) == "ff")
      assert(s2.getString(4) == "hi")
      assert(s2.getString(5) == "42")
      assert(s2.getAs[Number](6).intValue == 7)
      val a = ch("print array_length(dynamic([1,2,3])), " +
        "array_index_of(dynamic([10,20]), 20), " +
        "array_index_of(dynamic([10,20]), 99), " +
        "array_sum(dynamic([1,2,3])), " +
        "array_slice(dynamic([0,1,2,3,4]), 1, 3), " +
        "set_has_element(dynamic([1,2]), 2)").collect().head
      assert(a.getAs[Number](0).longValue == 3L)
      assert(a.getAs[Number](1).longValue == 1L)
      assert(a.getAs[Number](2).longValue == -1L)
      assert(a.getAs[Number](3).doubleValue == 6.0)
      assert(a.getSeq[Int](4) == Seq(1, 2, 3))
      assert(a.getBoolean(5))
      val d = ch("print startofmonth(datetime(2024-02-17 10:30:00)), " +
        "endofday(datetime(2024-02-17 10:30:00)), " +
        "getyear(datetime(2024-02-17)), hourofday(datetime(2024-02-17 10:30:00)), " +
        "datetime_diff('day', datetime(2024-02-17), datetime(2024-02-10)), " +
        "datetime_add('day', 3, datetime(2024-02-17)), " +
        "unixtime_seconds_todatetime(86400)").collect().head
      assert(d.getTimestamp(0).toString.startsWith("2024-02-01 00:00:00"))
      assert(d.getTimestamp(1).toString.startsWith("2024-02-17 23:59:59.999999"))
      assert(d.getAs[Number](2).intValue == 2024)
      assert(d.getAs[Number](3).intValue == 10)
      assert(d.getAs[Number](4).longValue == 7L)
      assert(d.getTimestamp(5).toString.startsWith("2024-02-20"))
      assert(d.getTimestamp(6).toString.startsWith("1970-01-02"))
      val b = ch("print binary_and(12, 10), binary_xor(12, 10), " +
        "binary_shift_left(1, 4), bitset_count_ones(255)").collect().head
      assert(b.getAs[Number](0).longValue == 8L)
      assert(b.getAs[Number](1).longValue == 6L)
      assert(b.getAs[Number](2).longValue == 16L)
      assert(b.getAs[Number](3).longValue == 8L)
    }
  }

  test("make-series: dense grid arrays with default fill, numeric and " +
      "by-key forms (ParserKQLMakeSeries)") {
    mk()
    inKusto {
      // ages 28,38,28,45,33 over [20, 50) step 10 → bins 20,30,40:
      // counts [2, 2, 1]; empty bins filled with the default
      val r = ch("Customers | make-series n = count() on Age " +
        "from 20 to 50 step 10").collect().head
      assert(r.getSeq[Double](0) == Seq(2.0, 2.0, 1.0))
      assert(r.getSeq[Double](1) == Seq(20.0, 30.0, 40.0))
      // the FINAL PARTIAL bin is emitted when (to - from) is not a step
      // multiple: [20, 45) step 10 → bins 20, 30, 40 with 45 excluded
      // by the range but age 45 < 45 false → bins carry 2, 2, 0... and
      // [20, 46) keeps 45 in the partial bin [40, 46)
      val part = ch("Customers | make-series n = count() on Age " +
        "from 20 to 46 step 10").collect().head
      assert(part.getSeq[Double](1) == Seq(20.0, 30.0, 40.0))
      assert(part.getSeq[Double](0) == Seq(2.0, 2.0, 1.0),
        "age 45 lands in the final partial bin [40, 46)")
      // by-key + explicit default: engineers have no 30s bin → -1 fill
      val by = ch("Customers | make-series n = count() default = -1 " +
        "on Age from 20 to 50 step 10 by Occupation " +
        "| sort by Occupation asc").collect()
      val eng = by.find(_.getString(0) == "Engineer").get
      assert(eng.getSeq[Double](1) == Seq(2.0, -1.0, -1.0))
      val mgr = by.find(_.getString(0) == "Manager").get
      assert(mgr.getSeq[Double](1) == Seq(-1.0, -1.0, 1.0))
      // aggregate over a column
      val avg = ch("Customers | make-series m = avg(Age) on Age " +
        "from 20 to 50 step 10").collect().head
      assert(avg.getSeq[Double](0) == Seq(28.0, 35.5, 45.0))
    }
  }
}
