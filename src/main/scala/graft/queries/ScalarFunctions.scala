package graft.queries

import graft.{Q, QueryPack}

/** Scalar-function surface (reference: 742 files under src/Functions —
  * SURVEY §2.8). Spark built-ins cover the curated compatibility list;
  * these queries pin the semantics per category. All expressions are
  * codegen'd Catalyst built-ins — no UDFs in any hot path.
  */
object ScalarFunctions extends QueryPack {

  override def queries: Seq[Q] = Seq(

    // String family (position/like/replace/concat/substring/lower/upper/
    // trim/reverse/lpad/split — src/Functions/position*.cpp, like.cpp,
    // replace*.cpp, concat.cpp, substring.cpp, trim.cpp, ...).
    Q.shared("q_fn_string", """
      SELECT p_partkey,
        UPPER(p_name) AS up,
        LOWER(p_brand) AS lo,
        LENGTH(p_name) AS len,
        SUBSTRING(p_name, 1, 8) AS sub,
        REPLACE(p_type, 'PROMO', 'P_') AS repl,
        CONCAT(p_brand, ':', p_type) AS cat,
        TRIM('  x  ') AS trimmed,
        REVERSE(p_brand) AS rev,
        LPAD(CAST(p_size AS STRING), 4, '0') AS padded,
        POSITION('o' IN p_name) AS pos,
        p_name LIKE '%red%' AS has_red,
        p_type LIKE 'PRO%' AS is_promo
      FROM part
      ORDER BY p_partkey
      LIMIT 500"""),

    // Regex family (match.cpp/replaceRegexp*.cpp via RE2 → Spark RLIKE/
    // REGEXP_REPLACE/REGEXP_EXTRACT; DuckDB wording differs for extract).
    Q.sparkSql("q_fn_regex", """
      SELECT p_partkey,
        p_name RLIKE '^[a-m]' AS starts_low,
        REGEXP_REPLACE(p_name, '[aeiou]', '_') AS devowel,
        REGEXP_EXTRACT(p_type, '([A-Z]+)', 1) AS first_word
      FROM part
      ORDER BY p_partkey
      LIMIT 500""",
      """
      SELECT p_partkey,
        REGEXP_MATCHES(p_name, '^[a-m]') AS starts_low,
        REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devowel,
        COALESCE(REGEXP_EXTRACT(p_type, '([A-Z]+)', 1), '') AS first_word
      FROM part
      ORDER BY p_partkey
      LIMIT 500"""),

    // Split / tokenize (splitByChar.cpp): SPLIT in Spark is regex-based,
    // DuckDB string_split is literal.
    Q.sparkSql("q_fn_split", """
      SELECT p_partkey,
        ARRAY_JOIN(SPLIT(p_name, ' '), '|') AS words,
        CAST(SIZE(SPLIT(p_name, ' ')) AS BIGINT) AS n_words,
        ELEMENT_AT(SPLIT(p_name, ' '), 1) AS first_word
      FROM part ORDER BY p_partkey LIMIT 500""",
      """
      SELECT p_partkey,
        ARRAY_TO_STRING(STRING_SPLIT(p_name, ' '), '|') AS words,
        CAST(LEN(STRING_SPLIT(p_name, ' ')) AS BIGINT) AS n_words,
        STRING_SPLIT(p_name, ' ')[1] AS first_word
      FROM part ORDER BY p_partkey LIMIT 500"""),

    // Math family (FunctionsRound.cpp, exp/log/pow/sqrt/trig).
    Q.shared("q_fn_math", """
      SELECT p_partkey,
        ABS(p_size - 25) AS dist,
        CAST(CEIL(p_retailprice / 100.0) AS BIGINT) AS ceil_h,
        CAST(FLOOR(p_retailprice / 100.0) AS BIGINT) AS floor_h,
        ROUND(SQRT(CAST(p_size AS DOUBLE)), 6) AS sq,
        ROUND(EXP(CAST(p_size AS DOUBLE) / 50.0), 6) AS ex,
        ROUND(LN(p_retailprice), 6) AS lnp,
        ROUND(LOG10(p_retailprice), 6) AS lg,
        ROUND(POW(CAST(p_size AS DOUBLE), 2.0), 1) AS p2,
        CAST(SIGN(p_size - 25) AS INT) AS sg,
        GREATEST(p_size, 10) AS gr,
        LEAST(p_size, 10) AS le,
        MOD(p_size, 7) AS md
      FROM part
      ORDER BY p_partkey
      LIMIT 500"""),

    // Date/time family (DateTimeTransforms.h: toYear/toMonth/toStartOf*,
    // dateDiff, addInterval): EXTRACT + date_trunc + interval arithmetic.
    Q.sparkSql("q_fn_datetime", """
      SELECT o_orderkey,
        CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
        CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
        CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS d,
        CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS q,
        DATE_TRUNC('month', o_orderdate) AS month_start,
        CAST(DATE_TRUNC('week', o_orderdate) AS DATE) AS week_start,
        o_orderdate + INTERVAL 30 DAY AS plus30,
        CAST(DATEDIFF(TIMESTAMP '2002-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_to_2002,
        LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
        DATE_FORMAT(o_orderdate, 'yyyy-MM') AS ym
      FROM orders
      ORDER BY o_orderkey
      LIMIT 1000""",
      """
      SELECT o_orderkey,
        CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
        CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
        CAST(EXTRACT(DAY FROM o_orderdate) AS INT) AS d,
        CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS q,
        DATE_TRUNC('month', o_orderdate) AS month_start,
        CAST(DATE_TRUNC('week', o_orderdate) AS DATE) AS week_start,
        o_orderdate + INTERVAL 30 DAY AS plus30,
        CAST(DATEDIFF('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS BIGINT) AS days_to_2002,
        LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
        STRFTIME(o_orderdate, '%Y-%m') AS ym
      FROM orders
      ORDER BY o_orderkey
      LIMIT 1000"""),

    // toStartOfInterval-style 15-minute bucketing (FunctionsTimeWindow /
    // toStartOfInterval): epoch-floor arithmetic, the batch analog of
    // tumble() — compared as epoch seconds.
    Q.sparkSql("q_fn_time_bucket", """
      SELECT
        CAST(FLOOR(UNIX_MICROS(ts) / 900000000) * 900 AS BIGINT) AS bucket_s,
        COUNT(*) AS n
      FROM events
      GROUP BY 1
      ORDER BY bucket_s""",
      """
      SELECT
        CAST(FLOOR(EPOCH_US(ts) / 900000000) * 900 AS BIGINT) AS bucket_s,
        COUNT(*) AS n
      FROM events
      GROUP BY 1
      ORDER BY bucket_s"""),

    // Conditional family (if/multiIf/caseWithExpression/coalesce/nullIf/
    // ifNull — src/Functions/if.cpp, multiIf.cpp, coalesce.cpp).
    Q.shared("q_fn_conditional", """
      SELECT o_orderkey,
        CASE WHEN o_totalprice > 200000.0 THEN 'big'
             WHEN o_totalprice > 100000.0 THEN 'mid'
             ELSE 'small' END AS size_class,
        CASE o_orderstatus WHEN 'F' THEN 'done' WHEN 'O' THEN 'open' ELSE 'other' END AS status_word,
        COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS coalesced,
        IFNULL(NULLIF(o_orderpriority, '5-LOW'), 'LOW') AS pr
      FROM orders
      ORDER BY o_orderkey
      LIMIT 1000"""),

    // Conversion family (FunctionsConversion: toX, toXOrNull via TRY_CAST).
    Q.shared("q_fn_cast", """
      SELECT
        CAST('42' AS BIGINT) AS i,
        CAST('3.5' AS DOUBLE) AS f,
        TRY_CAST('nope' AS BIGINT) AS bad_int,
        COALESCE(TRY_CAST('nope' AS BIGINT), 0) AS or_zero,
        CAST(CAST('2024-02-29' AS DATE) AS STRING) AS d,
        CAST(CAST('2024-02-29 12:30:00' AS TIMESTAMP) AS STRING) AS t,
        CAST(FLOOR(123.999) AS BIGINT) AS floored_int,
        CAST(TRUE AS INT) AS b
      """),

    // Array family (src/Functions/array/*): literals, element access, HOFs
    // (arrayMap/Filter/Exists → transform/filter/exists), sort, distinct,
    // flatten, slice, sequence, zip, cumulative fold.
    // Array-valued outputs are serialized via ARRAY_JOIN/ARRAY_TO_STRING so
    // every top-level column is scalar (driver harness sorts raw columns).
    Q.sparkSql("q_fn_array", """
      SELECT
        ARRAY_JOIN(TRANSFORM(ARRAY(3, 1, 2), x -> CAST(x AS STRING)), ',') AS arr,
        ELEMENT_AT(ARRAY(3, 1, 2), 2) AS second,
        ARRAY_JOIN(TRANSFORM(ARRAY_SORT(ARRAY(3, 1, 2)), x -> CAST(x AS STRING)), ',') AS sorted,
        ARRAY_JOIN(TRANSFORM(SORT_ARRAY(ARRAY(3, 1, 2), FALSE), x -> CAST(x AS STRING)), ',') AS rsorted,
        ARRAY_JOIN(TRANSFORM(ARRAY_SORT(ARRAY_DISTINCT(ARRAY(1, 2, 2, 3))), x -> CAST(x AS STRING)), ',') AS dist,
        ARRAY_CONTAINS(ARRAY(1, 2, 3), 2) AS has2,
        SIZE(ARRAY(1, 2, 3)) AS sz,
        ARRAY_JOIN(TRANSFORM(FLATTEN(ARRAY(ARRAY(1, 2), ARRAY(3))), x -> CAST(x AS STRING)), ',') AS flat,
        ARRAY_JOIN(TRANSFORM(SLICE(ARRAY(1, 2, 3, 4, 5), 2, 3), x -> CAST(x AS STRING)), ',') AS sliced,
        ARRAY_JOIN(TRANSFORM(SEQUENCE(1, 5), x -> CAST(x AS STRING)), ',') AS seq,
        ARRAY_JOIN(TRANSFORM(TRANSFORM(ARRAY(1, 2, 3), x -> x * 10), x -> CAST(x AS STRING)), ',') AS mapped,
        ARRAY_JOIN(TRANSFORM(FILTER(ARRAY(1, 2, 3, 4), x -> x % 2 = 0), x -> CAST(x AS STRING)), ',') AS evens,
        EXISTS(ARRAY(1, 2, 3), x -> x > 2) AS has_gt2,
        CAST(AGGREGATE(ARRAY(1, 2, 3, 4), 0, (a, x) -> a + x) AS BIGINT) AS folded,
        ARRAY_JOIN(TRANSFORM(ARRAY_SORT(ARRAY_INTERSECT(ARRAY(1, 2, 3), ARRAY(2, 3, 4))), x -> CAST(x AS STRING)), ',') AS inter,
        ARRAY_JOIN(TRANSFORM(ARRAY_SORT(ARRAY_UNION(ARRAY(1, 2), ARRAY(2, 3))), x -> CAST(x AS STRING)), ',') AS uni,
        CAST(ARRAY_POSITION(ARRAY(10, 20, 30), 20) AS BIGINT) AS pos20
      """,
      """
      SELECT
        ARRAY_TO_STRING([3, 1, 2], ',') AS arr,
        [3, 1, 2][2] AS second,
        ARRAY_TO_STRING(LIST_SORT([3, 1, 2]), ',') AS sorted,
        ARRAY_TO_STRING(LIST_REVERSE_SORT([3, 1, 2]), ',') AS rsorted,
        ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT([1, 2, 2, 3])), ',') AS dist,
        LIST_CONTAINS([1, 2, 3], 2) AS has2,
        LEN([1, 2, 3]) AS sz,
        ARRAY_TO_STRING(FLATTEN([[1, 2], [3]]), ',') AS flat,
        ARRAY_TO_STRING([1, 2, 3, 4, 5][2:4], ',') AS sliced,
        ARRAY_TO_STRING(GENERATE_SERIES(1, 5), ',') AS seq,
        ARRAY_TO_STRING(LIST_TRANSFORM([1, 2, 3], x -> x * 10), ',') AS mapped,
        ARRAY_TO_STRING(LIST_FILTER([1, 2, 3, 4], x -> x % 2 = 0), ',') AS evens,
        LEN(LIST_FILTER([1, 2, 3], x -> x > 2)) > 0 AS has_gt2,
        CAST(LIST_SUM([1, 2, 3, 4]) AS BIGINT) AS folded,
        ARRAY_TO_STRING(LIST_SORT(LIST_INTERSECT([1, 2, 3], [2, 3, 4])), ',') AS inter,
        ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST_CONCAT([1, 2], [2, 3]))), ',') AS uni,
        CAST(LIST_POSITION([10, 20, 30], 20) AS BIGINT) AS pos20
      """),

    // arrayJoin → explode (the one row-expanding scalar,
    // src/Functions/array/arrayJoin.cpp → Catalyst Generator).
    Q.sparkSql("q_fn_array_join", """
      SELECT p_partkey, word
      FROM part LATERAL VIEW EXPLODE(SPLIT(p_name, ' ')) AS word
      WHERE p_partkey <= 50
      ORDER BY p_partkey, word""",
      """
      SELECT p_partkey, UNNEST(STRING_SPLIT(p_name, ' ')) AS word
      FROM part
      WHERE p_partkey <= 50
      ORDER BY p_partkey, word"""),

    // Map/struct family (tuple.cpp/tupleElement.cpp/map.cpp,
    // FunctionsMapMiscellaneous.cpp).
    Q.sparkSql("q_fn_struct_map", """
      SELECT
        TO_JSON(STRUCT(1 AS a, 'x' AS b)) AS tup,
        STRUCT(1 AS a, 'x' AS b).a AS tup_elem,
        ARRAY_JOIN(ARRAY_SORT(MAP_KEYS(MAP('k1', 10, 'k2', 20))), ',') AS ks,
        ARRAY_JOIN(TRANSFORM(ARRAY_SORT(MAP_VALUES(MAP('k1', 10, 'k2', 20))),
                   x -> CAST(x AS STRING)), ',') AS vs,
        ELEMENT_AT(MAP('k1', 10, 'k2', 20), 'k2') AS v2
      """,
      """
      SELECT
        CAST(TO_JSON({'a': 1, 'b': 'x'}) AS VARCHAR) AS tup,
        {'a': 1, 'b': 'x'}.a AS tup_elem,
        ARRAY_TO_STRING(LIST_SORT(MAP_KEYS(MAP(['k1','k2'], [10, 20]))), ',') AS ks,
        ARRAY_TO_STRING(LIST_SORT(MAP_VALUES(MAP(['k1','k2'], [10, 20]))), ',') AS vs,
        MAP(['k1','k2'], [10, 20])['k2'][1] AS v2
      """),

    // JSON family (FunctionsJSON.cpp: JSONExtract*/JSONHas/JSONLength):
    // events.props is {"k": N}.
    Q.sparkSql("q_fn_json", """
      SELECT event_id,
        CAST(GET_JSON_OBJECT(props, '$.k') AS BIGINT) AS k,
        GET_JSON_OBJECT(props, '$.missing') IS NOT NULL AS has_missing,
        FROM_JSON(props, 'k BIGINT').k AS parsed_k
      FROM events
      ORDER BY event_id
      LIMIT 2000""",
      """
      SELECT event_id,
        CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k,
        JSON_EXTRACT_STRING(props, '$.missing') IS NOT NULL AS has_missing,
        CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS parsed_k
      FROM events
      ORDER BY event_id
      LIMIT 2000"""),

    // Hash/encoding family (FunctionsHashing, base64Encode.cpp,
    // FunctionsBinaryRepresentation.cpp): engine-portable subset.
    Q.sparkSql("q_fn_hash_encode", """
      SELECT p_partkey,
        MD5(p_name) AS h_md5,
        SHA2(p_name, 256) AS h_sha,
        BASE64(CAST(p_brand AS BINARY)) AS b64,
        HEX(CAST(p_brand AS BINARY)) AS hx
      FROM part
      ORDER BY p_partkey
      LIMIT 200""",
      """
      SELECT p_partkey,
        MD5(p_name) AS h_md5,
        SHA256(p_name) AS h_sha,
        TO_BASE64(ENCODE(p_brand)) AS b64,
        HEX(ENCODE(p_brand)) AS hx
      FROM part
      ORDER BY p_partkey
      LIMIT 200"""),

    // URL family (src/Functions/URL/): domain/path/queryString via
    // regexp over synthesized URLs — identical regexes both engines.
    Q.sparkSql("q_fn_url", """
      SELECT event_id,
        REGEXP_EXTRACT(url, 'https?://([^/]+)', 1) AS domain,
        REGEXP_EXTRACT(url, 'https?://[^/]+(/[^?]*)', 1) AS path,
        REGEXP_EXTRACT(url, '\\?(.*)$', 1) AS query_string
      FROM (SELECT event_id,
              CONCAT('https://example.com/t/', event_type, '?u=', CAST(user_id AS STRING)) AS url
            FROM events) t
      ORDER BY event_id
      LIMIT 2000""",
      """
      SELECT event_id,
        REGEXP_EXTRACT(url, 'https?://([^/]+)', 1) AS domain,
        REGEXP_EXTRACT(url, 'https?://[^/]+(/[^?]*)', 1) AS path,
        REGEXP_EXTRACT(url, '\?(.*)$', 1) AS query_string
      FROM (SELECT event_id,
              CONCAT('https://example.com/t/', event_type, '?u=', CAST(user_id AS STRING)) AS url
            FROM events) t
      ORDER BY event_id
      LIMIT 2000""")
  )
}
