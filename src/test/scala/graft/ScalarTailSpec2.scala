package graft

/** Round-4 scalar tail: the remaining documented scalar surface
  * (docs/general/builtins/scalar-functions.rst) resolving and evaluating
  * through the SQL path — numeric trunc, modulus/mean aliases, timezone,
  * date_bin, all three date_format arities, age, encode/decode formats,
  * array_length, object_keys over literals, 1-arg parse_url, empty_row.
  * Expected values are the reference docs' own examples where the docs
  * give one.
  */
class ScalarTailSpec2 extends SparkTestBase {

  test("date_trunc: 3-arg timezone form + loud invalid interval " +
      "(DateTruncFunctionTest, r14)") {
    graft.functions.GraftFunctions.registerAll(spark)
    def ms(sql: String): Long = Engine.sql(spark,
      s"SELECT unix_millis(CAST($sql AS TIMESTAMP)) AS x").collect()(0)
      .getLong(0)
    // reference testDateTruncWithLongLiteral: day-trunc of
    // 2014-06-03T05:58:05Z is 1401753600000
    assert(ms("date_trunc('day', TIMESTAMP '2014-06-03 05:58:05')") ==
      1401753600000L)
    // 3-arg: truncation on the WALL CLOCK of the zone. Asia/Kolkata is
    // +05:30 — day-trunc of 05:58 IST-wall (= 11:28 IST) lands at
    // 2014-06-02T18:30:00Z; hour-trunc lands on a :30 UTC boundary
    assert(ms("date_trunc('day', 'Asia/Kolkata', " +
      "TIMESTAMP '2014-06-03 05:58:05')") ==
      1401753600000L - 19800000L)
    assert(ms("date_trunc('hour', 'Asia/Kolkata', " +
      "TIMESTAMP '2014-06-03 05:58:05')") % 3600000L == 1800000L)
    // 'UTC' 3-arg equals the 2-arg form (reference testNullTimestamp
    // family uses exactly this spelling)
    assert(ms("date_trunc('second', 'UTC', " +
      "TIMESTAMP '1999-02-25 12:38:01.123')") == 919946281000L)
    // invalid interval is LOUD at plan time with the reference message
    val e = intercept[Exception](Engine.sql(spark,
      "SELECT date_trunc('invalid interval', TIMESTAMP '2020-01-01 00:00:00')")
      .collect())
    assert(e.getMessage.contains(
      "invalid interval 'invalid interval' for scalar 'date_trunc'") ||
      Option(e.getCause).exists(_.getMessage.contains("invalid interval")))
  }

  private def one(sql: String): String = {
    val r = Engine.sql(spark, sql).collect()(0).get(0)
    if (r == null) "null" else r.toString
  }

  test("trunc: 1-arg integral truncation toward zero, 2-arg BigDecimal scale") {
    assert(one("SELECT trunc(29.999999)") == "29")
    assert(one("SELECT trunc(-1.5)") == "-1")
    // docs example: trunc(29.999999, 3) = 29.999
    assert(one("SELECT trunc(29.999999, 3)") == "29.999")
    assert(one("SELECT trunc(-29.999999, 2)") == "-29.99")
    // decimal-string scaling, not float multiply: trunc(0.29, 2) stays 0.29
    assert(one("SELECT trunc(0.29, 2)") == "0.29")
  }

  test("modulus and mean are the reference's spelled-out aliases") {
    assert(one("SELECT modulus(7, 3)") == "1")
    assert(one("SELECT mean(x) FROM (VALUES (1), (2)) AS t(x)") == "1.5")
  }

  test("timezone: docs' Madrid example (epoch millis are naive wall time)") {
    // scalar-functions.rst §timezone: 257504400000 in Madrid → 257500800000
    assert(one("SELECT unix_millis(timezone('Europe/Madrid', 257504400000))")
      == "257500800000")
    // TIMESTAMP input is an instant → wall time in the zone
    assert(one("SELECT timezone('Europe/Madrid', TIMESTAMP '1978-02-28 09:00:00')")
      .startsWith("1978-02-28 10:00"))
  }

  test("date_bin: literal interval, floor-aligned before the origin") {
    assert(one("SELECT date_bin('2 hours'::INTERVAL, TIMESTAMP '2024-01-01 05:17:00', TIMESTAMP '2024-01-01 00:00:00')")
      .startsWith("2024-01-01 04:00:00"))
    assert(one("SELECT date_bin('2 hours'::INTERVAL, TIMESTAMP '2023-12-31 23:00:00', TIMESTAMP '2024-01-01 00:00:00')")
      .startsWith("2023-12-31 22:00:00"))
    val e = intercept[Exception](
      Engine.sql(spark, "SELECT date_bin('1 month'::INTERVAL, TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 00:00:00')"))
    assert(e.getMessage.contains("months"))
  }

  test("date_format: default ISO pattern, 2-arg, 3-arg with zone") {
    assert(one("SELECT date_format(TIMESTAMP '2024-03-05 14:07:09.123')")
      == "2024-03-05T14:07:09.123000Z")
    assert(one("SELECT date_format('%Y/%m', TIMESTAMP '2024-03-05 14:07:09')")
      == "2024/03")
    assert(one("SELECT date_format('%Y-%m-%d %H:%i', 'Europe/Madrid', TIMESTAMP '1978-02-28 09:00:00')")
      == "1978-02-28 10:00")
  }

  test("age: joda yearMonthDayTime decomposition incl. clamp and negation") {
    // clamp edge: Jan 31 23:00 + 1 month = Feb 29 23:00 counts as a month
    // (AgeFunction.java uses joda periods; PG would say 29 days here)
    assert(one("SELECT CAST(age(TIMESTAMP '2024-03-01 00:00:00', TIMESTAMP '2024-01-31 23:00:00') AS STRING)")
      == "1 months 1 hours")
    // reversed arguments swap-and-negate like joda Period.negated()
    assert(one("SELECT CAST(age(TIMESTAMP '2024-01-31 23:00:00', TIMESTAMP '2024-03-01 00:00:00') AS STRING)")
      == "-1 months -1 hours")
    assert(one("SELECT age(TIMESTAMP '2024-01-01 00:00:00') IS NOT NULL") == "true")
  }

  test("encode/decode: base64, lowercase hex, octal escape") {
    assert(one("SELECT encode('abc', 'base64')") == "YWJj")
    assert(one("SELECT encode('abc', 'hex')") == "616263")
    assert(one("SELECT CAST(decode('YWJj', 'base64') AS STRING)") == "abc")
    assert(one("SELECT CAST(decode('616263', 'hex') AS STRING)") == "abc")
    assert(one(raw"SELECT cast(decode(encode('ab\cd', 'escape'), 'escape') AS STRING)")
      == raw"ab\cd")
    val e = intercept[Exception](Engine.sql(spark, "SELECT encode('x', 'mime')"))
    assert(e.getMessage.contains("unsupported format"))
  }

  test("array_length / object_keys over literals") {
    assert(one("SELECT array_length([1,2,3], 1)") == "3")
    assert(one("SELECT array_length(CAST(array() AS ARRAY<INT>), 1)") == "null")
    assert(one("SELECT array_length([1,2,3], 2)") == "null")
    assert(one("SELECT to_json(object_keys({a=1, b=2}))") == """["a","b"]""")
    // MAP-typed objects (dynamic reads) keep working through the same name
    assert(one("SELECT to_json(object_keys(map('x', 1)))") == """["x"]""")
  }

  test("parse_url: 1-arg CrateDB object; 2-arg Spark extractor intact") {
    val u = "'https://user:pw@x.org:4443/a%20b?k=1&k=2&flag#frag'"
    assert(one(s"SELECT parse_url($u)['hostname']") == "x.org")
    assert(one(s"SELECT parse_url($u)['port']") == "4443")
    assert(one(s"SELECT parse_url($u)['path']") == "/a b")
    assert(one(s"SELECT parse_url($u)['fragment']") == "frag")
    assert(one(s"SELECT to_json(parse_url($u)['parameters'])")
      == """{"flag":[null],"k":["1","2"]}""")
    assert(one("SELECT parse_url('https://x.org/a')['port']") == "null")
    assert(one("SELECT parse_url('https://x.org/p', 'HOST')") == "x.org")
  }

  test("empty_row() is a one-row FROM target") {
    assert(one("SELECT 2 + 2 FROM empty_row()") == "4")
  }

  test("_score: match-predicate relevance, 1.0 without a MATCH") {
    // tf saturation: 'x' appears twice → 2/3.2; 'y' once → 1/2.2
    val got = one("SELECT round(_score, 6) FROM (SELECT 'x y z x' AS t) " +
      "WHERE MATCH(t, 'x y')").toDouble
    assert(math.abs(got - (2.0 / 3.2 + 1.0 / 2.2)) < 1e-6, got.toString)
    // no match predicate → constant 1.0 (reference system-columns contract)
    assert(one("SELECT _score FROM (SELECT 1 AS a)") == "1.0")
    // ranking shape: more hits rank higher
    val hi = one("SELECT _score FROM (SELECT 'a a a' AS t) WHERE MATCH(t, 'a')").toDouble
    val lo = one("SELECT _score FROM (SELECT 'a b c' AS t) WHERE MATCH(t, 'a')").toDouble
    assert(hi > lo)
  }

  test("_score over a multi-field MATCH honors boosts and the method") {
    // per-field tf scores: title 'x x' → 2/3.2; body 'x' → 1/2.2
    val tf2 = 2.0 / 3.2; val tf1 = 1.0 / 2.2
    // best_fields (default): max of the boosted field scores
    val best = one("SELECT round(_score, 6) FROM " +
      "(SELECT 'x x' AS title, 'x' AS body) " +
      "WHERE MATCH((title 2.0, body), 'x')").toDouble
    assert(math.abs(best - 2.0 * tf2) < 1e-6, best.toString)
    // most_fields: weighted sum
    val most = one("SELECT round(_score, 6) FROM " +
      "(SELECT 'x x' AS title, 'x' AS body) " +
      "WHERE MATCH((title 2.0, body), 'x') USING most_fields").toDouble
    assert(math.abs(most - (2.0 * tf2 + tf1)) < 1e-6, most.toString)
    // unboosted fields default to 1.0
    val plain = one("SELECT round(_score, 6) FROM " +
      "(SELECT 'x' AS a, 'x x' AS b) WHERE MATCH((a, b), 'x')").toDouble
    assert(math.abs(plain - tf2) < 1e-6, plain.toString)
  }

  test("vector_similarity SQL surface (1 / (1 + l2^2))") {
    assert(one("SELECT vector_similarity(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>), CAST(array(1.0, 0.0) AS ARRAY<FLOAT>))") == "1.0")
    assert(math.abs(one("SELECT vector_similarity(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>), CAST(array(0.0, 1.0) AS ARRAY<FLOAT>))").toDouble
      - 1.0 / 3.0) < 1e-6)
  }

  test("pass-through scalars btrim/ceiling/cot/sha1 (scalar-functions.rst audit)") {
    // the round-9 audit of the reference's scalar list found these four
    // with no graft-side mention: all are Spark builtins the dialect
    // passes through — pin the reference semantics so the parity holds
    assert(one("SELECT btrim('xxhellox', 'x')") == "hello")
    assert(one("SELECT btrim('  hi  ')") == "hi")
    assert(one("SELECT ceiling(3.2)") == "4")
    assert(math.abs(one("SELECT cot(1.0)").toDouble - 1.0 / math.tan(1.0)) < 1e-9)
    // the reference doc's own example vector (scalar-functions.rst sha1)
    assert(one("SELECT sha1('foo')") ==
      "0beec7b5ea3f0fdbc95d0dd47f3c5bc275da8a33")
  }
}
