package graft

/** Round-15 reference string/scalar tail vectors — the remaining
  * reference suites with no counterpart in this tree, ported arm for
  * arm:
  *
  *  - StringLeftRightFunctionTest — left/right with NEGATIVE lengths
  *    are PG's all-but-N (Spark's builtins return ''); strict nulls.
  *    Routed to GraftLeftRightExpr.
  *  - ChrFunctionTest — chr() is loud outside [1, 0x10FFFF] with the
  *    reference's messages verbatim (Spark wraps modulo 256).
  *    GraftChrExpr.
  *  - StringSplitPartFunctionTest — split_part rejects index < 1
  *    loudly, empty delimiter means no-split (Spark splits '' into
  *    characters and accepts negative from-the-end indexes).
  *    GraftSplitPartExpr.
  *  - StringRepeatFunctionTest / InitCapFunctionTest — Spark's natives
  *    already match (negative repeat → '', initcap word-starts on
  *    space chars with the rest LOWERCASED); pinned.
  *  - AtTimezoneSyntaxFunctionTest — `<ts> AT TIME ZONE <zone>` parses
  *    to `timezone(zone, ts)` (Dialect.passAtTimeZone; Spark has no
  *    such syntax).
  *  - Ignore3vlFunctionTest — ignore3vl(NULL) is FALSE.
  *  - ArithmeticOverflowTest — integer/bigint overflow is LOUD (Spark
  *    4 ANSI default matches the reference; pinned so a conf change
  *    that silently re-enables wrapping fails here).
  */
class StringTailReferenceConformanceSpec extends SparkTestBase {

  private def one(sql: String) = {
    graft.functions.GraftFunctions.registerAll(spark)
    Engine.sql(spark, sql).collect()(0)
  }

  test("left/right negative lengths (StringLeftRightFunctionTest)") {
    val r = one("SELECT left('crate.io', 5) AS a, left('crate.io', -3) AS b, " +
      "left('crate.io', 0) AS c, left('crate.io', 100) AS d, " +
      "right('crate.io', 2) AS e, right('crate.io', -6) AS f, " +
      "right('crate.io', 0) AS g, right('crate.io', 100) AS h, " +
      "left('', 100) AS i, right('', 100) AS j")
    assert(r.getString(0) == "crate" && r.getString(1) == "crate")
    assert(r.getString(2) == "" && r.getString(3) == "crate.io")
    assert(r.getString(4) == "io" && r.getString(5) == "io")
    assert(r.getString(6) == "" && r.getString(7) == "crate.io")
    assert(r.getString(8) == "" && r.getString(9) == "")
    val n = one("SELECT left(NULL, 10) AS a, left('x', NULL) AS b, " +
      "right(NULL, 10) AS c, right('x', NULL) AS d")
    (0 until 4).foreach(i => assert(n.isNullAt(i)))
  }

  test("chr loud range with reference messages (ChrFunctionTest)") {
    assert(one("SELECT chr(65)").getString(0) == "A")
    assert(one("SELECT chr(97)").getString(0) == "a")
    assert(one("SELECT chr(NULL)").isNullAt(0))
    val e0 = intercept[Exception](one("SELECT chr(0)"))
    assert(e0.getMessage.contains("null character not permitted"))
    val en = intercept[Exception](one("SELECT chr(-1)"))
    assert(en.getMessage.contains("requested character too large for encoding: -1"))
    val eb = intercept[Exception](one("SELECT chr(1114112)"))
    assert(eb.getMessage.contains("requested character too large for encoding: 1114112"))
  }

  test("split_part contract (StringSplitPartFunctionTest)") {
    val r = one("SELECT split_part('abc~@~def~@~ghi', '~@~', 1) AS a, " +
      "split_part('abc~@~def~@~ghi', '~@~', 2) AS b, " +
      "split_part('abc~@~def~@~ghi', '~@~', 3) AS c, " +
      "split_part('abc~@~def~@~ghi', '~@~', 4) AS d, " +
      "split_part('abcdefg', '', 1) AS e, split_part('abcdefg', '', 2) AS f")
    assert(r.getString(0) == "abc" && r.getString(1) == "def")
    assert(r.getString(2) == "ghi" && r.getString(3) == "")
    assert(r.getString(4) == "abcdefg" && r.getString(5) == "")
    val n = one("SELECT split_part(NULL, ',', 3) AS a, " +
      "split_part('a', NULL, 1) AS b, split_part('a,b', ',', NULL) AS c")
    (0 until 3).foreach(i => assert(n.isNullAt(i)))
    val e = intercept[Exception](one("SELECT split_part('a,b,c', ',', 0)"))
    assert(e.getMessage.contains("index in split_part must be greater than zero"))
    val e2 = intercept[Exception](one("SELECT split_part('a,b,c', ',', -1)"))
    assert(e2.getMessage.contains("index in split_part must be greater than zero"))
  }

  test("repeat/initcap pinned natives (StringRepeatFunctionTest/InitCapFunctionTest)") {
    val r = one("SELECT repeat('test', 3) AS a, repeat('test', 0) AS b, " +
      "repeat('test', -1) AS c, repeat('', 3) AS d, " +
      "initcap('hello world!') AS e, initcap('HELLO WORLD!') AS f, " +
      "initcap('HellO 1WORLD !') AS g, initcap('') AS h, " +
      "initcap('汉字 this is chinese!') AS i, initcap('ÄÖÜ αß àbc γ') AS j")
    assert(r.getString(0) == "testtesttest" && r.getString(1) == "")
    assert(r.getString(2) == "" && r.getString(3) == "")
    assert(r.getString(4) == "Hello World!" && r.getString(5) == "Hello World!")
    assert(r.getString(6) == "Hello 1world !" && r.getString(7) == "")
    assert(r.getString(8) == "汉字 This Is Chinese!")
    assert(r.getString(9) == "Äöü Αß Àbc Γ")
    val n = one("SELECT repeat(NULL, 1) AS a, repeat('', NULL) AS b, initcap(NULL) AS c")
    (0 until 3).foreach(i => assert(n.isNullAt(i)))
  }

  test("AT TIME ZONE lowers to timezone(zone, ts) (AtTimezoneSyntaxFunctionTest)") {
    assert(Dialect.translate("SELECT ts AT TIME ZONE 'Europe/Madrid' FROM t") ==
      "SELECT timezone('Europe/Madrid', ts) AS timezone FROM t")
    assert(Dialect.translate("SELECT '1978-02-28T10:00:00+01:00' AT TIME ZONE 'Europe/Madrid'") ==
      "SELECT timezone('Europe/Madrid', '1978-02-28T10:00:00+01:00') AS timezone")
    // and the lowered call evaluates through the registered twin
    val r = one("SELECT CAST(timezone('Europe/Madrid', 257504400000) AS STRING) AS a")
    assert(r.getString(0).startsWith("1978-02-28 08:00:00"))
  }

  test("ignore3vl and loud arithmetic overflow (Ignore3vlFunctionTest/ArithmeticOverflowTest)") {
    val r = one("SELECT ignore3vl(NULL) AS a, ignore3vl(TRUE) AS b, ignore3vl(FALSE) AS c")
    assert(!r.getBoolean(0) && r.getBoolean(1) && !r.getBoolean(2))
    val e = intercept[Exception](one("SELECT CAST(2147483647 AS INT) + CAST(1 AS INT)"))
    assert(e.getMessage.toLowerCase.contains("overflow"))
    val e2 = intercept[Exception](one("SELECT 9223372036854775807 + 1"))
    assert(e2.getMessage.toLowerCase.contains("overflow"))
  }
}
