package graft

import graft.plans.CrateSubstr
import org.apache.spark.unsafe.types.UTF8String

/** The reference's SubstrFunctionTest ported (server/src/test/java/io/
  * crate/expression/scalar/SubstrFunctionTest.java): clamp semantics
  * for the int form and the (string, string) regex-extract overload —
  * both of which Spark's builtin substr gets wrong (from-the-end
  * negatives; no extract overload). */
class SubstrConformanceSpec extends SparkTestBase {

  private def u(s: String) = UTF8String.fromString(s)

  test("int-form clamp vectors (SubstrFunctionTest + edge table)") {
    assert(CrateSubstr.eval3(u("cratedata"), 6, 2).toString == "da")
    assert(CrateSubstr.eval3(u("cratedata"), 1, 5).toString == "crate")
    // begin ≤ 1 CLAMPS to the start (Spark's builtin counts -3 from
    // the end and would answer 'llo'/'ata')
    assert(CrateSubstr.eval2(u("hello"), -3).toString == "hello")
    assert(CrateSubstr.eval2(u("hello"), 0).toString == "hello")
    assert(CrateSubstr.eval3(u("hello"), -2, 4).toString == "hell")
    // past the end → ''
    assert(CrateSubstr.eval2(u("hello"), 6).toString == "")
    assert(CrateSubstr.eval3(u("hello"), 99, 2).toString == "")
    // length window counts from the CLAMPED start and caps at the end
    assert(CrateSubstr.eval3(u("hello"), 4, 99).toString == "lo")
    // negative length is LOUD (String.substring), a faithful quirk
    intercept[StringIndexOutOfBoundsException](
      CrateSubstr.eval3(u("hello"), 1, -1))
  }

  test("regex-extract overload (SubstrExtractFunction)") {
    assert(CrateSubstr.extract(u("foobar"), u("o.b")).toString == "oob")
    assert(CrateSubstr.extract(u("foobar"), u("o(.)b")).toString == "o")
    // multiple groups → group 1
    assert(CrateSubstr.extract(u("foobar"), u("(.)oo([a-z])")).toString == "f")
    assert(CrateSubstr.extract(u("foobar"), u("((.)oo([a-z]))")).toString
      == "foob")
    assert(CrateSubstr.extract(u("foobar"), u("nomatch")) == null)
  }

  test("SQL surface: builtins overridden, FROM-pattern syntax, nulls") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = Engine.sql(spark,
      "SELECT substr('cratedata', 6, 2) AS a, " +
        "substr('hello', -3) AS b, " +
        "substring('foobar' FROM 'o.b') AS c, " +
        "substring('foobar', '(.)oo([a-z])') AS d, " +
        "substring('foobar', 'nomatch') AS e, " +
        "substr(CAST(NULL AS STRING), 1, 2) AS f, " +
        "substr('abc', CAST(NULL AS INT)) AS g").collect()(0)
    assert(r.getString(0) == "da")
    assert(r.getString(1) == "hello") // Spark's builtin would say 'llo'
    assert(r.getString(2) == "oob")
    assert(r.getString(3) == "f")
    assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
  }
}
