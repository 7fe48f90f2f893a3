package graft

import graft.plans.CrateMath

/** The reference's math-function edge vectors (LogFunctionTest /
  * SquareRootFunctionTest / RoundFunctionTest semantics): base-10
  * `log`, value-first two-arg log, loud out-of-domain errors, and
  * Math.round ties-toward-positive-infinity with integral returns. */
class MathEdgeConformanceSpec extends SparkTestBase {

  test("log is BASE 10; log(x, b) is value-first; both LOUD") {
    assert(CrateMath.log10(100.0) == 2.0)
    assert(CrateMath.logB(100.0, 10.0) == 2.0) // value first, base second
    assert(CrateMath.ln(Math.E) == 1.0)
    val e0 = intercept[IllegalArgumentException](CrateMath.log10(0.0))
    assert(e0.getMessage == "log(x): given arguments would result in: '-Infinity'")
    val eN = intercept[IllegalArgumentException](CrateMath.log10(-1.0))
    assert(eN.getMessage == "log(x): given arguments would result in: 'NaN'")
    val eB = intercept[IllegalArgumentException](CrateMath.logB(10.0, 1.0))
    assert(eB.getMessage ==
      "log(x, b): given 'base' would result in a division by zero.")
    intercept[IllegalArgumentException](CrateMath.ln(0.0))
  }

  test("sqrt of a negative is LOUD (Spark: NaN)") {
    assert(CrateMath.sqrt(9.0) == 3.0)
    val e = intercept[IllegalArgumentException](CrateMath.sqrt(-1.0))
    assert(e.getMessage == "cannot take square root of a negative number")
  }

  test("1-arg round is Math.round: ties toward +INF, integral return") {
    assert(CrateMath.roundD(-2.5) == -2L) // Spark HALF_UP would say -3
    assert(CrateMath.roundD(2.5) == 3L)
    assert(CrateMath.roundF(-2.5f) == -2)
    assert(CrateMath.roundD(2.4) == 2L)
  }

  test("SQL surface: overrides resolve; 2-arg round keeps Spark") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = Engine.sql(spark,
      "SELECT log(100) AS a, log(100.0, 10.0) AS b, ln(1.0) AS c, " +
        "round(0.0 - 2.5) AS d, round(2.5) AS e, " +
        "round(2.345, 2) AS f, sqrt(16) AS g").collect()(0)
    assert(r.getDouble(0) == 2.0) // base 10, not ln(100)=4.6
    assert(r.getDouble(1) == 2.0)
    assert(r.getDouble(2) == 0.0)
    // literal 2.5 is DECIMAL → Spark Round path, identical to the
    // reference's NUMERIC signature (BigDecimal HALF_UP): -2.5 → -3
    assert(r.getDecimal(3).intValueExact == -3)
    assert(r.getDecimal(4).intValueExact == 3)
    assert(r.getDecimal(5).doubleValue == 2.35)
    assert(r.getDouble(6) == 4.0)
    // double input takes the Math.round branch: ties toward +INF
    val r2 = Engine.sql(spark,
      "SELECT round(CAST(0.0 - 2.5 AS DOUBLE)) AS d8, " +
        "round(CAST(2.5 AS DOUBLE)) AS e8, " +
        "round(CAST(2.5 AS FLOAT)) AS f4").collect()(0)
    assert(r2.getLong(0) == -2L && r2.getLong(1) == 3L)
    assert(r2.getInt(2) == 3)
    val e = intercept[Exception](
      Engine.sql(spark, "SELECT sqrt(0 - 4) AS x").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    assert(msgs(e).exists(m => m != null &&
      m.contains("cannot take square root")), msgs(e).mkString(" | "))
  }
}
