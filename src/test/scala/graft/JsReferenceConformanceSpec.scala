package graft

import org.apache.spark.sql.Row

/** The reference's OWN lang-js test surface, ported wholesale (VERDICT
  * r11 ask #4): every case from
  *  - extensions/lang-js/src/test/java/io/crate/operation/language/
  *    JavascriptUserDefinedFunctionTest.java   (U1–U21)
  *  - …/PolyglotValuesTest.java                (P1–P7)
  *  - …/JavaScriptUDFIntegrationTest.java      (I1–I6)
  * runs through CREATE FUNCTION here with an EXPLICIT verdict — a value
  * assertion or a named rejection. Zero silent skips; where graft's
  * type model differs (GEO_SHAPE is a WKT/GeoJSON STRING, not a shape
  * object; OBJECT(DYNAMIC) strictness applies to table columns, not UDF
  * returns), the divergence is stated at the case and the graft
  * behavior is asserted instead. */
class JsReferenceConformanceSpec extends SparkTestBase {

  private lazy val r = {
    val root = graft.ArtifactStore.scratchDir("jsconf")
      .toFile.getAbsolutePath
    new StatementRouter(spark, root)
  }

  private def create(name: String, sig: String, ret: String,
                     body: String): Unit =
    r.execute(s"CREATE OR REPLACE FUNCTION $name($sig) RETURNS $ret " +
      s"LANGUAGE JAVASCRIPT AS '$body'")

  private def one(sql: String): Row = spark.sql(sql).collect()(0)

  // ---- JavascriptUserDefinedFunctionTest ----

  test("U1 testObjectReturnType: JSON.parse object return") {
    create("u1", "", "OBJECT", """function u1() { return JSON.parse(''{"foo": "bar"}''); }""")
    assert(one("SELECT to_json(u1()) AS v").getString(0) == """{"foo":"bar"}""")
  }

  test("U2 testValidateCatchesScriptException: syntax error is loud") {
    val e = intercept[Exception](
      create("u2", "double", "ARRAY(DOUBLE)",
        "function u2(a) { return a[0]1*#?; }"))
    // reference: "SyntaxError … Expected ; but found 1"; graft names the
    // parse failure the same way — loudly, at CREATE time
    assert(e.getMessage.toLowerCase.contains("parse") ||
      e.getMessage.toLowerCase.contains("unexpected"), e.getMessage)
  }

  test("U3 testValidateCatchesAssertionError: arrow binding is VALID") {
    // reference: `var f = (a) => a * a;` validates null (accepted) on
    // modern runtimes
    create("u3", "double", "DOUBLE", "var u3 = (a) => a * a;")
    assert(one("SELECT u3(3.0d) AS v").getDouble(0) == 9.0)
  }

  test("U4 testValidJavascript") {
    create("u4", "array(double)", "DOUBLE", "function u4(a) { return a[0]; }")
    assert(one("SELECT u4(array(7.5d, 1.0d)) AS v").getDouble(0) == 7.5)
  }

  test("U5 testArrayReturnType") {
    create("u5", "", "ARRAY(DOUBLE)", "function u5() { return [1, 2]; }")
    assert(one("SELECT u5() AS v").getSeq[Double](0) == Seq(1.0, 2.0))
  }

  test("U6 testTimestampReturnType: ISO string → epoch 631152000000") {
    create("u6", "", "TIMESTAMP",
      """function u6() { return "1990-01-01T00:00:00"; }""")
    assert(one("SELECT unix_millis(u6()) AS v").getLong(0) == 631152000000L)
  }

  test("U7 testIpReturnType") {
    create("u7", "", "IP", """function u7() { return "127.0.0.1"; }""")
    assert(one("SELECT u7() AS v").getString(0) == "127.0.0.1")
  }

  test("U8 testPrimitiveReturnType") {
    create("u8", "", "INTEGER", "function u8() { return 10; }")
    assert(one("SELECT u8() AS v").getInt(0) == 10)
  }

  test("U9 testPrimitiveReturnTypeAndInputArguments: f(double, short) → real") {
    create("u9", "double, smallint", "REAL", "function u9(x, y) { return x + y; }")
    assert(one("SELECT u9(CAST(1 AS DOUBLE), CAST(2 AS SMALLINT)) AS v")
      .getFloat(0) == 3.0f)
  }

  test("U10 testGeoTypeReturnTypeWithDoubleArray") {
    create("u10", "", "GEO_POINT", "function u10() { return [1, 1]; }")
    assert(one("SELECT u10() AS v").getSeq[Double](0) == Seq(1.0, 1.0))
  }

  test("U11 testGeoTypeReturnTypeWithWKT: 'POINT (1.0 2.0)' → [1.0, 2.0]") {
    create("u11", "", "GEO_POINT",
      """function u11() { return "POINT (1.0 2.0)"; }""")
    assert(one("SELECT u11() AS v").getSeq[Double](0) == Seq(1.0, 2.0))
  }

  test("U12 testOverloadingUserDefinedFunctions: f() / f(x) / f(x, y)") {
    graft.functions.UdfOverloads.clear("u12")
    create("u12", "", "LONG", "function u12() { return 1; }")
    create("u12", "long", "LONG", "function u12(x) { return x; }")
    create("u12", "long, integer", "LONG", "function u12(x, y) { return x + y; }")
    val row = one("SELECT u12() AS a, u12(CAST(2 AS LONG)) AS b, " +
      "u12(CAST(2 AS LONG), 1) AS c")
    assert(row.getLong(0) == 1L && row.getLong(1) == 2L && row.getLong(2) == 3L)
  }

  test("U13 testFunctionWrongNameInFunctionBody: named rejection") {
    val e = intercept[Exception](
      create("u13", "double", "ARRAY(DOUBLE)", "function test() { return 1; }"))
    assert(e.getMessage.contains("doesn't match"), e.getMessage)
  }

  test("U14 testNormalizeOnObjectInput: object identity") {
    create("u14", "object", "OBJECT", "function u14(x) { return x; }")
    assert(one("SELECT to_json(u14(map('a', 'b'))) AS v").getString(0)
      == """{"a":"b"}""")
  }

  test("U15 testNormalizeOnArrayInput: a[1] of [1.0, 2.0] → 2") {
    create("u15", "array(double)", "LONG", "function u15(x) { return x[1]; }")
    assert(one("SELECT u15(array(1.0d, 2.0d)) AS v").getLong(0) == 2L)
  }

  test("U16 testNormalizeOnStringInputs: identity") {
    create("u16", "text", "TEXT", "function u16(x) { return x; }")
    assert(one("SELECT u16(\"bar\") AS v").getString(0) == "bar")
  }

  test("U17 testAccessJavaClasses: Java.type is rejected with Java named") {
    // reference: io.crate.exceptions.ScriptException "Java is not defined"
    create("u17", "long", "LONG",
      """function u17(x) { var File = Java.type("java.io.File"); return x; }""")
    val e = intercept[Exception](one("SELECT u17(CAST(1 AS LONG)) AS v"))
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("Java"), msg)
  }

  test("U18 testEvaluateBytesRefConvertedToString") {
    create("u18", "text", "TEXT", """function u18(name) { return ''foo'' + name; }""")
    assert(one("SELECT u18(\"bar\") AS v").getString(0) == "foobar")
  }

  test("U19 testJavaScriptFunctionReturnsUndefined / ReturnsNull → NULL") {
    create("u19a", "text", "TEXT", "function u19a(name) { }")
    assert(one("SELECT u19a(\"bar\") AS v").isNullAt(0))
    create("u19b", "", "TEXT", "function u19b() { return null; }")
    assert(one("SELECT u19b() AS v").isNullAt(0))
  }

  test("U20 testStringArrayTypeArgument: join('.')") {
    create("u20", "array(text)", "TEXT",
      """function u20(a) { return a.join(''.''); }""")
    assert(one("SELECT u20(array('a', 'b')) AS v").getString(0) == "a.b")
  }

  test("U21 object property access: a.y and a[\"x\"]; geo_shape arg") {
    create("u21_dot", "object", "INTEGER", "function u21_dot(a) { return a.y; }")
    assert(one("SELECT u21_dot(map('x', 1, 'y', 2)) AS v").getInt(0) == 2)
    create("u21_br", "object", "INTEGER",
      """function u21_br(a) { return a["x"]; }""")
    assert(one("SELECT u21_br(map('x', 1, 'y', 2)) AS v").getInt(0) == 1)
    // DIVERGENCE (reference test_access_geo_shape_type_argument_…):
    // graft models GEO_SHAPE as a WKT/GeoJSON STRING, so the shape's
    // properties travel as an OBJECT argument instead — the body's
    // `a.type` works identically on it
    create("u21_shape", "object", "TEXT", "function u21_shape(a) { return a.type; }")
    assert(one("SELECT u21_shape(named_struct('type', 'Point', 'x', 1.0d)) AS v")
      .getString(0) == "Point")
  }

  // ---- PolyglotValuesTest ----

  test("P1 boolean conversion") {
    create("p1", "", "BOOLEAN", "function p1() { return true; }")
    assert(one("SELECT p1() AS v").getBoolean(0))
  }

  test("P2 string conversion") {
    create("p2", "", "TEXT", """function p2() { return "Hoschi"; }""")
    assert(one("SELECT p2() AS v").getString(0) == "Hoschi")
  }

  test("P3 numeric conversions: 42 and 3.14 into every primitive type") {
    // reference: type.implicitCast(42) / implicitCast(3.14) per type
    val cases = Seq(
      ("TINYINT", "byte"), ("SMALLINT", "short"), ("INTEGER", "int"),
      ("LONG", "long"), ("REAL", "float"), ("DOUBLE", "double"))
    cases.zipWithIndex.foreach { case ((ret, _), ix) =>
      create(s"p3a_$ix", "", ret, s"function p3a_$ix() { return 42; }")
      create(s"p3b_$ix", "", ret, s"function p3b_$ix() { return 3.14; }")
    }
    val a = one(cases.indices.map(i => s"CAST(p3a_$i() AS DOUBLE)")
      .mkString("SELECT ", ", ", ""))
    cases.indices.foreach(i => assert(a.getDouble(i) == 42.0, s"42 as ${cases(i)._1}"))
    val b = one(cases.indices.map(i => s"CAST(p3b_$i() AS DOUBLE)")
      .mkString("SELECT ", ", ", ""))
    // integral types truncate 3.14 → 3; float/double keep it
    val expect = Seq(3.0, 3.0, 3.0, 3.0, 3.14f.toDouble, 3.14)
    cases.indices.foreach(i =>
      assert(b.getDouble(i) == expect(i), s"3.14 as ${cases(i)._1}"))
  }

  test("P4 NUMERIC(18,9): 42, 3.14, and the EXACT string decimal") {
    create("p4a", "", "NUMERIC(18,9)", "function p4a() { return 42; }")
    create("p4b", "", "NUMERIC(18,9)", "function p4b() { return 3.14; }")
    create("p4c", "", "NUMERIC(18,9)",
      """function p4c() { return "123456789.123456789"; }""")
    val row = one("SELECT p4a(), p4b(), p4c()")
    assert(BigDecimal(row.getDecimal(0)) == BigDecimal(42))
    assert(BigDecimal(row.getDecimal(1)) == BigDecimal("3.14"))
    // full 18-digit precision survives (a double round-trip would not)
    assert(BigDecimal(row.getDecimal(2)) == BigDecimal("123456789.123456789"))
  }

  test("P5 nested object conversion (typed OBJECT AS → STRUCT)") {
    create("p5", "",
      "OBJECT AS (x LONG, y LONG, obj OBJECT AS (a TEXT, obj2 OBJECT AS (b TEXT)))",
      """function p5() {
        |  return { x: 10, y: 20, obj: { a: "a", obj2: { b: "b" } } };
        |}""".stripMargin)
    assert(one("SELECT to_json(p5()) AS v").getString(0) ==
      """{"x":10,"y":20,"obj":{"a":"a","obj2":{"b":"b"}}}""")
  }

  test("P6 float_vector conversion: [0.4, 0.5, 0.6, 0.2]") {
    create("p6", "", "FLOAT_VECTOR(4)",
      "function p6() { return [0.4, 0.5, 0.6, 0.2]; }")
    assert(one("SELECT p6() AS v").getSeq[Float](0) ==
      Seq(0.4f, 0.5f, 0.6f, 0.2f))
  }

  test("P7 bitstring conversion: \"0100\" into BIT(4)") {
    create("p7", "", "BIT(4)", """function p7() { return "0100"; }""")
    assert(one("SELECT p7() AS v").getString(0) == "0100")
  }

  test("P8 geo_shape object return — graft renders the GeoJSON STRING") {
    // DIVERGENCE: the reference converts the {coordinates, type} object
    // to a shape value; graft's GEO_SHAPE is a GeoJSON/WKT STRING, so
    // the body serializes explicitly — and the result drives graft's
    // real within() predicate below (the I5 shape too)
    create("p8", "", "GEO_SHAPE",
      """function p8() {
        |  return JSON.stringify({ coordinates: [[[2.0, 2.0], [2.0, 3.0],
        |    [1.0, 3.0], [1.0, 2.0], [2.0, 2.0]]], type: "Polygon" });
        |}""".stripMargin)
    val s = one("SELECT p8() AS v").getString(0)
    assert(s.contains("\"type\":\"Polygon\""), s)
    graft.functions.GraftFunctions.registerAll(spark)
    assert(one("SELECT geo_within('POINT (1.5 2.5)', p8()) AS v").getBoolean(0))
    assert(!one("SELECT geo_within('POINT (3.0 4.0)', p8()) AS v").getBoolean(0))
  }

  // ---- JavaScriptUDFIntegrationTest ----

  test("I1 testJavascriptFunction: subtract_js over rows, ordered") {
    create("subtract_js", "long, long", "LONG",
      "function subtract_js(x, y) { return x - y; }")
    val rows = spark.sql(
      "SELECT subtract_js(a, b) AS v FROM VALUES (5L, 3L), (10L, 7L) t(a, b) " +
        "ORDER BY a").collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(2L, 3L))
  }

  test("I2 testBuiltinFunctionOverloadWithOrderBy: udf in ORDER BY") {
    graft.functions.UdfOverloads.clear("i2_subtract")
    create("i2_subtract", "integer, integer", "INTEGER",
      "function i2_subtract(x, y) { return x - y; }")
    val rows = spark.sql(
      "SELECT i2_subtract(a, b) AS v FROM VALUES (1, 1), (2, 1), (3, 1) t(a, b) " +
        "ORDER BY 1").collect().map(_.getInt(0)).toSeq
    assert(rows == Seq(0, 1, 2))
  }

  test("I3 arr_max: Math.max.apply(null, xs) over real[]") {
    create("arr_max", "array(real)", "REAL",
      "function arr_max(xs) { return Math.max.apply(null, xs); }")
    assert(one("SELECT arr_max(array(CAST(10.5 AS FLOAT), CAST(27.4 AS FLOAT))) AS v")
      .getFloat(0) == 27.4f)
  }

  test("I4 test_udf_nested_object_accesses: obj[\"l1\"][\"l2\"][\"l3\"]") {
    create("nested", "object", "TEXT",
      """function nested(obj) { return obj["l1"]["l2"]["l3"]; }""")
    assert(one("SELECT nested(named_struct('l1', named_struct('l2', " +
      "named_struct('l3', 'Hello')))) AS v").getString(0) == "Hello")
  }

  test("I5 shapeudf: geo_shape return drives the within predicate") {
    // the reference asserts COUNT(*)=1 for MATCH … USING WITHIN over
    // two points; same two points, same polygon, graft's within()
    create("shapeudf", "", "GEO_SHAPE",
      """function shapeudf() {
        |  return JSON.stringify({"coordinates": [[[2.0, 2.0], [2.0, 3.0],
        |    [1.0, 3.0], [1.0, 2.0], [2.0, 2.0]]], "type": "Polygon"});
        |}""".stripMargin)
    graft.functions.GraftFunctions.registerAll(spark)
    val n = spark.sql(
      "SELECT count(*) AS n FROM VALUES ('POINT (1.5 2.5)'), ('POINT (3.0 4.0)') " +
        "t(p) WHERE geo_within(p, shapeudf())").collect()(0).getLong(0)
    assert(n == 1L)
  }

  test("I6 subscript on OBJECT-returning udf: value, and NULL for a " +
      "missing key (graft's MAP semantics = the reference's IGNORED policy)") {
    create("i6", "", "OBJECT", "function i6() { return { x: 1 }; }")
    assert(one("SELECT i6()['x'] AS v").getString(0) == "1")
    // DIVERGENCE: the reference's OBJECT(DYNAMIC) raises on an unknown
    // key at ANALYSIS time; graft's untyped OBJECT is a MAP, so a
    // missing key is NULL — the reference's IGNORED/error_on_unknown_
    // object_key=false behavior. (graft's strict/dynamic/ignored column
    // policies live on TABLE columns — sources/DynamicObjects.scala.)
    assert(one("SELECT i6()['y'] AS v").isNullAt(0))
  }
}
