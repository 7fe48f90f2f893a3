package graft

import org.apache.spark.sql.functions._

/** The two fringe types earlier rounds documented as failure modes, now
  * modeled: TIME WITH TIME ZONE (reference TimeTZ.java / TimeTZParser
  * .java — struct<micros, offset_sec>, lexicographic compare) and BIT(n)
  * (reference BitStringType.java / BitString.java — raw-bits string,
  * whose text order IS bit_cmp). */
class FringeTypesSpec extends SparkTestBase {

  private def tz(s: String): (Long, Int) = graft.plans.TimeTzUtil.parse(s)

  test("timetz parse: the reference formatter's accepted shapes") {
    assert(tz("13") == (13L * 3600 * 1000000, 0))
    assert(tz("13:59") == ((13L * 60 + 59) * 60 * 1000000, 0))
    assert(tz("135959") == (((13L * 60 + 59) * 60 + 59) * 1000000, 0))
    assert(tz("13:59:59.999") == ((((13L * 60 + 59) * 60 + 59) * 1000000 + 999000, 0)))
    assert(tz("13:59:59.999999") == ((((13L * 60 + 59) * 60 + 59) * 1000000 + 999999, 0)))
    assert(tz("13:00:00Z") == (13L * 3600 * 1000000, 0))
    assert(tz("13:00:00+02") == (13L * 3600 * 1000000, 7200))
    assert(tz("13:00:00+0230") == (13L * 3600 * 1000000, 9000))
    assert(tz("13:00:00-05:30") == (13L * 3600 * 1000000, -(5 * 3600 + 1800)))
    assert(tz(" 13:00:00 + 02:00 ") == (13L * 3600 * 1000000, 7200))
  }

  test("timetz rejections: named zones (clock-dependent) and bad ranges") {
    val e1 = intercept[IllegalArgumentException](tz("13:00:00 Europe/Berlin"))
    assert(e1.getMessage.contains("named time zone"), e1.getMessage)
    intercept[IllegalArgumentException](tz("25:00:00"))
    intercept[IllegalArgumentException](tz("13:61:00"))
    intercept[IllegalArgumentException](tz("not a time"))
  }

  test("timetz format matches TimeTZParser.formatTime") {
    import graft.plans.TimeTzUtil
    assert(TimeTzUtil.format(13L * 3600 * 1000000, 0).toString == "13:00:00")
    assert(TimeTzUtil.format(13L * 3600 * 1000000, 7200).toString == "13:00:00+02:00")
    val (m, o) = tz("04:05:06.789+01")
    assert(TimeTzUtil.format(m, o).toString == "04:05:06.789+01:00")
  }

  test("timetz struct ordering = reference (micros, offset) compare") {
    graft.functions.GraftFunctions.registerAll(spark)
    import spark.implicits._
    // 10:00+14 is an EARLIER instant than 09:00+00, but the reference
    // orders by local micros first — so 09:00 sorts before 10:00
    val out = Seq("10:00:00+14", "09:00:00", "09:00:00+02", "09:00:00-03")
      .toDF("s")
      .select(col("s"), expr("timetz(s)").as("t"))
      .orderBy(col("t"))
      .select(col("s")).collect().map(_.getString(0)).toSeq
    assert(out == Seq("09:00:00-03", "09:00:00", "09:00:00+02", "10:00:00+14"))
  }

  test("timetz through SQL: :: cast, CAST AS, equality, format") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = Engine.sql(spark,
      "SELECT '13:00:00+02'::timetz = CAST('13:00:00+02:00' AS time with time zone) AS eq, " +
        "timetz_format('13:00:00.5+02'::timetz) AS f")
      .collect()(0)
    assert(r.getBoolean(0))
    // ISO_TIME trims trailing fraction zeros — the reference's own output
    assert(r.getString(1) == "13:00:00.5+02:00")
  }

  test("only `time WITH time zone` routes to timetz; time(n) and " +
      "`time without time zone` keep the CAST path (ADVICE r12)") {
    graft.functions.GraftFunctions.registerAll(spark)
    // ::time with time zone → the timetz STRUCT
    val tz = Engine.sql(spark,
      "SELECT '09:30:00+02'::time with time zone AS t").schema("t")
    assert(tz.dataType.typeName == "struct", tz.dataType.sql)
    // ::time(3) / ::time without time zone → the plain CAST path, which
    // fails LOUDLY (Spark gates the TIME type; the reference grammar has
    // no plain-TIME column type either) — NOT a silent rewrite to the
    // timetz struct (the r11 fringe-condition regression)
    val e1 = intercept[Exception](Engine.sql(spark,
      "SELECT '09:30:00.1234'::time(3) AS t").schema("t"))
    assert(e1.getMessage.toUpperCase.contains("TIME"), e1.getMessage)
    val e2 = intercept[Exception](Engine.sql(spark,
      "SELECT '09:30:00'::time without time zone AS t").schema("t"))
    assert(e2.getMessage.toUpperCase.contains("TIME"), e2.getMessage)
  }

  test("BIT literals, ordering, and explicit casts") {
    graft.functions.GraftFunctions.registerAll(spark)
    // B'…' literal is the raw-bits string; ordering is bit_cmp
    val r = Engine.sql(spark,
      "SELECT B'0101' AS b, B'0101' = '0101' AS eq, " +
        "B'011' < B'1' AS lt, B'01' < B'010' AS pfx, " +
        "'0101011'::bit(4) AS trimmed").collect()(0)
    assert(r.getString(0) == "0101" && r.getBoolean(1) && r.getBoolean(2)
      && r.getBoolean(3) && r.getString(4) == "0101")
    // a shorter string EXTENDS with zero bits (BitStringType.explicitCast
    // — BitStringTypeTest.test_explicit_cast_can_extend_bitstring pins
    // "111"::bit(4) = "1110"); non-0/1 content still fails loudly
    val ext = Engine.sql(spark,
      "SELECT '111'::bit(4) AS a, '01'::bit(4) AS b").collect()(0)
    assert(ext.getString(0) == "1110" && ext.getString(1) == "0100")
    val e = intercept[Exception](
      Engine.sql(spark, "SELECT '01x1'::bit(4) AS x").collect())
    assert(e.getMessage.contains("bit(4)"), e.getMessage)
    val e2 = intercept[Exception](
      Engine.sql(spark, "SELECT B'012' AS x").collect())
    assert(e2.getMessage.contains("bit"), e2.getMessage)
  }

  test("BIT(n) columns enforce exact length at write, like valueForInsert") {
    val root = graft.ArtifactStore.scratchDir("graft_bit")
      .toFile.getAbsolutePath
    val r = new StatementRouter(spark, root)
    r.execute("CREATE TABLE bt (id BIGINT PRIMARY KEY, b BIT(6))")
    r.execute("INSERT INTO bt (id, b) VALUES (1, B'110011'), (2, B'000001')")
    // wrong length → loud write-time failure (implicit check)
    val e = intercept[Exception](
      r.execute("INSERT INTO bt (id, b) VALUES (3, B'1100')"))
    assert(e.getMessage.toLowerCase.contains("check") ||
      e.getMessage.contains("bit"), e.getMessage)
    val out = r.execute("SELECT id, b FROM bt ORDER BY b").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 1L))
    // SHOW CREATE TABLE still renders (implicit check rides the spec)
    val show = r.execute("SHOW CREATE TABLE bt").collect()(0).getString(0)
    assert(show.contains("bt"))
  }

  test("timetz columns round-trip through a table") {
    val root = graft.ArtifactStore.scratchDir("graft_ttz")
      .toFile.getAbsolutePath
    val r = new StatementRouter(spark, root)
    r.execute("CREATE TABLE shifts (id BIGINT PRIMARY KEY, t TIMETZ)")
    r.execute("INSERT INTO shifts (id, t) VALUES " +
      "(1, '09:00:00+02'::timetz), (2, '08:30:00Z'::timetz)")
    val out = r.execute(
      "SELECT id, timetz_format(t) AS f FROM shifts ORDER BY t")
      .collect().map(x => (x.getLong(0), x.getString(1))).toSeq
    assert(out == Seq((2L, "08:30:00"), (1L, "09:00:00+02:00")))
  }
}

/** PG object-identifier and json casts (reference types/RegclassType,
  * RegprocType, Regtype, JsonType — round-15 tail). Engine
  * representation of reg* values is the plain INT oid (the reference
  * keeps an (oid, name) pair; text-rendering divergence documented in
  * the expression scaladoc). */
class RegOidCastSpec extends SparkTestBase {
  private def one(sql: String) = {
    graft.functions.GraftFunctions.registerAll(spark)
    Engine.sql(spark, sql).collect()(0)
  }

  test("regclass: name resolves to the pg_class oid scheme") {
    // bare, quoted, and schema-qualified names key the same pg_class row
    val expect = graft.sources.PgCatalog.oid("lineitem")
    val r = one("SELECT 'lineitem'::regclass AS a, " +
      "'\"lineitem\"'::regclass AS b, 'doc.lineitem'::regclass AS c, " +
      "'LINEITEM'::regclass AS d, CAST('lineitem' AS regclass) AS e")
    (0 until 5).foreach(i => assert(r.getInt(i) == expect))
    // and an introspection join against pg_class lines up
    graft.Tables.registerAll(spark, "/root/testdata/sf0.001")
    graft.sources.PgCatalog.registerAll(spark)
    val j = Engine.sql(spark,
      "SELECT relname FROM pg_class WHERE oid = 'lineitem'::regclass").collect()
    assert(j.map(_.getString(0)).toSeq == Seq("lineitem"))
  }

  test("regclass/regproc/regtype: ints pass, long range is loud (RegclassTypeTest)") {
    val r = one("SELECT 123456789::regtype AS a, 1::regproc AS b, " +
      "42::regclass AS c, CAST(NULL AS regclass) AS d")
    assert(r.getInt(0) == 123456789 && r.getInt(1) == 1 && r.getInt(2) == 42)
    assert(r.isNullAt(3))
    val e = intercept[Exception](one(s"SELECT ${Int.MaxValue.toLong + 42}::regclass"))
    assert(e.getMessage.contains(
      "2147483689 is outside of `int` range and cannot be cast to the regclass type"))
  }

  test("regtype: type names resolve to wire oids") {
    val r = one("SELECT 'text'::regtype AS a, 'bool'::regtype AS b, " +
      "'int4'::regtype AS c, 'timestamptz'::regtype AS d")
    assert(r.getInt(0) == 25 && r.getInt(1) == 16)
    assert(r.getInt(2) == 23 && r.getInt(3) == 1184)
    val e = intercept[Exception](one("SELECT 'nosuchtype'::regtype"))
    assert(e.getMessage.contains("unknown type name"))
  }

  test("json cast renders objects/arrays, passes strings (JsonTypeTest)") {
    val r = one("SELECT {x=200}::json AS a, '{\"k\":1}'::json AS b, " +
      "[1,2,3]::json AS c, 1::json AS d, TRUE::json AS e")
    assert(r.getString(0) == """{"x":200}""")
    assert(r.getString(1) == """{"k":1}""")
    assert(r.getString(2) == "[1,2,3]")
    assert(r.getString(3) == "1" && r.getString(4) == "true")
  }
}
