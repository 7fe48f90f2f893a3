package graft

import graft.functions.{GeoNetFunctions, TimeFunctions}
import org.apache.spark.sql.functions._

class GeoShapeSpec extends SparkTestBase {
  import spark.implicits._
  import GeoNetFunctions._

  private val square = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(10.0, 10.0), Seq(0.0, 10.0))

  test("point-in-polygon and ring area (shoelace)") {
    assert(pointInPolygon(5.0, 5.0, square))
    assert(!pointInPolygon(15.0, 5.0, square))
    assert(math.abs(ringArea(square) - 100.0) < 1e-9)
  }

  test("within / area / intersects as Spark columns") {
    val df = Seq((1L, Seq(5.0, 5.0)), (2L, Seq(20.0, 20.0))).toDF("id", "pt")
      .withColumn("ring", typedLit(square))
    val r = df.select($"id", withinPolygon($"pt", $"ring").as("in"),
      area($"ring").as("a")).orderBy("id").collect()
    assert(r(0).getBoolean(1) && !r(1).getBoolean(1))
    assert(r(0).getDouble(2) == 100.0)
    val shifted = square.map(v => Seq(v(0) + 5.0, v(1) + 5.0))
    val far = square.map(v => Seq(v(0) + 50.0, v(1) + 50.0))
    val s = Seq((typedLit(square), typedLit(shifted), typedLit(far))).toString // unused guard
    val df2 = spark.range(1).select(
      intersects(typedLit(square), typedLit(shifted)).as("overlap"),
      intersects(typedLit(square), typedLit(far)).as("disjoint"))
    val row = df2.head()
    assert(row.getBoolean(0) && !row.getBoolean(1))
  }

  test("edge-crossing intersection with all vertices outside (r3 defect)") {
    // A plus-sign configuration: a wide flat bar and a tall thin bar cross
    // in the middle, but every vertex of each lies outside the other — the
    // vertex-containment shortcut said disjoint; real geometry says cross.
    val wide = Seq(Seq(0.0, 4.0), Seq(10.0, 4.0), Seq(10.0, 6.0), Seq(0.0, 6.0))
    val tall = Seq(Seq(4.0, 0.0), Seq(6.0, 0.0), Seq(6.0, 10.0), Seq(4.0, 10.0))
    val r = spark.range(1)
      .select(intersects(typedLit(wide), typedLit(tall)).as("x")).head()
    assert(r.getBoolean(0), "crossing bars must intersect")
  }

  test("concave-overlap and hole-exclusion via WKT shapes") {
    import graft.functions.GeoShapeFunctions._
    // L-shaped (concave) polygon with a square hole in its lower arm
    val lShape = "POLYGON ((0 0, 10 0, 10 4, 4 4, 4 10, 0 10, 0 0), " +
      "(1 1, 3 1, 3 3, 1 3, 1 1))"
    val inHole = "POINT (2 2)"          // inside hole → NOT within
    val inArm = "POINT (8 2)"           // lower arm → within
    val inNotch = "POINT (8 8)"         // the concave notch → NOT within
    val notchSquare = "POLYGON ((6 6, 9 6, 9 9, 6 9, 6 6))" // entirely in notch
    val r = spark.range(1).select(
      shapeWithin(lit(inHole), lit(lShape)).as("hole"),
      shapeWithin(lit(inArm), lit(lShape)).as("arm"),
      shapeWithin(lit(inNotch), lit(lShape)).as("notch"),
      shapeIntersects(lit(notchSquare), lit(lShape)).as("notch_sq"),
      shapeArea(lit(lShape)).as("area")).head()
    assert(!r.getBoolean(0), "point in hole is excluded")
    assert(r.getBoolean(1), "point in the arm is within")
    assert(!r.getBoolean(2), "point in the concave notch is outside")
    assert(!r.getBoolean(3), "square inside the notch does not intersect the L")
    // area = L (10*4 + 4*6) - hole (2*2) = 64 - 4 = 60 square degrees
    assert(math.abs(r.getDouble(4) - 60.0) < 1e-9)
  }

  test("GeoJSON parses to the same geometry as WKT") {
    import graft.functions.GeoShapeFunctions._
    val wkt = "POLYGON ((0 0, 10 0, 10 4, 4 4, 4 10, 0 10, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))"
    val gj = """{"type": "Polygon", "coordinates": [
      [[0,0],[10,0],[10,4],[4,4],[4,10],[0,10],[0,0]],
      [[1,1],[3,1],[3,3],[1,3],[1,1]]]}"""
    val r = spark.range(1).select(
      shapeArea(lit(gj)).as("a"),
      shapeWithin(lit("""{"type": "Point", "coordinates": [8, 2]}"""), lit(wkt)).as("w"),
      shapeIntersects(lit(gj), lit(wkt)).as("x"),
      shapeAsWkt(lit("""{"type": "Point", "coordinates": [1.5, 2.5]}""")).as("wkt")).head()
    assert(math.abs(r.getDouble(0) - 60.0) < 1e-9)
    assert(r.getBoolean(1) && r.getBoolean(2))
    assert(r.getString(3) == "POINT (1.5 2.5)")
  }

  test("multipolygon and linestring predicates") {
    import graft.functions.GeoShapeFunctions._
    val mp = """{"type": "MultiPolygon", "coordinates": [
      [[[0,0],[2,0],[2,2],[0,2],[0,0]]],
      [[[10,10],[12,10],[12,12],[10,12],[10,10]]]]}"""
    val line = "LINESTRING (1 -1, 1 3)" // crosses the first part only
    val r = spark.range(1).select(
      shapeIntersects(lit(line), lit(mp)).as("x"),
      shapeWithin(lit("POINT (11 11)"), lit(mp)).as("w"),
      shapeDisjoint(lit("POINT (5 5)"), lit(mp)).as("d")).head()
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
  }

  test("bare SQL names: within/intersects polymorphic, area, distance, " +
    "latitude/longitude, geohash precision dispatch") {
    graft.functions.GraftFunctions.registerAll(spark)
    def one(sql: String) = Engine.sql(spark, sql).collect()(0)
    // geo_point array operand + shape string operand, both directions
    assert(one("SELECT within([0.5, 0.5], 'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')").getBoolean(0))
    assert(!one("SELECT within([5.0, 5.0], 'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')").getBoolean(0))
    assert(one("SELECT within('POINT (0.5 0.5)', 'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))')").getBoolean(0))
    assert(one("SELECT intersects('LINESTRING (0 0, 2 2)', 'POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))')").getBoolean(0))
    assert(math.abs(one("SELECT area('POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))')").getDouble(0) - 4.0) < 1e-9)
    // reference docs: distance('POINT (10 20)'-ish pairs in meters; equator
    // degree ≈ 111.19 km — use the array form the fixtures carry
    val d = one("SELECT distance([0.0, 0.0], [1.0, 0.0])").getDouble(0)
    assert(math.abs(d - 111195.0) < 200.0, d.toString)
    assert(one("SELECT CAST(latitude([7.0, 52.0]) AS DOUBLE)").getDouble(0) == 52.0)
    assert(one("SELECT CAST(longitude([7.0, 52.0]) AS DOUBLE)").getDouble(0) == 7.0)
    val gh12 = one("SELECT geohash([13.361389, 52.524167])").getString(0)
    assert(gh12.length == 12 && gh12.startsWith("u33db"), gh12)
    val gh5 = one("SELECT geohash([13.361389, 52.524167], 5)").getString(0)
    assert(gh5 == gh12.take(5))
  }
}

class IntervalSpec extends SparkTestBase {
  import spark.implicits._

  test("interval sum aggregates day-time intervals") {
    val df = Seq(1, 2, 3).toDF("n")
      .select((col("n") * expr("INTERVAL '1' HOUR")).as("iv"))
    val total = df.agg(sum($"iv")).head().get(0).toString
    assert(total.contains("6"))  // 6 hours
  }

  test("interval avg aggregates day-time intervals (reference IntervalAverageAggregation)") {
    val df = Seq(1, 2, 3).toDF("n")
      .select((col("n") * expr("INTERVAL '1' HOUR")).as("iv"))
    val mean = df.agg(avg($"iv")).head().get(0).toString
    assert(mean.contains("2"), s"avg of 1h,2h,3h is 2h, got $mean")
  }

  test("age produces symbolic year-month intervals") {
    val df = Seq(("2024-03-15", "2021-01-10")).toDF("a", "b")
      .select(to_timestamp($"a").as("a"), to_timestamp($"b").as("b"))
    val iv = df.select(TimeFunctions.age($"a", $"b")).head().get(0).toString
    assert(iv == "P3Y2M")  // 3 years 2 months (java.time.Period form)
  }

  test("timezone(tz, ts) converts wall time") {
    val r = spark.sql(
      "SELECT convert_timezone('UTC', 'America/New_York', TIMESTAMP_NTZ '2024-01-01 12:00:00')")
      .head().get(0).toString
    assert(r.contains("07:00"))
  }
}

/** Catalyst rule integration: UDF → native expression promotion. */
class ExtensionsSpec extends SparkTestBase {
  test("vector_cosine UDF is rewritten to the native codegen expression") {
    graft.functions.GraftFunctions.registerAll(spark)
    Tables.registerAll(spark, sfDir)
    val df = spark.sql(
      "SELECT vector_cosine(embedding, embedding) AS s FROM embeddings LIMIT 5")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_cosine"))
    assert(!optimized.contains("UDF"))
    assert(df.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
  }
}

/** File-source structured streaming over the events fixture. */
class FileStreamSpec extends SparkTestBase {
  test("parquet file stream through the tumbling-count transform") {
    val dir = graft.ArtifactStore.scratchDir("evstream").toFile.getAbsolutePath
    val batch = Tables.load(spark, sfDir, "events")
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val q = graft.streaming.EventsStream.tumblingCounts(stream, "1 hour")
      .writeStream.format("memory").queryName("filestream").outputMode("append").start()
    try {
      q.processAllAvailable()
      // append mode emits only watermark-closed windows; compare against batch
      val streamed = spark.sql("SELECT sum(n) FROM filestream").head().getLong(0)
      val total = batch.count()
      assert(streamed > 0 && streamed <= total)
    } finally q.stop()
  }
}
