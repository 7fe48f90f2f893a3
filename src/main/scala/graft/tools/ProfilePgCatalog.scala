package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-relation timing of PgCatalog/InformationSchema builders (guide §1:
  * measure before touching). Not part of the driver contract. */
object ProfilePgCatalog {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(spark)
    graft.Tables.registerAll(spark, sfDir)
    import graft.sources.PgCatalog._
    val builders: Seq[(String, SparkSession => org.apache.spark.sql.DataFrame)] = Seq(
      ("pgType", pgType), ("pgNamespace", pgNamespace), ("pgClass", pgClass),
      ("pgAttribute", pgAttribute), ("pgProc", pgProc), ("pgDatabase", pgDatabase),
      ("pgSettings", pgSettings), ("pgTables", pgTables), ("pgViews", pgViews),
      ("pgIndex", pgIndex), ("pgConstraint", pgConstraint), ("pgRoles", pgRoles),
      ("pgUser", pgUser), ("pgAuthMembers", pgAuthMembers), ("pgCursors", pgCursors),
      ("pgStats", pgStats), ("pgAttrDef", pgAttrDef), ("pgDescription", pgDescription),
      ("pgShdescription", pgShdescription), ("pgEnum", pgEnum), ("pgRange", pgRange),
      ("pgAm", pgAm), ("pgTablespace", pgTablespace), ("pgIndexes", pgIndexes),
      ("pgLocks", pgLocks), ("pgEventTrigger", pgEventTrigger), ("pgDepend", pgDepend),
      ("pgMatviews", pgMatviews), ("pgPublication", pgPublication),
      ("pgPublicationTables", pgPublicationTables), ("pgSubscription", pgSubscription),
      ("pgSubscriptionRel", pgSubscriptionRel), ("pgGetKeywords", pgGetKeywords))
    // warm both paths once
    graft.sources.PgCatalog.registerAll(spark)
    (1 to 2).foreach { round =>
      println(s"--- round $round")
      builders.foreach { case (n, b) =>
        val t0 = System.nanoTime()
        val df = b(spark)
        val t1 = System.nanoTime()
        df.createOrReplaceTempView(s"__prof_$n")
        val t2 = System.nanoTime()
        println(f"[pgprof] $n%-22s build ${(t1 - t0) / 1e6}%8.1f ms  view ${(t2 - t1) / 1e6}%6.1f ms")
      }
    }
    val t0 = System.nanoTime()
    graft.sources.InformationSchema.register(spark)
    println(f"[pgprof] InformationSchema.register warm ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
    spark.stop()
  }
}
