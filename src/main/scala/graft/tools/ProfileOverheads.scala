package graft.tools

import org.apache.spark.sql.SparkSession

/** Times the shared per-entry setup paths (table registration, catalog
  * sources, router construction) that run INSIDE the timed region of many
  * bench entries — the denominator work a broad-tail optimization must
  * measure first (guide §1). Not part of the driver contract. */
object ProfileOverheads {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("GraftFunctions.registerAll cold")(
      graft.functions.GraftFunctions.registerAll(spark))
    time("GraftFunctions.registerAll warm")(
      graft.functions.GraftFunctions.registerAll(spark))
    time("Tables.registerAll cold")(graft.Tables.registerAll(spark, sfDir))
    (1 to 3).foreach(i =>
      time(s"Tables.registerAll warm$i")(graft.Tables.registerAll(spark, sfDir)))
    time("Tables.load(lineitem) warm")(graft.Tables.load(spark, sfDir, "lineitem"))
    time("PgCatalog.registerAll cold")(graft.sources.PgCatalog.registerAll(spark))
    (1 to 3).foreach(i =>
      time(s"PgCatalog.registerAll warm$i")(graft.sources.PgCatalog.registerAll(spark)))
    time("InformationSchema.register cold")(
      graft.sources.InformationSchema.register(spark))
    time("InformationSchema.register warm")(
      graft.sources.InformationSchema.register(spark))
    time("registerAllWithStats cold")(graft.Tables.registerAllWithStats(spark, sfDir))
    time("registerAllWithStats warm")(graft.Tables.registerAllWithStats(spark, sfDir))
    val root = graft.ArtifactStore.scratchDir("prof").toFile.getAbsolutePath
    time("new StatementRouter")(new graft.StatementRouter(spark, root))
    time("noop write of select 1") {
      spark.range(1).write.format("noop").mode("overwrite").save()
    }
    time("noop write of q166 pg_type") {
      spark.sql("SELECT oid, typname, typlen FROM pg_type ORDER BY oid")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
