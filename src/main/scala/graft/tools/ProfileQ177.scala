package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev profiler for the q177 DDL entry: times each router statement
  * separately so close-bench regressions localize to a statement
  * family. Run: graft.tools.ProfileQ177 [reps] */
object ProfileQ177 {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stmts = Seq(
      "CREATE TABLE acct (id BIGINT PRIMARY KEY, name TEXT)",
      "INSERT INTO acct (id, name) VALUES (1, 'ada'), (2, 'bob'), (3, 'cyd')",
      "ALTER TABLE acct ADD COLUMN balance DOUBLE PRECISION",
      "UPDATE acct SET balance = id * 100.0",
      "ALTER TABLE acct RENAME COLUMN name TO holder",
      "ALTER TABLE acct ADD COLUMN note TEXT",
      "ALTER TABLE acct DROP COLUMN note",
      "CREATE VIEW rich AS SELECT holder, balance FROM acct WHERE balance >= 200.0",
      "INSERT INTO acct (id, holder, balance) VALUES (4, 'dee', 400.0)")
    for (r <- 1 to reps) {
      val root = graft.ArtifactStore.scratchDir(s"q177prof$r")
        .toFile.getAbsolutePath
      val router = new graft.StatementRouter(spark, root)
      for (st <- stmts) {
        val t0 = System.nanoTime()
        router.execute(st)
        println(f"[prof] rep$r ${(System.nanoTime() - t0) / 1e9}%6.3f  $st")
      }
      val t1 = System.nanoTime()
      val n = router.execute("SELECT holder, balance FROM rich").count()
      println(f"[prof] rep$r ${(System.nanoTime() - t1) / 1e9}%6.3f  SELECT rich ($n rows)")
      val t2 = System.nanoTime()
      router.execute("SHOW COLUMNS FROM acct").count()
      println(f"[prof] rep$r ${(System.nanoTime() - t2) / 1e9}%6.3f  SHOW COLUMNS")
    }
    spark.stop()
  }
}
