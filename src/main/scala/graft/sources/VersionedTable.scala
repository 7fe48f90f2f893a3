package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal multi-version table format: snapshot isolation + time travel on
  * plain Parquet, the lakehouse commit protocol the reference gets from its
  * Lucene translog (`TransportShardUpsertAction.java:91`) and that
  * `Dml.commitVersion`'s single-version swap cannot give (a reader racing
  * the swap re-lists the directory mid-rename).
  *
  * Layout:
  * {{{
  *   table/
  *     data/v00001/part-*.parquet     (immutable once committed)
  *     data/v00002/part-*.parquet
  *     _manifests/v00001.manifest     (one line: the data dir of the version)
  *     _manifests/v00002.manifest
  * }}}
  *
  * Invariants:
  *  - data dirs are write-once; a version's files never change after its
  *    manifest exists → readers pin a snapshot by resolving ONE manifest
  *    and never re-list;
  *  - a commit is the atomic rename of `v{n}.manifest.tmp` → `v{n}.manifest`
  *    (single-file rename — atomic on HDFS/local/ABFS; on S3 use a
  *    rename-capable committer or a DynamoDB-style log, documented);
  *  - a crash before the manifest rename leaves an orphan data dir that no
  *    reader ever sees; `vacuum` collects it.
  *
  * Concurrency: last-manifest-wins for writers (no optimistic-conflict
  * detection — single-writer-per-table is the supported mode, like the
  * reference's primary-shard write path); readers are fully isolated.
  */
object VersionedTable {

  private def fs(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(path: String) = new Path(path, "_manifests")

  private def versionOf(p: Path): Option[Int] = {
    val n = p.getName
    if (n.endsWith(".manifest")) n.stripSuffix(".manifest").stripPrefix("v").toIntOption
    else None
  }

  /** All committed versions, ascending. */
  def versions(spark: SparkSession, path: String): Seq[Int] = {
    val f = fs(spark)
    val md = manifestDir(path)
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).toSeq.flatMap(s => versionOf(s.getPath)).sorted
  }

  def latestVersion(spark: SparkSession, path: String): Option[Int] =
    versions(spark, path).lastOption

  /** Commit `df` as the next version; returns the committed version number.
    * The data write happens BEFORE any metadata changes; the single-file
    * manifest rename is the commit point. */
  def commit(spark: SparkSession, path: String, df: DataFrame): Int = {
    val f = fs(spark)
    val next = latestVersion(spark, path).getOrElse(0) + 1
    val dataDir = new Path(path, f"data/v$next%05d")
    df.write.mode("error").parquet(dataDir.toString)
    require(f.exists(new Path(dataDir, "_SUCCESS")),
      s"versioned commit aborted: data write $dataDir did not complete")
    val md = manifestDir(path)
    f.mkdirs(md)
    val tmp = new Path(md, f"v$next%05d.manifest.tmp")
    val fin = new Path(md, f"v$next%05d.manifest")
    val out = f.create(tmp, true)
    out.write(dataDir.toString.getBytes("UTF-8"))
    out.close()
    if (!f.rename(tmp, fin))
      throw new java.io.IOException(s"versioned commit: manifest rename failed for v$next")
    next
  }

  private def dataDirFor(spark: SparkSession, path: String, version: Int): String = {
    val f = fs(spark)
    val m = new Path(manifestDir(path), f"v$version%05d.manifest")
    require(f.exists(m), s"version $version does not exist at $path")
    val in = f.open(m)
    val bytes = new Array[Byte](in.available())
    in.readFully(bytes); in.close()
    new String(bytes, "UTF-8").trim
  }

  /** Read the latest committed snapshot. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val v = latestVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed versions at $path"))
    readVersion(spark, path, v)
  }

  /** Time travel: read an exact committed version. */
  def readVersion(spark: SparkSession, path: String, version: Int): DataFrame =
    spark.read.parquet(dataDirFor(spark, path, version))

  /** Copy-on-write DML on the versioned table: apply `f` to the latest
    * snapshot and commit the result as a new version. */
  def transact(spark: SparkSession, path: String, f: DataFrame => DataFrame): Int =
    commit(spark, path, f(read(spark, path)))

  /** Drop data + manifests of all but the newest `keep` versions, plus any
    * orphan data dirs from crashed commits (dirs without a manifest). */
  def vacuum(spark: SparkSession, path: String, keep: Int = 2): Unit = {
    val f = fs(spark)
    val vs = versions(spark, path)
    val dead = vs.dropRight(math.max(keep, 1))
    dead.foreach { v =>
      val dd = new Path(dataDirFor(spark, path, v))
      f.delete(new Path(manifestDir(path), f"v$v%05d.manifest"), false)
      f.delete(dd, true)
    }
    // orphans: data dirs no manifest references
    val live = versions(spark, path)
      .map(v => new Path(dataDirFor(spark, path, v)).getName).toSet
    val dataRoot = new Path(path, "data")
    if (f.exists(dataRoot))
      f.listStatus(dataRoot).foreach { s =>
        if (!live.contains(s.getPath.getName)) f.delete(s.getPath, true)
      }
  }
}
