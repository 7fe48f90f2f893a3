package graft.sources

import org.apache.spark.sql.{DataFrame, Row}

/** DECLARE / FETCH / CLOSE cursor emulation (SURVEY.md §3 sub-lifecycles,
  * reference `planner/DeclarePlan.java`: a suspended consumer the client
  * drains in pages).
  *
  * Spark equivalent: `toLocalIterator` — partitions are computed lazily and
  * streamed to the driver one at a time, so a cursor over a 100 TB result
  * never materializes more than one partition's rows at the driver. */
final class Cursor private[sources] (df: DataFrame, name: Option[String])
    extends AutoCloseable {
  private val it = df.toLocalIterator()
  private var open = true

  /** FETCH n — next batch; fewer than n rows means the result is drained. */
  def fetch(n: Int): Seq[Row] = {
    require(open, "cursor is closed")
    val out = Vector.newBuilder[Row]
    var i = 0
    while (i < n && it.hasNext) { out += it.next(); i += 1 }
    out.result()
  }

  def hasMore: Boolean = open && it.hasNext

  /** CLOSE. */
  def close(): Unit = {
    open = false
    name.foreach(Cursor.registry.remove)
  }
}

object Cursor extends AutoCloseable {
  // open named cursors, surfaced through pg_cursors (reference
  // PgCursors.java reads `sessions.getCursors(user)`)
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  /** DECLARE c CURSOR FOR <query>. */
  def declare(df: DataFrame): Cursor = new Cursor(df, None)

  /** DECLARE with a name — listed in `pg_catalog.pg_cursors` until CLOSE.
    * `statement` is the SQL (or plan description) the cursor serves. */
  def declare(name: String, statement: String, df: DataFrame): Cursor = {
    registry.put(name, (statement, System.currentTimeMillis()))
    new Cursor(df, Some(name))
  }

  def openCursors: Map[String, (String, Long)] = {
    import scala.jdk.CollectionConverters._
    registry.asScala.toMap
  }

  override def close(): Unit = registry.clear()
}
