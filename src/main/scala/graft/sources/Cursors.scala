package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType

/** DECLARE / FETCH / CLOSE cursor emulation (SURVEY.md §3 sub-lifecycles,
  * reference `planner/DeclarePlan.java`: a suspended consumer the client
  * drains in pages; directions per `docs/sql/statements/fetch.rst`:
  * NEXT, count, ALL, FORWARD [count|ALL], RELATIVE count, ABSOLUTE pos —
  * backward movement only with SCROLL).
  *
  * Spark equivalent: `toLocalIterator` — partitions are computed lazily and
  * streamed to the driver one at a time, so a cursor over a 100 TB result
  * never materializes more than one partition's rows at the driver. With
  * SCROLL declared, rows the client has already fetched are additionally
  * retained driver-side so ABSOLUTE/RELATIVE can move backward (the
  * reference keeps the full result hot in its suspended consumer; we keep
  * only the prefix actually paged out, which is client-bounded). */
final class Cursor private[sources] (df: DataFrame, name: Option[String],
                                     val scroll: Boolean = false)
    extends AutoCloseable {
  val schema: StructType = df.schema
  private val it = df.toLocalIterator()
  private var open = true
  // rows consumed off the iterator; with SCROLL they are retained here
  private val seen = scala.collection.mutable.ArrayBuffer[Row]()
  private var consumed = 0L
  private var pos = 0L // current position: number of rows before the cursor

  private def pull(): Option[Row] =
    if (it.hasNext) {
      val r = it.next(); consumed += 1
      if (scroll) seen += r
      Some(r)
    } else None

  /** FETCH [FORWARD] n / NEXT / ALL — next batch from the current
    * position; fewer than n rows means the result is drained. */
  def fetch(n: Long): Seq[Row] = {
    require(open, "cursor is closed")
    val out = Vector.newBuilder[Row]
    var i = 0L
    while (i < n) {
      val row: Option[Row] =
        if (scroll && pos < seen.length) Some(seen(pos.toInt))
        else if (!scroll && pos < consumed)
          throw new IllegalStateException(
            "cannot replay already-fetched rows without SCROLL")
        else pull()
      row match {
        case Some(r) => out += r; pos += 1; i += 1
        case None    => return out.result()
      }
    }
    out.result()
  }

  /** FETCH ABSOLUTE k — position at row k (1-based) and return it; out of
    * range → empty result (reference fetch.rst). Backward — including
    * re-reading the current row — needs SCROLL. */
  def fetchAbsolute(k: Long): Seq[Row] = {
    require(open, "cursor is closed")
    if (k <= 0) { if (pos > 0) requireBackward(-1); pos = 0; return Nil }
    val target = k - 1 // 0-based index of the row to return
    requireBackward(target)
    // advance the iterator up to (not through) the target so fetch(1)
    // serves it; a drained iterator leaves the cursor at the end
    while (consumed < target && pull().isDefined) {}
    pos = math.min(target, consumed)
    fetch(1)
  }

  /** FETCH RELATIVE k — single row k ahead of (or behind, with SCROLL)
    * the current row; RELATIVE 0 re-reads the current row (reference
    * `session/Cursor.java:230`). */
  def fetchRelative(k: Long): Seq[Row] = {
    require(open, "cursor is closed")
    if (k > 0) { // skip k-1 rows, return the k-th
      fetch(k - 1)
      fetch(1)
    } else { // current row is index pos-1; move to pos-1+k
      val target = pos - 1 + k
      requireBackward(target)
      if (target < 0) { pos = 0; Nil }
      else { pos = target; fetch(1) }
    }
  }

  private def requireBackward(target: Long): Unit =
    if (target < pos && !scroll)
      throw new IllegalArgumentException(
        "Cannot move backward: cursor was declared NO SCROLL")

  def hasMore: Boolean = open && (it.hasNext || (scroll && pos < seen.length))

  /** CLOSE. */
  def close(): Unit = {
    open = false
    seen.clear()
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
  def declare(name: String, statement: String, df: DataFrame,
              scroll: Boolean = false): Cursor = {
    registry.put(name, (statement, System.currentTimeMillis()))
    new Cursor(df, Some(name), scroll)
  }

  def openCursors: Map[String, (String, Long)] = {
    import scala.jdk.CollectionConverters._
    registry.asScala.toMap
  }

  override def close(): Unit = registry.clear()
}
